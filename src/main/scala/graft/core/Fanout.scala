package graft.core

/** Explicit partition count for COMPUTE fan-outs. A bare
  * `repartition(col(...))` before per-row CPU work (shingling, codec
  * decode, per-token hashing) is AQE-coalescible: AQE sizes the
  * exchange by shuffle BYTES, so a small-but-expensive corpus (the
  * single-file, single-row-group scan shape) collapses back to ONE
  * task and the whole pass serializes — measured as 1-task jobs of
  * seconds each under `local[32]` (guide §2.5: unsplittable input →
  * repartition after the read; the byte heuristic is wrong when cost
  * is CPU, not bytes). An EXPLICIT count is exempt from AQE
  * coalescing, and deriving it from the session's default parallelism
  * scales it with the machine instead of pinning a local constant. */
object Fanout {
  /** Width from the active session — convenience form; prefer the
    * frame-anchored overload at call sites that hold a DataFrame
    * (r12 advice: `SparkSession.active` can pick the wrong session
    * in multi-session processes or throw on bare threads). */
  def n: Int = org.apache.spark.sql.SparkSession.active
    .sparkContext.defaultParallelism

  /** Width from the session that OWNS the frame being repartitioned. */
  def n(df: org.apache.spark.sql.Dataset[_]): Int =
    df.sparkSession.sparkContext.defaultParallelism
}
