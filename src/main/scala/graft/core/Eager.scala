package graft.core

import org.apache.spark.sql.DataFrame

/** Persist AND materialize. A frame that feeds both sides of a
  * self-join must be in the cache before the join starts — if the two
  * consumers race to fill it, every partition of the upstream pipeline
  * is computed twice (observed as 2× variance in the dedup benches). */
object Eager {
  def apply(df: DataFrame): DataFrame = {
    val cached = df.persist()
    cached.count()
    cached
  }
}
