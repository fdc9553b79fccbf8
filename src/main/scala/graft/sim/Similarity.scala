package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (SURVEY §2.5 #60–62).
  *
  * Cosine is computed in double precision as a sequential left fold over
  * the vector (deterministic order ⇒ bit-identical to the oracle's fold).
  * Brute force is the correctness baseline; the scale path is
  * random-hyperplane LSH: signatures are per-row column math, candidates
  * come from bucket-local joins (never a cross join).
  */
object Similarity {

  /** Σ aᵢ·bᵢ as doubles, sequential fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b,
        (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm2(a: Column): Column = dot(a, a)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(norm2(a) * norm2(b))

  /** Unit-normalize the embedding once per vector, so every pairwise
    * cosine downstream is a single dot-product fold instead of three
    * (dot + two norms) — the n² stage does ⅓ the work. */
  def normalized(emb: DataFrame): DataFrame =
    emb.repartition(col("vec_id")).withColumn("ne", expr(
      """transform(embedding, x -> cast(x as double) /
        |  sqrt(aggregate(embedding, cast(0.0 as double),
        |    (s, y) -> s + cast(y as double) * cast(y as double))))"""
        .stripMargin))

  /** Exact near-duplicate pairs: cosine ≥ tau over all pairs. Correctness
    * baseline (quadratic — at scale use [[lshBuckets]] candidates then
    * verify with the same dot product). */
  def embedPairs(emb: DataFrame, tau: Double): DataFrame = {
    graft.functions.VectorDot.register(emb.sparkSession)
    val n = graft.core.Eager(normalized(emb)) // both join sides read the cache
    val a = n.select(col("vec_id").as("vec_a"), col("ne").as("ea"))
    val b = n.select(col("vec_id").as("vec_b"), col("ne").as("eb"))
    a.crossJoin(b).where(col("vec_a") < col("vec_b"))
      .withColumn("cos", expr("vec_dot(ea, eb)"))
      .where(col("cos") >= tau)
      .select("vec_a", "vec_b", "cos")
  }

  /** Brute-force cosine top-k for a set of query vectors (broadcast the
    * queries, scan the corpus once — the classic 100 TB shape). */
  def knnBrute(emb: DataFrame, queryPred: Column, k: Int): DataFrame = {
    graft.functions.VectorDot.register(emb.sparkSession)
    val n = graft.core.Eager(normalized(emb)) // queries and corpus share the cache
    val q = n.where(queryPred)
      .select(col("vec_id").as("qid"), col("ne").as("qe"))
    val c = n.select(col("vec_id").as("vid"), col("ne").as("ce"))
    val scored = broadcast(q).crossJoin(c).where(col("qid") =!= col("vid"))
      .withColumn("cos", expr("vec_dot(qe, ce)"))
    val w = Window.partitionBy("qid")
      .orderBy(col("cos").desc, col("vid"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("qid", "rank", "vid", "cos")
  }

  /** Random-hyperplane signature: bit i = sign(v · hᵢ). Hyperplanes are
    * seeded-deterministic literal arrays baked into the plan, so each
    * bucket is `tables × bits` native [[graft.functions.VectorDot]]
    * loops — per-row column math, no row multiplication, no shuffle
    * (internals only: ANN has no cross-engine oracle). */
  def lshBuckets(emb: DataFrame, tables: Int, bits: Int): DataFrame = {
    graft.functions.VectorDot.register(emb.sparkSession)
    val dim = emb.selectExpr("size(embedding)").first().getInt(0)
    def plane(t: Int, i: Int): String = {
      val rnd = new scala.util.Random(t * 7919 + i)
      Array.fill(dim)((rnd.nextDouble() * 2 - 1).toString + "D")
        .mkString("array(", ", ", ")")
    }
    val bucketExprs = (0 until tables).map { t =>
      (0 until bits).map { i =>
        s"IF(vec_dot(ev, ${plane(t, i)}) > 0.0, ${1L << i}L, 0L)"
      }.mkString("(", " + ", s") AS bucket_$t")
    }
    val withBuckets = emb
      .withColumn("ev", expr("transform(embedding, x -> cast(x as double))"))
      .selectExpr(Seq("vec_id", "embedding") ++ bucketExprs: _*)
    withBuckets.select(col("vec_id"), col("embedding"),
        posexplode(array((0 until tables).map(t => col(s"bucket_$t")): _*))
          .as(Seq("table", "bucket")))
  }

  /** ANN top-k: candidates share an LSH bucket in ≥1 table, reranked by
    * exact cosine. Approximate by design (no SQL oracle; recall is
    * asserted in the spec against [[knnBrute]]). */
  def knnLsh(emb: DataFrame, queryPred: Column, k: Int,
             tables: Int = 8, bits: Int = 8): DataFrame = {
    val bucketed = graft.core.Eager(lshBuckets(emb, tables, bits))
    val q = bucketed.where(queryPred).select(col("table"), col("bucket"),
      col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = bucketed.select(col("table"), col("bucket"),
      col("vec_id").as("vid"), col("embedding").as("ce"))
    graft.functions.VectorDot.register(emb.sparkSession)
    val cands = q.join(c, Seq("table", "bucket"))
      .where(col("qid") =!= col("vid"))
      .dropDuplicates("qid", "vid")
    val w = Window.partitionBy("qid")
      .orderBy(col("cos").desc, col("vid"))
    cands.withColumn("cos", cosine(col("qe"), col("ce")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("qid", "rank", "vid", "cos")
  }
}
