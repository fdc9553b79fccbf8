package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus search scoring (SURVEY §2.5 #65i). */
object Search {
  /** BM25 relevance scores (Robertson–Spärck Jones; k1 = 1.2, b = 0.75)
    * for every document matching ≥ 1 of `terms`, over `docs(doc_id,
    * text)`. The idf is the LOG-FREE RSJ odds (N − df + 0.5)/(df + 0.5)
    * — a strictly monotone transform of the textbook log form, so the
    * score ORDER (all any ranker consumes) is identical, and every
    * operation stays correctly-rounded IEEE arithmetic on exact
    * integers: the scores are bit-reproducible across engines, which
    * libm's log is not (the repo's q_distinctive_terms/q_collocations
    * convention — and what makes q_bm25 a full hash gate).
    *
    * Scale shape: one scan computes (dl, tf_t) per doc, one 1-row
    * stats aggregate (N, Σdl, df_t) broadcast back (the scalar-subquery
    * shape), then scoring is scan-speed column math. Returns ALL hit
    * docs in doc_id order with `n_hits` and `score` — top-k is one
    * `orderBy(desc("score")).limit(k)` (TakeOrderedAndProject) away,
    * kept out of the operator so float near-ties never destabilize
    * result sets. The classic constants are fixed as exact double
    * LITERALS (2.2, 1.2, 0.25, 0.75) rather than derived (k1 + 1
    * lands on a round-to-even knife edge that an oracle literal may
    * resolve differently). */
  def bm25(docs: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty && terms.forall(_.matches("[a-z0-9]+")),
      s"terms must be lowercase word tokens, got $terms")
    val base = docs
      .selectExpr("doc_id", s"${graft.dedup.Dedup.toksExpr} AS toks")
      .select(col("doc_id") +: size(col("toks")).cast("long").as("dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          expr(s"size(filter(toks, x -> x = '$t'))").cast("long")
            .as(s"tf$i") }: _*)
    val stats = base.agg(
      count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl") +:
        terms.indices.map(i =>
          sum((col(s"tf$i") > 0).cast("long")).as(s"df$i")): _*)
    def termScore(i: Int): Column = {
      val tf = col(s"tf$i").cast("double")
      val df = col(s"df$i").cast("double")
      val n = col("n_docs").cast("double")
      val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
      (((n - df) + lit(0.5)) / (df + lit(0.5))) *
        ((tf * lit(2.2)) /
          (tf + lit(1.2) *
            (lit(0.25) + (lit(0.75) * col("dl").cast("double")) / avgdl)))
    }
    val anyHit = terms.indices.map(i => col(s"tf$i")).reduce(_ + _)
    base.crossJoin(broadcast(stats))
      .where(anyHit > 0)
      .select(col("doc_id"), anyHit.as("n_hits"),
        terms.indices.map(termScore).reduce(_ + _).as("score"))
      .orderBy("doc_id")
  }
}
