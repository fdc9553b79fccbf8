package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters summary as a mergeable Spark `Aggregator`
  * — the 100 TB path for open-vocabulary frequency queries
  * (q_ngram_top's scale note): exact counting must shuffle every
  * DISTINCT key once, which at web-corpus n-gram vocabularies is the
  * dominant cost; the MG summary caps the shuffled state at `capacity`
  * counters per partition regardless of vocabulary size and merges
  * associatively, so the plan keeps map-side partial aggregation
  * (ObjectHashAggregate) with O(capacity) bytes per partial.
  *
  * Guarantees (Misra–Gries 1982; merge per Agarwal et al., "Mergeable
  * Summaries", PODS 2012): every estimate is an UNDERCOUNT by at most
  * n/(capacity+1) where n is the total stream length, and every key
  * with true count > n/(capacity+1) is present in the summary. Both
  * survive arbitrary merge trees, so partial aggregation is safe.
  * Asserted in TopKSketchSpec; with capacity ≥ distinct-keys the
  * summary degrades to exact counts.
  *
  * The buffer is an immutable Map inside Spark's
  * ObjectAggregationBuffer; update is O(1) amortized (the O(capacity)
  * decrement rebuild runs at most n/(capacity+1) times).
  */
class TopKSketch(capacity: Int) extends
    Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(capacity > 0, s"capacity must be positive, got $capacity")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], x: String): Map[String, Long] =
    b.get(x) match {
      case Some(c) => b.updated(x, c + 1L)
      case None if b.size < capacity => b.updated(x, 1L)
      case None => // full: decrement every counter, drop the zeros
        b.iterator.flatMap { case (k, c) =>
          if (c > 1L) Some(k -> (c - 1L)) else None
        }.toMap
    }

  override def merge(b1: Map[String, Long],
                     b2: Map[String, Long]): Map[String, Long] = {
    val sum = b2.foldLeft(b1) { case (acc, (k, c)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + c)
    }
    if (sum.size <= capacity) sum
    else { // subtract the (capacity+1)-th largest count, keep positives
      val cut = sum.valuesIterator.toArray.sortInPlace()(Ordering[Long].reverse)
        .apply(capacity)
      sum.iterator.flatMap { case (k, c) =>
        if (c > cut) Some(k -> (c - cut)) else None
      }.toMap
    }
  }

  override def finish(b: Map[String, Long]): Map[String, Long] = b

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}

object TopKSketch {
  /** Column-API form: `df.agg(TopKSketch.udafFor(1024)(col("k")))`. */
  def udafFor(capacity: Int)
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKSketch(capacity),
      Encoders.STRING)
}
