package graft.core

import org.apache.spark.sql.Dataset
import scala.jdk.CollectionConverters._

/** Spark-native analogue of the reference's `Pump` (Tubes/Core.hs:170) —
  * the driver that steps a stream incrementally. In graft the executors
  * stream partitions to the driver lazily (`toLocalIterator`), so `recv`
  * (the reference's `recv`/`unyield`, Core.hs:196 / Util.hs:124) pulls one
  * element without materializing the stream — at most one partition is
  * resident.
  *
  * This is deliberately a driver-side tool (REPL inspection, incremental
  * consumption); distributed folding is `Fold`, not `Pump`.
  */
final class Pump[A] private (it: Iterator[A]) {

  /** `recv` / `unyield`: next element plus the pump's future, or None when
    * the stream is exhausted. */
  def recv(): Option[(A, Pump[A])] =
    if (it.hasNext) Some((it.next(), this)) else None

  /** `stream p tube`-style driver fold (Core.hs:232): consume the rest. */
  def fold[S](zero: S)(stepF: (S, A) => S): S = it.foldLeft(zero)(stepF)
}

object Pump {
  def apply[A](ds: Dataset[A]): Pump[A] =
    new Pump(ds.toLocalIterator().asScala)

  def fromSeq[A](xs: Seq[A]): Pump[A] = new Pump(xs.iterator)
}
