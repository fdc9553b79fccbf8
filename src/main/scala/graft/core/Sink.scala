package graft.core

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.storage.StorageLevel

/** Spark-native analogue of the reference's `Sink m a` (Tubes/Sink.hs:93):
  * a consumer of a stream. `run` is the terminal Spark action.
  *
  * The reference's algebra maps directly:
  *  - `Contravariant.contramap` (Sink.hs:101) → pre-transform the plan;
  *  - Semigroup `<>` / `Divisible.divide` (Sink.hs:105,127) → fan-out: one
  *    upstream pass (persisted) feeding several writers;
  *  - `Decidable.choose` (Sink.hs:117) → route rows by predicate to one of
  *    two sinks (each side stays a pruned, pushed-down scan of the cached
  *    upstream).
  */
final case class Sink[A](run: Dataset[A] => Unit) {

  /** `contramap` (Sink.hs:101). */
  def contramap[B](f: Dataset[B] => Dataset[A]): Sink[B] =
    Sink(ds => run(f(ds)))

  /** Semigroup `<>` (Sink.hs:127): both sinks consume every element; the
    * upstream is computed once. Literally the Divisible special case
    * `divide (\x -> (x, x))` (Sink.hs:119). */
  def both(other: Sink[A]): Sink[A] =
    Sink.divide[A, A, A](identity, identity)(this, other)
}

object Sink {
  /** `stop` (Util.hs:62): consume and discard — but still execute the full
    * plan (noop datasource, the honest benchmark sink). */
  def ignore[A]: Sink[A] =
    Sink(_.toDF().write.format("noop").mode("overwrite").save())

  /** `display` (Tubes.hs:183). */
  def console[A](n: Int = 20): Sink[A] = Sink(_.show(n, truncate = false))

  def parquet[A](path: String): Sink[A] =
    Sink(_.toDF().write.mode("overwrite").parquet(path))

  def csv[A](path: String): Sink[A] =
    Sink(_.toDF().write.mode("overwrite").option("header", "true").csv(path))

  def json[A](path: String): Sink[A] =
    Sink(_.toDF().write.mode("overwrite").json(path))

  /** ORC — the other columnar warehouse format Spark ships natively
    * (same pushdown/pruning story as parquet). */
  def orc[A](path: String): Sink[A] =
    Sink(_.toDF().write.mode("overwrite").orc(path))

  /** Driver-side collector (tests / tiny results only). */
  def collect[A](out: scala.collection.mutable.Buffer[A]): Sink[A] =
    Sink(ds => out ++= ds.collect())

  /** `Divisible.divide` (Sink.hs:102–107), general form: split each
    * element into two PARTS — `fb`/`fc` project the two components —
    * consumed by two different sinks, one upstream pass. (`both` is the
    * `divide (\x -> (x, x))` special case; `choose` partitions ROWS,
    * `divide` partitions COLUMNS/parts.) */
  def divide[A, B, C](fb: Dataset[A] => Dataset[B],
                      fc: Dataset[A] => Dataset[C])(
      sb: Sink[B], sc: Sink[C]): Sink[A] = Sink { ds =>
    val cached = ds.persist(StorageLevel.MEMORY_AND_DISK)
    try { sb.run(fb(cached)); sc.run(fc(cached)) }
    finally cached.unpersist(blocking = false)
  }

  /** `Decidable.choose` (Sink.hs:117): rows where `pred` go left, the rest
    * right. One upstream pass. */
  def choose(pred: Column, left: Sink[Row], right: Sink[Row]): Sink[Row] =
    Sink { ds =>
      val df = ds.toDF().persist(StorageLevel.MEMORY_AND_DISK)
      try { left.run(df.filter(pred)); right.run(df.filter(!pred)) }
      finally df.unpersist(blocking = false)
    }

  /** Partitioned write: the scale-out form of routing — every distinct
    * key becomes its own directory, one shuffle-free pass. */
  def partitionedParquet(path: String, keys: String*): Sink[Row] =
    Sink(_.toDF().write.mode("overwrite").partitionBy(keys: _*).parquet(path))
}
