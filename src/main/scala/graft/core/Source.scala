package graft.core

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Spark-native analogue of the reference's `Source m a`
  * (Tubes/Source.hs:94): an exhaustible producer of values.
  *
  * Where the reference steps a coroutine one `yield` at a time, graft
  * declares the whole stream as a `Dataset` logical plan and lets
  * Catalyst/Tungsten pick the physical execution. Ordered-stream
  * combinators (`take`, `drop`, `takeWhile`, `merge`, `every`) — which in
  * a coroutine are implicit in arrival order — take an explicit sort key
  * here, because a distributed stream has no global order unless you ask
  * for one. Keyed (`partitionBy`) variants keep those windows
  * shuffle-partitioned and therefore scalable; the global variants
  * degenerate to a single-partition window and are intended for
  * driver-sized streams, exactly like the reference's single-threaded
  * stepper.
  */
final case class Source[A](ds: Dataset[A]) {
  def toDF: DataFrame = ds.toDF()

  /** Functor `fmap` / `Tubes.Util.map` (Util.hs:85) — columnar form. */
  def select(cols: Column*): Source[Row] = Source(ds.select(cols: _*))

  /** Typed `map` — object form; prefer `select` (codegen) in hot paths. */
  def map[B: Encoder](f: A => B): Source[B] = Source(ds.map(f))

  /** `Tubes.Util.mapM` (Util.hs:136): effectful per-element transform;
    * effects run once per element inside executors. */
  def mapM[B: Encoder](f: A => B): Source[B] =
    Source(ds.mapPartitions(_.map(f)))

  /** `Tubes.Util.filter` (Util.hs:100). */
  def where(pred: Column): Source[A] = Source(ds.filter(pred))

  /** Monad bind of `Source` (Source.hs:116) / `for` (Util.hs:47). */
  def flatMap[B: Encoder](f: A => IterableOnce[B]): Source[B] =
    Source(ds.flatMap(f))

  /** `<|>` / `<>` (Source.hs:120): list-like concatenation. */
  def concat(other: Source[A]): Source[A] = Source(ds.unionAll(other.ds))

  /** Applicative `<*>` (Source.hs:108): every pair, small side broadcast. */
  def cross(other: Source[_]): Source[Row] =
    Source(ds.toDF().crossJoin(broadcast(other.ds.toDF())))

  /** Num/Fractional lift (Source.hs:128–140): the reference's `s1 + s2`
    * is `liftA2 (+)` — arithmetic over the APPLICATIVE cross of the two
    * streams, not a positional zip. Defined for single-column sources;
    * the result column keeps the left source's name. */
  def zipA(other: Source[_])(f: (Column, Column) => Column): Source[Row] = {
    val l = ds.toDF()
    val r = other.ds.toDF()
    require(l.columns.length == 1 && r.columns.length == 1,
      "Num lift is defined for single-column sources")
    val out = l.columns(0)
    Source(l.withColumnRenamed(out, "__l")
      .crossJoin(broadcast(r.withColumnRenamed(r.columns(0), "__r")))
      .select(f(col("__l"), col("__r")).as(out)))
  }

  def +(other: Source[_]): Source[Row] = zipA(other)(_ + _)
  def *(other: Source[_]): Source[Row] = zipA(other)(_ * _)
  def -(other: Source[_]): Source[Row] = zipA(other)(_ - _)
  def /(other: Source[_]): Source[Row] = zipA(other)(_ / _)

  /** The UNARY Num members (Source.hs:141 region): `abs`/`signum`/
    * `negate` lift pointwise over one stream — `fmap`, no applicative
    * cross. Same single-column contract as [[zipA]]; the column keeps
    * its name. Laws (`abs s * signum s == s`, `negate . negate == id`)
    * in PropertySpec. */
  def unaryA(f: Column => Column): Source[Row] = {
    val l = ds.toDF()
    require(l.columns.length == 1,
      "Num lift is defined for single-column sources")
    val c = l.columns(0)
    Source(l.select(f(col(c)).as(c)))
  }
  def absA: Source[Row] = unaryA(org.apache.spark.sql.functions.abs)
  def signumA: Source[Row] = unaryA(org.apache.spark.sql.functions.signum)
  def negateA: Source[Row] = unaryA(c => -c)

  /** `Tubes.Util.take` (Util.hs:117): first n in `order`. Physical plan is
    * TakeOrderedAndProject — no global sort materialized. */
  def take(n: Int, order: Column*): Source[Row] =
    Source(ds.toDF().orderBy(order: _*).limit(n))

  /** `Tubes.Util.drop` (Util.hs:94): all but the first n in `order`. */
  def drop(n: Int, order: Column*): Source[Row] =
    Source(ds.toDF().orderBy(order: _*).offset(n))

  /** `Tubes.Util.takeWhile` (Util.hs:104): longest prefix (in `order`)
    * satisfying `pred`; stops at the first violation. Implemented as a
    * running conjunction window — `partition` keys it for scale-out. */
  def takeWhile(pred: Column, order: Seq[Column],
                partition: Seq[Column] = Nil): Source[Row] = {
    val w0 = if (partition.isEmpty) Window.orderBy(order: _*)
             else Window.partitionBy(partition: _*).orderBy(order: _*)
    val w = w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val df = if (partition.isEmpty) Source.globalOrderGuard(ds.toDF(), w0)
             else ds.toDF()
    Source(df
      .withColumn("__ok", min(when(pred, 1).otherwise(0)).over(w))
      .filter(col("__ok") === 1)
      .drop("__ok"))
  }

  /** `merge` (Source.hs:170): synchronous interleave of two sources —
    * element i of each source alternates; a shorter source simply runs
    * out, like the reference. Ranks are computed per-source, the union is
    * re-ranked by (rank, side), and the interleave position is kept as
    * `pos` so downstream (and the oracle) can see the arrival order. */
  def merge(other: Source[A], order: Seq[Column],
            pos: String = "pos"): Source[Row] = {
    def ranked(df: DataFrame, side: Int): DataFrame = df
      .withColumn("__rn", row_number().over(Window.orderBy(order: _*)))
      .withColumn("__side", lit(side))
    val interleaved = ranked(ds.toDF(), 0).unionAll(ranked(other.ds.toDF(), 1))
      .withColumn(pos, row_number()
        .over(Window.orderBy(col("__rn"), col("__side"))).cast("long"))
      .drop("__rn", "__side")
    Source(Source.enforceGuard(interleaved, col(pos)))
  }

  /** Keyed `take` — first n of each `partition` group in `order`: the
    * scale-out form (window stays hash-partitioned, no global sort). */
  def takeWithin(n: Int, partition: Seq[Column],
                 order: Seq[Column]): Source[Row] = {
    val w = Window.partitionBy(partition: _*).orderBy(order: _*)
    Source(ds.toDF()
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n).drop("__rn"))
  }

  /** Keyed `drop` — all but the first n of each `partition` group. */
  def dropWithin(n: Int, partition: Seq[Column],
                 order: Seq[Column]): Source[Row] = {
    val w = Window.partitionBy(partition: _*).orderBy(order: _*)
    Source(ds.toDF()
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") > n).drop("__rn"))
  }

  /** Keyed `merge` — interleave the two sources independently within
    * every `partition` group; all windows stay hash-partitioned. */
  def mergeWithin(other: Source[A], partition: Seq[Column],
                  order: Seq[Column], pos: String = "pos"): Source[Row] = {
    def ranked(df: DataFrame, side: Int): DataFrame = df
      .withColumn("__rn", row_number().over(
        Window.partitionBy(partition: _*).orderBy(order: _*)))
      .withColumn("__side", lit(side))
    Source(ranked(ds.toDF(), 0).unionAll(ranked(other.ds.toDF(), 1))
      .withColumn(pos, row_number().over(Window.partitionBy(partition: _*)
        .orderBy(col("__rn"), col("__side"))).cast("long"))
      .drop("__rn", "__side"))
  }

  /** `every` (Util.hs:79): the stream's values then a terminal `Nothing`,
    * encoded as one trailing all-null row (columns become nullable). */
  def every(order: Seq[Column]): Source[Row] = {
    val df = ds.toDF()
    val nulls = df.sparkSession.range(1).select(
      df.schema.fields.toIndexedSeq
        .map(f => lit(null).cast(f.dataType).as(f.name)): _*)
    val tagged = df.select(col("*")).withColumn("__t", lit(0))
      .unionAll(nulls.withColumn("__t", lit(1)))
    Source(tagged.orderBy(col("__t") +: order: _*).drop("__t"))
  }

  /** `reduce` (Source.hs:158): strict fold → Catalyst aggregate with
    * map-side partial aggregation. */
  def reduce(first: Column, rest: Column*): DataFrame =
    ds.toDF().agg(first, rest: _*)

  /** `><` into a Channel (Core.hs:152). */
  def through[B](ch: Channel[A, B]): Source[B] = Source(ch.run(ds))

  /** `runTube` with a sink (Core.hs:256): terminal action. */
  def into(sink: Sink[A]): Unit = sink.run(ds)
}

object Source {
  /** Conf key enforcing the documented "driver-sized streams" contract
    * of the GLOBAL ordered-stream ops (`takeWhile`/`merge`/global
    * `scan`), whose unpartitioned windows push every row through one
    * partition. Unset (the default) they run unguarded; set it and any
    * global ordered op raises as soon as more rows than the limit flow
    * through the single-partition window — the error points at the
    * keyed `*Within`/partitioned form, which is the 100 TB path. */
  val MaxGlobalOrderedRows = "spark.graft.maxGlobalOrderedRows"

  private[core] def guardLimit(df: DataFrame): Option[Long] =
    df.sparkSession.conf.getOption(MaxGlobalOrderedRows).map(_.toLong)

  /** Filter-shaped guard on an existing global row number: passes every
    * row, but raises once `rn` exceeds the limit. (`coalesce(assert_true
    * (...), true)` — assert_true yields null when it holds, so the
    * filter is all-true yet cannot be pruned away as a no-op.) */
  private[core] def enforceGuard(df: DataFrame, rn: Column): DataFrame =
    guardLimit(df) match {
      case Some(n) => df.where(coalesce(assert_true(rn <= n,
        lit(s"global ordered-stream op exceeded $MaxGlobalOrderedRows=$n; " +
          "use the keyed/partitioned variant (takeWithin/dropWithin/" +
          "mergeWithin, scan(partition=...)) at scale")), lit(true)))
      case None => df
    }

  /** Guard for ops that don't already carry a global row number: adds
    * one over the same (cheap: same single-partition sort) window. */
  private[core] def globalOrderGuard(df: DataFrame,
                                     w0: org.apache.spark.sql.expressions.WindowSpec): DataFrame =
    guardLimit(df) match {
      case Some(_) =>
        enforceGuard(df.withColumn("__gg", row_number().over(w0)),
          col("__gg")).drop("__gg")
      case None => df
    }

  /** Monoid/Alternative `empty` (reference Source.hs:100,
    * `empty = Source $ return ()`): the exhausted producer — identity
    * of `concat`/`<|>` (laws in PropertySpec). An empty LocalRelation:
    * Catalyst folds unions with it away, so it costs nothing in a
    * plan. */
  def empty[A: Encoder](spark: SparkSession): Source[A] =
    Source(spark.emptyDataset[A])

  /** Num `fromInteger` (Source.hs:141 region): the literal as a
    * one-element stream — the unit that makes `s + fromInteger(k)`
    * shift every element by k through the applicative lift. */
  def fromInteger(spark: SparkSession, n: Long): Source[Row] =
    Source(spark.range(n, n + 1).toDF("lit"))

  /** `each` (Util.hs:76): source from a local collection. */
  def each[A: Encoder](spark: SparkSession, xs: Seq[A]): Source[A] =
    Source(spark.createDataset(xs))

  /** Table-backed source (the 100 TB path): column-pruned,
    * filter-pushed parquet scan. */
  def parquet(spark: SparkSession, path: String): Source[Row] =
    Source(spark.read.parquet(path))

  /** `prompt` (Tubes.hs:172): line source; files stand in for stdin. */
  def text(spark: SparkSession, path: String): Source[Row] =
    Source(spark.read.text(path))

  def csv(spark: SparkSession, path: String,
          header: Boolean = true): Source[Row] =
    Source(spark.read.option("header", header.toString)
      .option("inferSchema", "true").csv(path))

  def json(spark: SparkSession, path: String): Source[Row] =
    Source(spark.read.json(path))

  /** ORC scan — column-pruned and filter-pushed like [[parquet]]. */
  def orc(spark: SparkSession, path: String): Source[Row] =
    Source(spark.read.orc(path))
}
