package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable relational operators that compose from the DataFrame API
  * but deserve a named entry point — the queries in [[Queries]] are
  * demos; these are the operators a user calls directly.
  */
object Relational {

  /** Binned RANGE join: pair every `points` row with every `intervals`
    * row whose `[lo, hi]` contains the point (both bounds inclusive) —
    * the interval-containment θ-join Spark itself can only plan as
    * BroadcastNestedLoopJoin (or a cartesian when neither side fits in
    * a broadcast), which is quadratic work regardless of selectivity.
    *
    * Shape: the classic binning rewrite (the published
    * overlap-interval-join used by range-join hints elsewhere). Each
    * interval is exploded to the `bin`-sized buckets it overlaps
    * (`sequence(floor(lo/bin), floor(hi/bin))`), each point keys to
    * the single bucket containing it, and the θ-join becomes one hash
    * equi-join on the bucket id followed by the exact residual
    * predicate. No pair outside bucket-distance survives the shuffle,
    * so work is |points| + Σ(span_i/bin + 1) + |true matches within a
    * bucket| — linear in inputs when `bin` is chosen near the median
    * interval span. Each (point, interval) match meets in EXACTLY one
    * bucket (the point's), so no dedup pass is needed.
    *
    * Scale: both sides shuffle-partition on the bucket id — fully
    * parallel, AQE coalesces sparse buckets and splits skewed ones
    * (time-clustered intervals land in few buckets; that is a data
    * property the equi-join exposes to AQE rather than hiding inside
    * a nested loop). A too-small `bin` inflates the interval explode
    * by span/bin rows per interval; a too-large one degrades toward
    * per-bucket mini-cartesians. Pick `bin` ≈ median span — the
    * residual filter keeps the answer exact for any positive choice.
    *
    * @param points    probe side; `point` must be a numeric column
    * @param intervals build side; `lo`/`hi` numeric, `lo <= hi` rows
    *                  only (violations simply never match)
    * @param bin       bucket width in the column's units (> 0)
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, point: String,
                lo: String, hi: String, bin: Long): DataFrame = {
    require(bin > 0, "bin width must be positive")
    require(points.columns.toSet.intersect(intervals.columns.toSet).isEmpty,
      "points and intervals must have disjoint column names")
    val p = points.withColumn("__bkt",
      floor(col(point).cast("long") / lit(bin)))
    val i = intervals.where(col(lo) <= col(hi)).withColumn("__bkt",
      explode(sequence(floor(col(lo).cast("long") / lit(bin)),
        floor(col(hi).cast("long") / lit(bin)))))
    p.join(i, Seq("__bkt"))
      .where(col(point) >= col(lo) && col(point) <= col(hi))
      .drop("__bkt")
  }

  /** Backward as-of join: attach to every `left` row the `right` row
    * with the greatest `order` value that is `<=` the left row's
    * `order`, within the same equality `key` (the pandas
    * `merge_asof` / kdb `aj` / DuckDB `ASOF JOIN` contract, equality
    * inclusive). Left rows with no such right row keep null matched
    * columns (left-outer preserving).
    *
    * Shape: tag-and-union + one running window — NOT a range join.
    * Both inputs are projected onto a common schema (right-only
    * payload packed into one struct, null on left rows), unioned, and
    * scanned once per key partition ordered by (`order`, side) with
    * right rows sorting before left rows at ties so an equal-`order`
    * right row is visible to the left row's frame. The running
    * `max(payload_struct)` picks the match: the struct's first field
    * is `order`, so lexicographic max = greatest visible `order`, and
    * any remaining right-side ties break deterministically on the
    * value fields — unlike a running `last(...)`, which would depend
    * on the unspecified sort order among equal keys. Packing the
    * payload as ONE struct also keeps the matched row atomic: per-
    * column `last(ignoreNulls)` could stitch fields from different
    * right rows when a value field is null.
    *
    * Scale: one hash shuffle of `|left| + |right|` rows on `key`,
    * then a linear per-partition scan — the plan stays partitioned on
    * `key` for downstream use. A range-join formulation would explode
    * on long histories (every candidate pair materialized before the
    * per-row argmax); this form carries exactly one running struct of
    * state per partition. Skew bounds parallelism by key cardinality,
    * same as any keyed window — for few huge keys, pre-bucket `order`
    * ranges and stitch the bucket boundaries.
    *
    * @param left      probe side; must contain `key` and `order`
    * @param right     reference side; must contain `key` and `order`
    * @param key       equality join columns (same names both sides)
    * @param order     ordering column (same name both sides); right
    *                  rows with null `order` never match
    * @param rightCols right payload columns to attach (default: every
    *                  right column except `key` and `order`)
    * @param prefix    prefix for attached columns; the matched
    *                  `order` value itself arrives as `prefix+order`
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: Seq[String],
               order: String, rightCols: Seq[String] = Nil,
               prefix: String = "asof_"): DataFrame = {
    require(key.nonEmpty, "asofJoin needs at least one equality key")
    val leftCols = left.columns.toSeq
    require((key :+ order).forall(leftCols.contains),
      s"left side must contain $key and $order")
    require((key :+ order).forall(right.columns.contains),
      s"right side must contain $key and $order")
    val vals = (if (rightCols.nonEmpty) rightCols
                else right.columns.toSeq).filterNot(c =>
      key.contains(c) || c == order)
    val payload = struct(col(order) +: vals.map(col): _*)
    val payloadT = right.select(payload).schema.head.dataType
    val lSide = left.select(leftCols.map(col) :+
      lit(null).cast(payloadT).as("__asof") :+ lit(1).as("__side"): _*)
    val rSide = right.where(col(order).isNotNull).select(
      leftCols.map { c =>
        if (key.contains(c) || c == order) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)
      } :+ payload.as("__asof") :+ lit(0).as("__side"): _*)
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col(order).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lSide.unionByName(rSide)
      .withColumn("__m", max(col("__asof")).over(w))
      .where(col("__side") === 1)
      .select(leftCols.map(col) ++
        (col("__m").getField(order).as(prefix + order) +:
          vals.map(v => col("__m").getField(v).as(prefix + v))): _*)
  }
}
