package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Relational

/** [[graft.ops.Relational.rangeJoin]] — the binning rewrite must equal
  * the naive θ-join exactly, and must not plan a nested loop. */
class RangeJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft_wh").toString)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  private def epochDays(c: String) =
    expr(s"datediff($c, DATE'1970-01-01')").cast("long")

  test("binning rewrite equals the naive theta-join row-for-row") {
    val t = graft.tables.Tables(spark, sf)
    val intervals = t.lineitem.where(col("l_orderkey") % 11 === 0)
      .select(col("l_orderkey"), col("l_linenumber"),
        epochDays("l_shipdate").as("lo"),
        (epochDays("l_shipdate") + col("l_orderkey") % 30 + lit(1)).as("hi"))
    val points = t.orders.select(col("o_orderkey"),
      epochDays("o_orderdate").as("od"))
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("o_orderkey", "l_orderkey", "l_linenumber")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .sorted.toSeq
    val naive = key(points.join(intervals,
      col("od") >= col("lo") && col("od") <= col("hi")))
    // several bin widths, including one smaller than every span and one
    // larger than the whole date range — exactness must not depend on it
    for (bin <- Seq(1L, 7L, 32L, 100000L))
      assert(key(Relational.rangeJoin(points, intervals,
        "od", "lo", "hi", bin)) == naive, s"bin=$bin diverges")
    assert(naive.nonEmpty)
  }

  test("plan is a hash equi-join on the bucket — no nested loop") {
    val p = graft.SparkEntry.queries("q_range_join")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"range join fell back to a nested loop:\n$p")
    assert(p.contains("__bkt"), s"no bucket key in plan:\n$p")
  }

  test("bounds inclusive; lo>hi never matches; bucket-crossing intervals") {
    import spark.implicits._
    val pts = Seq((1L, 10L), (2L, 20L), (3L, 29L), (4L, 30L), (5L, 31L))
      .toDF("pid", "v")
    val ivs = Seq((100L, 10L, 10L),   // degenerate single-point interval
                  (200L, 15L, 30L),   // crosses the bin=16 boundary
                  (300L, 31L, 25L))   // lo > hi: must never match
      .toDF("iid", "lo", "hi")
    val got = Relational.rangeJoin(pts, ivs, "v", "lo", "hi", bin = 16L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    assert(got == Seq((1L, 100L), (2L, 200L), (3L, 200L), (4L, 200L)))
  }
}
