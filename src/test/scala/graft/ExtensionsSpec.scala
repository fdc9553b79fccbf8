package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** vec_dot is available through the SparkSessionExtensions plugin path
  * (cluster-wide config), not just per-session registration. */
class ExtensionsSpec extends AnyFunSuite {
  test("GraftExtensions injects vec_dot for SQL use") {
    // getOrCreate reuses any active session and would skip extensions —
    // retire it first (suites run sequentially; the next suite's lazy
    // getOrCreate simply builds a fresh one)
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    try {
      val got = spark.sql(
        "SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
        .collect()(0).getDouble(0)
      assert(got == 11.0)
      // the whole native-function surface is injected cluster-wide
      val row = spark.sql(
        """SELECT size(vec_normalize(array(3.0D, 4.0D))) AS a,
          |  size(hyperplane_lsh(array(1.0D, 2.0D), 4, 4)) AS b,
          |  simhash60(array('x', 'y')) >= 0 AS c,
          |  size(minhash_sig(array('x', 'y'))) AS d,
          |  sorted_intersect_count(array(1L, 2L), array(2L, 3L)) AS e,
          |  array_count_in(array('a', 'b', 'a'), array('a')) AS f
          |""".stripMargin).collect()(0)
      assert(row.getInt(0) == 2 && row.getInt(1) == 4 &&
        row.getBoolean(2) && row.getInt(3) == 64 && row.getLong(4) == 1L &&
        row.getLong(5) == 2L)

      // Rule[LogicalPlan]: the declarative fold is rewritten to the
      // native expression (range() keeps the relation non-local so
      // ConvertToLocalRelation can't pre-evaluate the projection)
      val fold =
        """aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D,
          |  (acc, v) -> acc + v)""".stripMargin
      val df = spark.sql(
        s"""SELECT $fold AS d FROM (
           |  SELECT array(cast(id as double), 2.0D) AS a,
           |         array(3.0D, 4.0D) AS b FROM range(2))""".stripMargin)
      assert(df.queryExecution.optimizedPlan.expressions.exists(
          _.exists(_.isInstanceOf[graft.functions.VectorDot])),
        s"fold not rewritten:\n${df.queryExecution.optimizedPlan}")
      assert(df.collect().map(_.getDouble(0)).sorted.toSeq == Seq(8.0, 11.0))
      // ...and with the fold's exact semantics on the edge rows: NULL on
      // ragged or null-element arrays, +0.0 on empty — compared
      // null-sensitively (<=>) against the un-rewritten fold
      val parity = spark.sql(
        s"""SELECT vec_dot(a, b) <=> $fold AS same FROM VALUES
           |  (array(1.0D, 2.0D), array(3.0D, 4.0D)),
           |  (array(1.0D), array(5.0D, 6.0D)),
           |  (array(1.0D, NULL), array(2.0D, 3.0D)),
           |  (cast(array() as array<double>), cast(array() as array<double>))
           |AS t(a, b)""".stripMargin)
      assert(parity.collect().forall(_.getBoolean(0)))

      // Rule[LogicalPlan] #2: size(filter(x IN (...))) → ArrayCountIn
      // (range() keeps the relation non-local, as above)
      val cnt = spark.sql(
        """SELECT size(filter(toks, t -> t IN ('a', 'c'))) AS c FROM (
          |  SELECT array(cast(id as string), 'a', 'c', 'a') AS toks
          |  FROM range(2))""".stripMargin)
      assert(cnt.queryExecution.optimizedPlan.expressions.exists(
          _.exists(_.isInstanceOf[graft.functions.ArrayCountIn])),
        s"membership count not rewritten:\n${cnt.queryExecution.optimizedPlan}")
      // id=0 → toks ('0','a','c','a') → 3; id=1 → ('1','a','c','a') → 3
      assert(cnt.collect().map(_.getInt(0)).toSeq == Seq(3, 3))
      // null parity vs the un-rewritten lambda: CASE blocks the rewrite
      // pattern on the right side, so this really compares both paths
      val cntParity = spark.sql(
        """SELECT size(filter(toks, t -> t IN ('a'))) <=>
          |  size(filter(toks, t -> CASE WHEN true THEN t IN ('a') END))
          |  AS same
          |FROM (SELECT IF(id = 0, array('a', NULL, 'b', 'a'),
          |    cast(null as array<string>)) AS toks FROM range(2))""".stripMargin)
      assert(cntParity.collect().forall(_.getBoolean(0)))
    } finally spark.stop()
  }
}
