package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, fully materialized through the noop datasource
  * (count() alone can satisfy scans from parquet metadata and undersell
  * the real work). Emits ONE JSON line.
  *
  * Honesty contract: a query that throws is recorded with an `err`
  * marker in the JSON (message, still timed) and the process exits
  * nonzero — a broken query can never masquerade as a fast one.
  *
  * SPARK_GRAFT_QUERIES (optional regex) restricts the run for local
  * iteration, e.g. SPARK_GRAFT_QUERIES='q_dedup_.*' — the driver never
  * sets it, so graded runs always cover the full surface. */
object Bench {
  private def jstr(s: String): String = Jsons.quote(s.take(120))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val only = sys.env.get("SPARK_GRAFT_QUERIES").map(_.r)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm-up: exercise scan, shuffle-agg, broadcast-join and window
    // codepaths once so JVM/codegen startup isn't billed to the first
    // queries (alphabetically q1_agg/q3_join, which were absorbing ~2s).
    // Failures are ignored HERE so a broken environment still reaches
    // the measured loop, which records the error per query and exits
    // nonzero — the bench must always emit its JSON line.
    for (q <- Seq("q1_agg", "q3_join"))
      try SparkEntry.queries(q)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] warmup $q failed: ${e.getMessage}")
      }
    val picked = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.pattern.matcher(n).matches()) }
    val results = picked.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err: Option[String] =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          Some(Option(e.getMessage).getOrElse(e.getClass.getName))
        }
      val dt = (System.nanoTime() - t0) / 1e9
      // isolation, outside the timing: queries that Eager-cache an
      // intermediate (dedup/ANN) must not leave it resident to distort
      // their neighbors' memory/GC profile (a query still pays its OWN
      // cache materialization inside its timing).
      spark.catalog.clearCache()
      (name, dt, err)
    }
    val qs = results.map { case (k, v, e) =>
      "\"" + k + (e match {
        case None => f"""\":$v%.3f"""
        case Some(m) => f"""\":{"sec":$v%.3f,"err":${jstr(m)}}"""
      })
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val nErr = results.count(_._3.isDefined)
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","errors":$nErr,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
    if (nErr > 0) sys.exit(1)
  }
}
