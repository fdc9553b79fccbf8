package graft

import graft.tables.VersionStore

/** Child main for VersionStoreSpec's two-JVM race arm: a SEPARATE
  * driver process appending `count` versions to a shared chain
  * through the real [[VersionStore.publishExclusive]] protocol —
  * no shared JVM state with the test process, so the only
  * coordination is the filesystem's create-if-absent marker. Each
  * commit's op note records `tag-seq`; the parent asserts no commit
  * is lost, duplicated, or torn. */
object VersionRaceChild {
  def main(args: Array[String]): Unit = {
    val Array(dir, tag, countS) = args
    val n = countS.toInt
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var i = 0
    var attempts = 0
    while (i < n && attempts < 500) {
      attempts += 1
      val id = VersionStore.head(spark, dir).map(_ + 1).getOrElse(0L)
      try {
        VersionStore.publishExclusive(spark, dir, id) { stage =>
          VersionStore.fsOf(spark, dir)
            .mkdirs(new org.apache.hadoop.fs.Path(stage)): Unit
          VersionStore.writeOp(spark, stage, "APPEND", s"$tag-$i")
        }
        i += 1
      } catch {
        case _: VersionStore.VersionConflictException => ()
      }
    }
    spark.stop()
    sys.exit(if (i == n) 0 else 2)
  }
}
