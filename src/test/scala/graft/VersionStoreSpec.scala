package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables.VersionStore

/** The shared versioned-table layer (r9-verdict ask #5): ONE
  * implementation of marker-gated listing, staged atomic publish,
  * pointer manifests, reference-counted retention and the replay
  * watermark — the CDC chain, edge artifact, ANN index and COW DML
  * all ride through this code, so the torn-dir / crash-debris edge
  * cases are proven here once. */
class VersionStoreSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def rm(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(rm)
    f.delete(): Unit
  }

  test("publish is marker-gated; torn dirs invisible and reaped") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_vs_spec")
    val dir = base.resolve("t").toString
    val fs = VersionStore.fsOf(spark, dir)
    VersionStore.publish(spark, dir, 0L) { stage =>
      Seq(1, 2, 3).toDF("x").write.parquet(stage)
    }
    assert(VersionStore.committed(spark, dir) == Seq(0L))
    assert(VersionStore.read(spark, dir).count() == 3)
    // a torn writer: unmarked v=1 dir + leftover stage dir — both
    // invisible to readers...
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/v=1")): Unit
    Seq(9).toDF("x").write.parquet(s"$dir/v=1/junk")
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/_stage_v=0")): Unit
    assert(VersionStore.committed(spark, dir) == Seq(0L))
    assert(VersionStore.head(spark, dir).contains(0L))
    // ...and BELOW-head debris is reaped by retention (r9 advice:
    // previously accumulated forever); v=1 is ABOVE head → a possible
    // concurrent writer, left alone until a later head supersedes it
    VersionStore.retain(spark, dir, keepLast = 5)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/_stage_v=0")),
      "stage debris at/below head must be reaped")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/v=1")),
      "an unmarked dir above head may be a writer mid-publish")
    VersionStore.publish(spark, dir, 2L) { stage =>
      Seq(4, 5).toDF("x").write.parquet(stage)
    }
    VersionStore.retain(spark, dir, keepLast = 5)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/v=1")),
      "torn dir below the new head must be reaped")
    assert(VersionStore.committed(spark, dir).sorted == Seq(0L, 2L))
    rm(base.toFile)
  }

  test("publishExclusive: losers conflict, stage debris reaped") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_vs_excl")
    val dir = base.resolve("t").toString
    val fs = VersionStore.fsOf(spark, dir)
    VersionStore.publishExclusive(spark, dir, 0L) { stage =>
      Seq(1, 2, 3).toDF("x").write.parquet(stage)
    }
    assert(VersionStore.committed(spark, dir) == Seq(0L))
    // a second writer that resolved the SAME head computes the same
    // next id — it must fail with a conflict, not clobber the winner
    intercept[VersionStore.VersionConflictException] {
      VersionStore.publishExclusive(spark, dir, 0L) { stage =>
        Seq(9).toDF("x").write.parquet(stage)
      }
    }
    assert(VersionStore.read(spark, dir).count() == 3,
      "the losing writer must not disturb the committed version")
    // the loser re-resolves the head and retries with the next id —
    // the optimistic-concurrency loop Scale's DML runs
    VersionStore.publishExclusive(spark, dir,
      VersionStore.head(spark, dir).get + 1) { stage =>
      Seq(9).toDF("x").write.parquet(stage)
    }
    assert(VersionStore.committed(spark, dir).sorted == Seq(0L, 1L))
    // UNMARKED debris at the target id (a writer that crashed between
    // its rename and its marker): while YOUNG (within the debris
    // grace) it is presumed a live racer mid-commit — the publisher
    // must back off with a conflict and leave the dir UNTOUCHED
    // (r11 advice: deleting it races the racer's marker PUT)...
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/v=2/junk")): Unit
    intercept[VersionStore.VersionConflictException] {
      VersionStore.publishExclusive(spark, dir, 2L) { stage =>
        Seq(7, 8).toDF("x").write.parquet(stage)
      }
    }
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/v=2/junk")),
      "young unmarked debris must not be touched (presumed racer)")
    // ...and once AGED past the grace it is evicted atomically and
    // the new publish serves the new content — naive rename-onto-
    // existing would nest the new stage inside the debris and the
    // marker would commit the dead writer's content
    spark.conf.set("spark.graft.commit.debrisGraceMs", "0")
    try VersionStore.publishExclusive(spark, dir, 2L) { stage =>
      Seq(7, 8).toDF("x").write.parquet(stage)
    } finally spark.conf.unset("spark.graft.commit.debrisGraceMs")
    assert(VersionStore.read(spark, dir, Some(2L))
      .collect().map(_.getInt(0)).toSet == Set(7, 8),
      "publish onto unmarked debris must serve the NEW content")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/v=2/junk")),
      "debris must not survive inside the committed version")
    // unique-suffix stage debris (a loser that died before cleanup)
    // is still recognized and reaped by retention
    fs.mkdirs(
      new org.apache.hadoop.fs.Path(s"$dir/_stage_v=1.dead1234")): Unit
    VersionStore.retain(spark, dir, keepLast = 5)
    assert(!fs.exists(
      new org.apache.hadoop.fs.Path(s"$dir/_stage_v=1.dead1234")),
      "suffixed stage debris at/below head must be reaped")
    rm(base.toFile)
  }

  test("retention is manifest-reference-counted; watermark raises") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_vs_ref")
    val dir = base.resolve("t").toString
    val fs = VersionStore.fsOf(spark, dir)
    // v=0 holds two data files; v=1's manifest points at ONE of them
    // plus its own new file — pruning v=0 must keep the shared file
    VersionStore.publish(spark, dir, 0L) { stage =>
      Seq(1).toDF("x").coalesce(1).write.parquet(s"$stage/__tmp_a")
      Seq(2).toDF("x").coalesce(1).write.parquet(s"$stage/__tmp_b")
      def mv(sub: String, name: String): Unit =
        fs.listStatus(new org.apache.hadoop.fs.Path(s"$stage/$sub"))
          .map(_.getPath).find(_.getName.endsWith(".parquet"))
          .foreach { p =>
            fs.rename(p, new org.apache.hadoop.fs.Path(stage, name)): Unit
            fs.delete(new org.apache.hadoop.fs.Path(s"$stage/$sub"),
              true): Unit
          }
      mv("__tmp_a", "a.parquet")
      mv("__tmp_b", "b.parquet")
    }
    VersionStore.publish(spark, dir, 1L) { stage =>
      Seq(3).toDF("x").coalesce(1).write.parquet(s"$stage/__tmp_c")
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$stage/__tmp_c"))
        .map(_.getPath).find(_.getName.endsWith(".parquet"))
        .foreach { p =>
          fs.rename(p, new org.apache.hadoop.fs.Path(stage,
            "c.parquet")): Unit
          fs.delete(new org.apache.hadoop.fs.Path(s"$stage/__tmp_c"),
            true): Unit
        }
      VersionStore.writeManifest(spark, stage,
        Seq(s"$dir/v=0/a.parquet", s"$dir/v=1/c.parquet"))
    }
    assert(VersionStore.read(spark, dir).as[Int].collect().toSet
      == Set(1, 3))
    val dropped = VersionStore.retain(spark, dir, keepLast = 1,
      watermark = true)
    assert(dropped == Seq(0L))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/v=0/a.parquet")),
      "file referenced by the kept manifest must survive")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/v=0/b.parquet")),
      "unreferenced file must be pruned")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$dir/v=0/${VersionStore.CommitMarker}")),
      "pruned version must lose its marker")
    assert(VersionStore.committed(spark, dir) == Seq(1L))
    assert(VersionStore.read(spark, dir).as[Int].collect().toSet
      == Set(1, 3), "the head still serves through the pointer")
    // watermark raised and never lowers
    assert(VersionStore.prunedWatermark(spark, dir).contains(0L))
    VersionStore.raiseWatermark(spark, dir, -5L)
    assert(VersionStore.prunedWatermark(spark, dir).contains(0L))
    rm(base.toFile)
  }

  test("two-JVM publishExclusive race: no commit lost, duplicated, or torn") {
    import scala.jdk.CollectionConverters._
    val base = java.nio.file.Files.createTempDirectory("graft_vs_xjvm")
    val dir = base.resolve("t").toString
    val n = 5
    // a SECOND DRIVER PROCESS races this one on the same chain — the
    // only shared state is the filesystem (the cross-process claim
    // the protocol's marker create-if-absent makes)
    val java17 = java.nio.file.Paths
      .get(System.getProperty("java.home"), "bin", "java").toString
    val ia = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toVector
    val opens = ia.zipWithIndex.flatMap {
      case (a, i) if a == "--add-opens" && i + 1 < ia.size =>
        Seq(a, ia(i + 1))
      case (a, _) if a.startsWith("--add-opens=") => Seq(a)
      case _ => Seq.empty
    }
    val log = base.resolve("child.log").toFile
    val pb = new ProcessBuilder(
      (Seq(java17) ++ opens ++ Seq("-Xmx1g",
        "-Dspark.ui.enabled=false",
        "-cp", System.getProperty("java.class.path"),
        "graft.VersionRaceChild", dir, "B", n.toString)).asJava)
    pb.redirectErrorStream(true)
    pb.redirectOutput(log)
    val child = pb.start()
    // parent writer, in-process, same protocol, tag A
    var i = 0
    var attempts = 0
    while (i < n && attempts < 500) {
      attempts += 1
      val id = VersionStore.head(spark, dir).map(_ + 1).getOrElse(0L)
      try {
        VersionStore.publishExclusive(spark, dir, id) { stage =>
          VersionStore.fsOf(spark, dir)
            .mkdirs(new org.apache.hadoop.fs.Path(stage)): Unit
          VersionStore.writeOp(spark, stage, "APPEND", s"A-$i")
        }
        i += 1
      } catch {
        case _: VersionStore.VersionConflictException => ()
      }
    }
    assert(i == n, s"parent writer starved after $attempts attempts")
    assert(child.waitFor(180, java.util.concurrent.TimeUnit.SECONDS),
      "child JVM did not finish in time")
    assert(child.exitValue() == 0,
      s"child failed: ${scala.io.Source.fromFile(log).mkString.takeRight(800)}")
    // the chain: exactly 2n contiguous committed versions, each
    // carrying exactly one writer's COMPLETE op note, both writers'
    // full sequences present exactly once
    val vs = VersionStore.committed(spark, dir).sorted
    assert(vs == (0L until 2L * n), s"ids must be contiguous: $vs")
    val notes = vs.map(v => VersionStore.opOf(spark, dir, v)
      .getOrElse(fail(s"version $v lost its op note"))._2)
    val want = (0 until n).flatMap(k => Seq(s"A-$k", s"B-$k")).toSet
    assert(notes.toSet == want && notes.size == want.size,
      s"lost/duplicated commits: $notes")
    // per-writer order preserved (a writer only advances after its
    // commit succeeds)
    def seqOf(tag: String) = notes.filter(_.startsWith(tag))
      .map(_.stripPrefix(s"$tag-").toInt)
    assert(seqOf("A") == (0 until n) && seqOf("B") == (0 until n))
    rm(base.toFile)
  }
}
