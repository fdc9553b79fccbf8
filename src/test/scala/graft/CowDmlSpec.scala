package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Scale
import graft.tables.VersionStore

/** Copy-on-write DML (#42g), manifest-pointer edition: DELETE/UPDATE
  * rewrite ONLY the files the predicate touches; untouched files are
  * carried by MANIFEST POINTER — never rewritten, never byte-copied
  * (the r9 shape streamed every untouched byte through the driver) —
  * and the logical result equals the plain filter / CASE projection. */
class CowDmlSpec extends AnyFunSuite {
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

  private def parquets(d: String): Array[java.io.File] = {
    val fl = new java.io.File(d).listFiles()
    if (fl == null) Array.empty
    else fl.filter(_.getName.endsWith(".parquet"))
  }

  test("deleteWhere rewrites only hit files; untouched ride by pointer") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_cow_spec")
    val src = base.resolve("src").toString
    val dest = base.resolve("del").toString
    // k in 0..3, one file per k: the predicate k = 2 must touch 1 of 4
    val df = (1 to 4000).map(i => (i.toLong, i.toLong % 4, s"v$i"))
      .toDF("id", "k", "v")
    df.repartition(4, col("k")).write.parquet(src)
    val srcSnapshot = parquets(src)
      .map(f => f.getName -> (f.length(), f.lastModified())).toMap
    val stats = Scale.deleteWhere(spark, src, dest, col("k") === 2)
    // 4 key values hash into ≤4 partitions (collisions allowed), but
    // k=2's rows land in exactly ONE file — the only one rewritten
    assert(stats.filesTotal >= 2 && stats.filesRewritten == 1,
      s"expected a single-file rewrite, got $stats")
    assert(stats.rowsBefore == 4000 && stats.rowsAfter == 3000)
    val got = Scale.readTable(spark, dest)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exp = df.where(col("k") =!= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == exp)
    // NO-COPY proof: the version dir holds ONLY the rewritten file;
    // every untouched file stayed in src, bit-for-bit undisturbed
    val vdirFiles = parquets(s"$dest/v=0")
    assert(vdirFiles.length == 1,
      s"untouched files must NOT be copied into the version dir, " +
        s"found ${vdirFiles.length}")
    val after = parquets(src)
      .map(f => f.getName -> (f.length(), f.lastModified())).toMap
    assert(after == srcSnapshot, "source files were disturbed")
    // the manifest points at src for every untouched file
    val mf = VersionStore.manifest(spark, dest, 0L)
    assert(mf.count(_.contains("/src/")) ==
      stats.filesTotal - stats.filesRewritten)
    // UPDATE twin: matched rows get the new value, others untouched
    val upd = base.resolve("upd").toString
    val us = Scale.updateWhere(spark, src, upd, col("k") === 2,
      Seq("v" -> lit("X")))
    assert(us.filesRewritten == stats.filesRewritten &&
      us.rowsAfter == 4000)
    val uv = Scale.readTable(spark, upd)
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    assert((1 to 4000).forall(i =>
      uv(i.toLong) == (if (i % 4 == 2) "X" else s"v$i")))
    rm(base.toFile)
  }

  test("chained DML + retention: pointers resolve across versions") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_cow_chain")
    val src = base.resolve("src").toString
    val tbl = base.resolve("tbl").toString
    val df = (1 to 4000).map(i => (i.toLong, i.toLong % 4, i * 10.0))
      .toDF("id", "k", "v")
    df.repartition(4, col("k")).write.parquet(src)
    val srcFiles = parquets(src).length
    // v=0: delete k=2; v=1: update k=1 — the update's base is v=0's
    // manifest, so its untouched pointers span src AND v=0
    Scale.deleteWhere(spark, src, tbl, col("k") === 2)
    val us = Scale.updateWhere(spark, src, tbl, col("k") === 1,
      Seq("v" -> lit(-1.0)))
    assert(us.filesRewritten == 1 && us.rowsAfter == 3000)
    val got = Scale.readTable(spark, tbl)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(got.size == 3000 && !got.keySet.exists(_ % 4 == 2))
    assert(got.forall { case (id, v) =>
      v == (if (id % 4 == 1) -1.0 else id * 10.0) })
    // time travel: v=0 still serves the pre-update state
    val v0 = VersionStore.read(spark, tbl, Some(0L))
    assert(v0.where(col("v") === -1.0).count() == 0)
    // retention to head only: v=0's rewritten file survives ONLY if
    // v=1 still references it (it does not here — both DML hit the
    // same k-hash file? no: k=2 and k=1 differ) — referenced files
    // survive, unreferenced ones go, src is never touched
    val mf1 = VersionStore.manifest(spark, tbl, 1L)
    VersionStore.retain(spark, tbl, keepLast = 1)
    assert(VersionStore.committed(spark, tbl) == Seq(1L))
    mf1.foreach { f =>
      assert(VersionStore.fsOf(spark, tbl)
        .exists(new org.apache.hadoop.fs.Path(f)),
        s"referenced file pruned: $f")
    }
    val got2 = Scale.readTable(spark, tbl)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(got2 == got, "retention changed the served table")
    assert(parquets(src).length == srcFiles,
      "retention touched the source")
    rm(base.toFile)
  }

  test("tableChanges: manifest-diff CDF reads only changed files") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_cow_cdf")
    val src = base.resolve("src").toString
    val tbl = base.resolve("tbl").toString
    val df = (1 to 4000).map(i => (i.toLong, i.toLong % 4, i * 1.0))
      .toDF("id", "k", "v")
    df.repartition(4, col("k")).write.parquet(src)
    Scale.deleteWhere(spark, src, tbl, col("k") === 2) // v=0
    Scale.updateWhere(spark, src, tbl, col("k") === 1, // v=1
      Seq("v" -> (col("v") + 0.5)))
    val ch = Scale.tableChanges(spark, tbl, 0L, 1L)
      .collect().map(r => (r.getString(3), r.getLong(0), r.getDouble(2)))
    // exactly the k=1 rows change: old image out, +0.5 image in
    val dels = ch.filter(_._1 == "D").map(t => t._2 -> t._3).toMap
    val ins = ch.filter(_._1 == "I").map(t => t._2 -> t._3).toMap
    assert(dels.keySet == ins.keySet &&
      dels.keySet == (1 to 4000).filter(_ % 4 == 1).map(_.toLong).toSet)
    assert(dels.forall { case (id, v) => v == id * 1.0 } &&
      ins.forall { case (id, v) => v == id * 1.0 + 0.5 })
    // I/O bound: the diff read only the files the manifests disagree
    // on — k=1's one rewritten file per side, never the whole table
    val mf0 = VersionStore.manifest(spark, tbl, 0L).toSet
    val mf1 = VersionStore.manifest(spark, tbl, 1L).toSet
    assert((mf0 -- mf1).size == 1 && (mf1 -- mf0).size == 1,
      "a one-key UPDATE must change exactly one manifest entry")
    rm(base.toFile)
  }

  test("mergeInto: matched update in-file, unmatched append, no copy") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_cow_mrg")
    val src = base.resolve("src").toString
    val tbl = base.resolve("tbl").toString
    val df = (1 to 4000).map(i => (i.toLong, i.toLong % 4, i * 1.0))
      .toDF("id", "k", "v")
    df.repartition(4, col("k")).write.parquet(src)
    // updates hit only k=2 rows' file(s); two brand-new ids append
    val source = Seq((2L, 2L, -2.0), (6L, 2L, -6.0),
      (9001L, 7L, 91.0), (9002L, 7L, 92.0)).toDF("id", "k", "v")
    val stats = Scale.mergeInto(spark, src, tbl, source, Seq("id"))
    assert(stats.rowsBefore == 4000 && stats.rowsAfter == 4002)
    assert(stats.filesRewritten >= 1 &&
      stats.filesRewritten < stats.filesTotal,
      s"only the matched files may rewrite: $stats")
    val got = Scale.readTable(spark, tbl)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(got(2L) == -2.0 && got(6L) == -6.0, "matched rows updated")
    assert(got(9001L) == 91.0 && got(9002L) == 92.0, "inserts landed")
    assert(got(1L) == 1.0 && got.size == 4002)
    // no-copy: the version dir holds rewritten + the one insert file
    val vdirFiles = parquets(s"$tbl/v=0").map(_.getName)
    assert(vdirFiles.count(_.startsWith("merge-insert-")) == 1)
    assert(vdirFiles.length.toLong == stats.filesRewritten + 1,
      s"untouched files must not be copied: ${vdirFiles.toSeq}")
    rm(base.toFile)
  }

  test("addColumn is metadata-only; reads align; DML fills in place") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_cow_ddl")
    val src = base.resolve("src").toString
    val tbl = base.resolve("tbl").toString
    val df = (1 to 4000).map(i => (i.toLong, i.toLong % 4, i * 1.0))
      .toDF("id", "k", "v")
    df.repartition(4, col("k")).write.parquet(src)
    Scale.deleteWhere(spark, src, tbl, col("k") === 2) // v=0
    val as = Scale.addColumn(spark, src, tbl, "flag",   // v=1: DDL
      org.apache.spark.sql.types.LongType)
    assert(as.filesRewritten == 0, "ADD COLUMN must rewrite nothing")
    // metadata-only proof: the DDL version dir holds ZERO data files
    assert(parquets(s"$tbl/v=1").isEmpty,
      "a metadata-only DDL must not write data files")
    // reads align: every pre-DDL row carries a typed NULL
    val v1 = Scale.readTable(spark, tbl)
    assert(v1.columns.toSeq == Seq("id", "k", "v", "flag"))
    assert(v1.where(col("flag").isNotNull).count() == 0)
    // a later UPDATE fills the column in just its hit files; other
    // files still physically lack it and keep reading as NULL
    Scale.updateWhere(spark, src, tbl, col("k") === 1, // v=2
      Seq("flag" -> lit(7L)))
    val got = Scale.readTable(spark, tbl)
      .collect().map(r =>
        (r.getLong(0), if (r.isNullAt(3)) -1L else r.getLong(3)))
      .toMap
    assert(got.size == 3000)
    assert(got.forall { case (id, f) =>
      f == (if (id % 4 == 1) 7L else -1L) })
    // time travel: the pre-DDL version serves the old schema
    assert(Scale.readTableAt(spark, tbl, 0L).columns.toSeq ==
      Seq("id", "k", "v"))
    // CDF across the DDL stays union-compatible (pre-DDL rows NULL)
    val ch = Scale.tableChanges(spark, tbl, 0L, 2L)
    assert(ch.columns.toSeq == Seq("id", "k", "v", "flag", "op"))
    assert(ch.where(col("op") === "I" && col("flag") === 7L).count() ==
      1000)
    rm(base.toFile)
  }

  test("optimizeTable packs small files; compact files ride by pointer") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_cow_opt")
    val src = base.resolve("src").toString
    val tbl = base.resolve("tbl").toString
    // 16 tiny fragments + 1 chunky file in one directory
    val df = (1 to 4000).map(i => (i.toLong, i.toLong % 4, s"val_$i"))
      .toDF("id", "k", "v")
    df.where(col("id") <= 400).repartition(16).write.parquet(src)
    df.where(col("id") > 400).coalesce(1)
      .write.mode("append").parquet(src)
    val bigFile = parquets(src).maxBy(_.length()).getName
    val bigLen = parquets(src).map(_.length()).max
    // target sits between the fragments and the chunky file
    val targetMB = (bigLen - 1024).toDouble / (1024 * 1024)
    val stats = Scale.optimizeTable(spark, src, tbl, targetMB)
    assert(stats.filesAfter < stats.filesBefore,
      s"expected a packed layout, got $stats")
    // the chunky file rides by pointer — never rewritten or copied
    val mf = VersionStore.manifest(spark, tbl, 0L)
    assert(mf.exists(f => f.contains("/src/") && f.endsWith(bigFile)),
      "the already-compact file must ride by pointer")
    assert(parquets(s"$tbl/v=0").forall(_.getName.startsWith("opt-")))
    // content is untouched by contract
    val got = Scale.readTable(spark, tbl)
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(got == df.collect()
      .map(r => (r.getLong(0), r.getString(2))).toSet)
    // idempotence: a second OPTIMIZE finds nothing to pack → no-op,
    // the chain head does not advance
    val again = Scale.optimizeTable(spark, src, tbl, targetMB)
    assert(again.filesAfter == again.filesBefore)
    assert(VersionStore.head(spark, tbl).contains(0L),
      "an optimal table must not publish an empty rewrite")
    rm(base.toFile)
  }

  test("CHECK constraints: DDL validates, DML enforces, NULL passes") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_cow_ck")
    val src = base.resolve("src").toString
    val tbl = base.resolve("tbl").toString
    val df = Seq(
      (1L, 0L, Option(5.0)), (2L, 0L, None),
      (3L, 1L, Option(99.0)), (4L, 1L, Option(1.0))
    ).toDF("id", "k", "v")
    df.repartition(2, col("k")).write.parquet(src)
    Scale.deleteWhere(spark, src, tbl, col("id") === 3L) // v=0
    // DDL validation: a constraint the current data violates refuses
    intercept[Scale.ConstraintViolationException] {
      Scale.addConstraint(spark, src, tbl, "v_big", "v > 2.0")
    }
    assert(VersionStore.head(spark, tbl).contains(0L),
      "a refused constraint must publish nothing")
    // NULL passes (SQL CHECK 3VL): id=2's NULL v does not block this
    Scale.addConstraint(spark, src, tbl, "v_pos", "v >= 0.0") // v=1
    // a violating UPDATE is rejected BEFORE publish; chain untouched
    intercept[Scale.ConstraintViolationException] {
      Scale.updateWhere(spark, src, tbl, col("id") === 4L,
        Seq("v" -> lit(-7.0)))
    }
    assert(VersionStore.head(spark, tbl).contains(1L))
    assert(Scale.readTable(spark, tbl)
      .where(col("v") < 0).count() == 0)
    // a valid UPDATE passes and the constraint rides forward
    Scale.updateWhere(spark, src, tbl, col("id") === 4L,
      Seq("v" -> lit(7.0)))                             // v=2
    assert(VersionStore.constraintsOf(spark, tbl, 2L) ==
      Seq("v_pos" -> "v >= 0.0"))
    // a violating MERGE insert is rejected too
    intercept[Scale.ConstraintViolationException] {
      Scale.mergeInto(spark, src, tbl,
        Seq((9L, 0L, Option(-1.0))).toDF("id", "k", "v"), Seq("id"))
    }
    assert(VersionStore.head(spark, tbl).contains(2L))
    rm(base.toFile)
  }

  test("history records the op chain; shallow clone is zero-copy") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_cow_hist")
    val src = base.resolve("src").toString
    val a = base.resolve("a").toString
    val b = base.resolve("b").toString
    val df = (1 to 4000).map(i => (i.toLong, i.toLong % 4, i * 1.0))
      .toDF("id", "k", "v")
    df.repartition(4, col("k")).write.parquet(src)
    Scale.deleteWhere(spark, src, a, col("k") === 2)            // v=0
    Scale.addColumn(spark, src, a, "flag",                      // v=1
      org.apache.spark.sql.types.LongType)
    Scale.updateWhere(spark, src, a, col("k") === 1,            // v=2
      Seq("flag" -> lit(7L)))
    val hist = Scale.history(spark, a)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(hist.toSeq == Seq((0L, "DELETE", ""),
      (1L, "ADD_COLUMN", "flag"), (2L, "UPDATE", "")))
    // shallow clone: v=0 points at A's head files — ZERO data copied
    Scale.cloneTable(spark, a, b)
    assert(parquets(s"$b/v=0").isEmpty,
      "a shallow clone must not copy data files")
    assert(Scale.history(spark, b).collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2))).toSeq ==
      Seq((0L, "CLONE", a)))
    val cloned = Scale.readTable(spark, b)
    assert(cloned.columns.toSeq == Seq("id", "k", "v", "flag"))
    assert(cloned.count() == 3000)
    // divergence: DML on the clone never touches the source chain
    Scale.updateWhere(spark, src, b, col("k") === 0,
      Seq("v" -> lit(-5.0)))
    assert(Scale.readTable(spark, b)
      .where(col("v") === -5.0).count() == 1000)
    assert(Scale.readTable(spark, a)
      .where(col("v") === -5.0).count() == 0,
      "the clone's DML leaked into the source")
    // the clone inherits constraints-by-metadata semantics: its own
    // chain carries A's declared schema forward
    assert(VersionStore.schemaOf(spark, b, 1L).exists(
      _.fieldNames.contains("flag")))
    rm(base.toFile)
  }

  test("rename/drop column are metadata-only; restore rolls back") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_cow_ren")
    val src = base.resolve("src").toString
    val tbl = base.resolve("tbl").toString
    val df = (1 to 4000).map(i => (i.toLong, i.toLong % 4, i * 1.0))
      .toDF("id", "k", "v")
    df.repartition(4, col("k")).write.parquet(src)
    Scale.deleteWhere(spark, src, tbl, col("k") === 2)          // v=0
    Scale.renameColumn(spark, src, tbl, "v", "amount")          // v=1
    assert(parquets(s"$tbl/v=1").isEmpty, "rename copied data")
    val t1 = Scale.readTable(spark, tbl)
    assert(t1.columns.toSeq == Seq("id", "k", "amount"))
    assert(t1.where(col("amount") === 3.0).count() == 1,
      "values must survive the rename by alias coalesce")
    // DML after the rename writes the NEW physical name in just its
    // hit files; the mixed layout keeps reading correctly
    Scale.updateWhere(spark, src, tbl, col("k") === 1,          // v=2
      Seq("amount" -> lit(-1.0)))
    val got = Scale.readTable(spark, tbl)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(got.size == 3000 && got(5L) == -1.0 && got(4L) == 4.0)
    // chained rename composes aliases (amount -> cost sees both)
    Scale.renameColumn(spark, src, tbl, "amount", "cost")       // v=3
    assert(Scale.readTable(spark, tbl)
      .where(col("cost") === -1.0).count() == 1000)
    Scale.dropColumn(spark, src, tbl, "k")                      // v=4
    assert(Scale.readTable(spark, tbl).columns.toSeq ==
      Seq("id", "cost"))
    // a constraint blocks renaming/dropping the column it references
    Scale.addConstraint(spark, src, tbl, "cost_ok",
      "cost >= -1.0")                                           // v=5
    assertThrows[IllegalArgumentException] {
      Scale.renameColumn(spark, src, tbl, "cost", "price")
    }
    assertThrows[IllegalArgumentException] {
      Scale.dropColumn(spark, src, tbl, "cost")
    }
    // resurrection guard: dropped "k"'s bytes still live in pointer
    // files — re-adding (or renaming onto) that name would read them
    // back as the new column's values; both must refuse
    assertThrows[IllegalArgumentException] {
      Scale.addColumn(spark, src, tbl, "k",
        org.apache.spark.sql.types.LongType)
    }
    assertThrows[IllegalArgumentException] {
      Scale.renameColumn(spark, src, tbl, "cost", "k")
    }
    // RESTORE: head rolls back to v=1's state as a NEW version
    Scale.restoreTable(spark, tbl, 1L)                          // v=6
    val r = Scale.readTable(spark, tbl)
    assert(r.columns.toSeq == Seq("id", "k", "amount"))
    assert(r.where(col("amount") === -1.0).count() == 0,
      "restore must serve the pre-update image")
    assert(Scale.history(spark, tbl).collect().map(_.getString(1))
      .toSeq == Seq("DELETE", "RENAME_COLUMN", "UPDATE",
        "RENAME_COLUMN", "DROP_COLUMN", "ADD_CONSTRAINT", "RESTORE"))
    rm(base.toFile)
  }

  test("deleteWhere keeps NULL-predicate rows regardless of file") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_cow_null")
    val src = base.resolve("src").toString
    val dest = base.resolve("del").toString
    // NULL v rows land in BOTH files: one shares a file with TRUE
    // hits (k=1), one does not (k=0). SQL DELETE removes only rows
    // where the predicate IS TRUE — the r9 advice defect dropped
    // NULL rows that happened to share a file with a hit.
    val df = Seq(
      (1L, 0L, Option(5.0)), (2L, 0L, None),
      (3L, 1L, Option(99.0)), (4L, 1L, None), (5L, 1L, Option(1.0))
    ).toDF("id", "k", "v")
    df.repartition(2, col("k")).write.parquet(src)
    val stats = Scale.deleteWhere(spark, src, dest, col("v") > 50.0)
    assert(stats.rowsAfter == 4,
      s"only the v>50 row may be deleted, got $stats")
    val kept = Scale.readTable(spark, dest)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 4L, 5L),
      "NULL-predicate rows must survive in hit AND untouched files")
    rm(base.toFile)
  }

  test("partition manifests: metadata-only drop, pre-pruned DML, tuple upkeep") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_cow_part")
    val src = base.resolve("src").toString
    val tbl = base.resolve("tbl").toString
    // 3 partitions × 2 files each, partition column file-constant
    val df = (1 to 3000).map(i =>
      (i.toLong, s"d${i % 3}", i.toDouble)).toDF("id", "day", "v")
    Seq("d0", "d1", "d2").foreach(d =>
      df.where(col("day") === d).coalesce(2)
        .write.mode("append").parquet(src))
    Scale.registerPartitions(spark, src, tbl, Seq("day"))      // v=0
    val p0 = VersionStore.partitionsOf(spark, tbl, 0L)
    assert(p0.size == 6 && p0.values.forall(_.keySet == Set("day")))
    // metadata-only drop: no parquet appears under the version dir,
    // the dropped partition's files leave the manifest wholesale
    val drop = Scale.deletePartition(spark, tbl, "day", "d1")  // v=1
    assert(drop.filesRewritten == 0 && drop.filesScanned == 0, s"$drop")
    assert(parquets(s"$tbl/v=1").isEmpty,
      "DELETE_PARTITION must write no data file")
    assert(VersionStore.manifest(spark, tbl, 1L).size == 4)
    assert(Scale.readTable(spark, tbl).where(col("day") === "d1")
      .count() == 0)
    assert(drop.rowsAfter == 2000)
    // partition-pruned UPDATE: hit detection scans d2's 2 files only
    val upd = Scale.updateWhere(spark, tbl, tbl,
      "day = 'd2'", Seq("v" -> (col("v") * 10)))               // v=2
    assert(upd.filesScanned == 2 && upd.filesRewritten == 2,
      s"pre-filter must hand hit detection just d2's files: $upd")
    // rewritten files INHERIT their tuple (the UPDATE set `v`, not
    // `day`), so the next partition-targeted DML still pre-prunes
    val p2 = VersionStore.partitionsOf(spark, tbl, 2L)
    assert(p2.size == 4 && p2.values.count(_ ("day") == "d2") == 2,
      s"rewritten d2 files must keep their tuple: $p2")
    // an UPDATE that SETs the partition column invalidates the tuple
    // for the files it rewrites — and only those
    Scale.updateWhere(spark, tbl, tbl, "day = 'd0'",
      Seq("day" -> lit("d9")))                                 // v=3
    val p3 = VersionStore.partitionsOf(spark, tbl, 3L)
    assert(p3.size == 2 && p3.values.forall(_ ("day") == "d2"),
      s"rewrites that change the partition column must drop tuples: $p3")
    // untupled files make the whole-file proof impossible: refuse, by
    // name, instead of silently deleting rows that may not all match
    val err = intercept[IllegalArgumentException] {
      Scale.deletePartition(spark, tbl, "day", "d9")
    }
    assert(err.getMessage.contains("registerPartitions"))
    // re-register re-proves everything; the drop then works
    Scale.registerPartitions(spark, tbl, tbl, Seq("day"))      // v=4
    val drop9 = Scale.deletePartition(spark, tbl, "day", "d9") // v=5
    assert(drop9.filesRewritten == 0)
    val fin = Scale.readTable(spark, tbl)
    assert(fin.count() == 1000 &&
      fin.select("day").distinct().collect().map(_.getString(0))
        .toSet == Set("d2"))
    // content law: d2 rows are the original values × 10
    assert(fin.agg(sum("v")).head().getDouble(0) ==
      df.where(col("day") === "d2").agg(sum(col("v") * 10))
        .head().getDouble(0))
    rm(base.toFile)
  }

  test("chains under paths WITH SPACES: hit detection matches across spellings") {
    import spark.implicits._
    // the r11 review case: manifest entries are DECODED ('/a b/f'),
    // input_file_name() is percent-ENCODED ('/a%20b/f') — normalize
    // must match them, and a rewritten file must re-hit later DML
    val base = java.nio.file.Files.createTempDirectory("graft cow sp ")
    val src = base.resolve("src dir").toString
    val tbl = base.resolve("tbl dir").toString
    val df = (1 to 2000).map(i => (i.toLong, i.toLong % 4, s"v$i"))
      .toDF("id", "k", "v")
    df.repartition(4, col("k")).write.parquet(src)
    val d1 = Scale.deleteWhere(spark, src, tbl, col("k") === 2)
    assert(d1.rowsAfter == 1500 && d1.filesRewritten == 1, s"$d1")
    // UPDATE must re-hit the REWRITTEN (v=0) file through the same
    // space-carrying spellings
    val u = Scale.updateWhere(spark, tbl, tbl, col("k") === 3,
      Seq("v" -> lit("hit")))
    assert(u.filesRewritten >= 1, s"$u")
    val t = Scale.readTable(spark, tbl)
    assert(t.count() == 1500 &&
      t.where(col("v") === "hit").count() == 500)
    // multi-column SET sees the PRE-update row (r11 review): after
    // SET id = id + k, k = id on the k=1 rows, k must hold the
    // ORIGINAL id (≡ 1 mod 4) and id must lead it by exactly the
    // original k — the old sequential fold gave k = id + 1 instead
    Scale.updateWhere(spark, tbl, tbl, col("k") === 1,
      Seq("id" -> (col("id") + col("k")), "k" -> col("id")))
    val sw = Scale.readTable(spark, tbl).where(pmod(col("k"), lit(4)) === 1)
    assert(sw.count() == 500 &&
      sw.where(col("id") =!= col("k") + 1).count() == 0,
      "SET right-hand sides must evaluate against the pre-update row")
    rm(base.toFile)
  }

  test("partition-aware OPTIMIZE: packed outputs inherit tuples, DROP still metadata-only") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_cow_popt")
    val src = base.resolve("src").toString
    val tbl = base.resolve("tbl").toString
    // 2 partitions × 6 tiny files each
    val df = (1 to 1200).map(i =>
      (i.toLong, s"d${i % 2}", i.toDouble)).toDF("id", "day", "v")
    Seq("d0", "d1").foreach(d =>
      df.where(col("day") === d).repartition(6)
        .write.mode("append").parquet(src))
    Scale.registerPartitions(spark, src, tbl, Seq("day"))       // v=0
    val st = Scale.optimizeTable(spark, src, tbl, 64.0)         // v=1
    assert(st.filesAfter < st.filesBefore, s"no packing: $st")
    // every packed file carries its group's tuple — bins never cross
    // partition boundaries
    val p1 = VersionStore.partitionsOf(spark, tbl, 1L)
    val mf = VersionStore.manifest(spark, tbl, 1L)
    assert(mf.forall(p1.contains),
      s"every post-OPTIMIZE file must stay tupled: ${mf.filterNot(p1.contains)}")
    assert(p1.values.count(_ ("day") == "d0") >= 1 &&
      p1.values.count(_ ("day") == "d1") >= 1)
    // packed files are file-constant on the partition column (the
    // tuple's claim) — verified by a fresh profiling pass
    Scale.registerPartitions(spark, tbl, tbl, Seq("day"))       // v=2
    // the whole point: DROP PARTITION survives compaction
    val drop = Scale.deletePartition(spark, tbl, "day", "d0")   // v=3
    assert(drop.filesRewritten == 0)
    val fin = Scale.readTable(spark, tbl)
    assert(fin.count() == 600 && fin.select("day").distinct()
      .collect().map(_.getString(0)).toSet == Set("d1"))
    rm(base.toFile)
  }
}
