package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Channel, Sink, Source}
import graft.mm.Multimodal
import graft.streaming.Streams

/** Remaining §2 line items checked only at the API surface: text
  * source/console sink (#23), stop (#13), contramap (#25), divide/choose
  * (#26/#27), multimodal plumbing (#67), file-source streaming (#68). */
class MiscSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("timezone conversion: DST spring-forward boundary (#53n)") {
    // q_timezone's graded gate pins FIXED offsets (tz-db-proof); the
    // NAMED-zone behavior is pinned here where no cross-engine tz-db
    // agreement is needed. America/Los_Angeles springs forward at
    // 2026-03-08 02:00 PST → 03:00 PDT (10:00 UTC).
    import spark.implicits._
    val rows = Seq("2026-03-08 09:30:00", "2026-03-08 10:30:00")
      .toDF("u").select(to_timestamp(col("u")).as("ts"))
      .select(date_format(
        from_utc_timestamp(col("ts"), "America/Los_Angeles"),
        "yyyy-MM-dd HH:mm").as("la"))
      .collect().map(_.getString(0)).toSeq
    // 09:30 UTC is still PST (-8) → 01:30; 10:30 UTC is PDT (-7) →
    // 03:30 — the 02:xx wall hour never exists on this day
    assert(rows == Seq("2026-03-08 01:30", "2026-03-08 03:30"), rows)
  }

  test("text source reads lines; ignore sink executes the plan (#23/#13)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_txt")
    java.nio.file.Files.writeString(dir.resolve("a.txt"), "l1\nl2\nl3\n")
    val src = Source.text(spark, dir.toString)
    assert(src.ds.count() == 3)
    src.into(Sink.ignore) // stop: consume fully, discard
  }

  test("contramap pre-transforms before the sink consumes (#25)") {
    import spark.implicits._
    val buf = scala.collection.mutable.ArrayBuffer[Row]()
    val snk = Sink.collect(buf).contramap[Row](
      ds => ds.toDF().select((col("x") * 2).as("x")))
    Source(Seq(1, 2, 3).toDF("x")).into(snk)
    assert(buf.map(_.getInt(0)).sorted == Seq(2, 4, 6))
  }

  test("choose routes rows to exactly one sink each (#26/#27)") {
    import spark.implicits._
    val l = scala.collection.mutable.ArrayBuffer[Row]()
    val r = scala.collection.mutable.ArrayBuffer[Row]()
    Sink.choose(col("x") % 2 === 0, Sink.collect(l), Sink.collect(r))
      .run(Seq(1, 2, 3, 4, 5).toDF("x"))
    assert(l.map(_.getInt(0)).sorted == Seq(2, 4))
    assert(r.map(_.getInt(0)).sorted == Seq(1, 3, 5))
  }

  test("csv and json sinks roundtrip through their sources (#24)") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s")
    val base = java.nio.file.Files.createTempDirectory("graft_fmt")
    Source(df).into(Sink.csv(base.resolve("c").toString))
    Source(df).into(Sink.json(base.resolve("j").toString))
    val c = Source.csv(spark, base.resolve("c").toString)
      .toDF.orderBy("id").collect().map(r => (r.getInt(0), r.getString(1)))
    val j = Source.json(spark, base.resolve("j").toString)
      .toDF.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(c.toSeq == Seq((1, "a"), (2, "b"), (3, "c")))
    assert(j.toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("orc sink roundtrips and its scan pushes filters like parquet (#24)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s")
    val base = java.nio.file.Files.createTempDirectory("graft_orc")
    Source(df).into(Sink.orc(base.resolve("o").toString))
    val back = Source.orc(spark, base.resolve("o").toString)
    assert(back.toDF.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
      == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // the columnar-scan story carries over: predicate reaches the scan
    val plan = back.where(col("id") > 1).toDF
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,1)]"),
      s"orc scan did not push the filter:\n$plan")
  }

  test("scrubText masks urls and emails, collapses whitespace (#66c)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      "see https://ex.com/a?b=1 and  mail bob@ex.co.uk  now",
      "no links here",
      "edge http://x.y@z.io trailing").toDF("text")
    val got = df.select(graft.text.TextFunctions.scrubText(col("text")))
      .as[String].collect().toSeq
    assert(got == Seq(
      "see <URL> and mail <EMAIL> now",
      "no links here",
      "edge <URL> trailing")) // @ inside a URL is masked as URL, not email
  }

  test("mm pipeline: pack → features → knn is deterministic (#67b)") {
    val dir = "/root/testdata/sf0.001"
    val a = graft.ops.Queries.qMmPipeline(spark, dir).collect()
    val b = graft.ops.Queries.qMmPipeline(spark, dir).collect()
    assert(a.length == 15) // 5 queries × top-3
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.forall(r => r.getDouble(3) >= -1.0 && r.getDouble(3) <= 1.0 + 1e-9))
  }

  test("multimodal: text pack → describe/frames byte plumbing (#67)") {
    import spark.implicits._
    val docs = Seq((1L, "hello world", "en", "srcA"),
                   (2L, "abcdefghij", "en", "srcB"))
      .toDF("doc_id", "text", "lang", "source")
    val packed = Multimodal.packBinary(docs)
    assert(packed.schema("payload").dataType.typeName == "binary")
    val desc = Multimodal.describe(packed).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(desc == Map(1L -> 11L, 2L -> 10L))
    val frames = Multimodal.sampleFrames(packed, frameBytes = 4, stride = 2)
      .collect()
    // doc 1: 11 bytes → frames 0,1,2 → stride 2 keeps 0,2
    assert(frames.count(_.getLong(0) == 1L) == 2)
  }

  test("dhash: identical content hashes equal; different content differs (#67f)") {
    import spark.implicits._
    // 35893 = 13·11·251, so doc 35893 has the same (w, h, seed) triple
    // as doc 0 — a true perceptual duplicate across different doc_ids
    val docs = Seq(0L, 35893L, 7L).toDF("doc_id")
    val h = Multimodal.dhashImage(Multimodal.packImage(docs))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(h(0L) == h(35893L), "perceptual duplicates must collide")
    assert(h(0L) != h(7L), "different content should not collide")
  }

  test("multimodal: real PNG codec roundtrip decodes exactly (#67)") {
    import spark.implicits._
    val docs = Seq(0L, 7L, 123L, 250L, 251L).toDF("doc_id")
    val packed = Multimodal.packImage(docs)
    // the payloads are genuine PNGs (magic bytes)
    val magic = Array(0x89, 'P', 'N', 'G').map(_.toByte)
    assert(packed.select("payload").collect()
      .forall(_.getAs[Array[Byte]](0).take(4).sameElements(magic)))
    // decoded stats equal an independent evaluation of the pixel formula
    val got = Multimodal.decodeImage(packed).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    for (id <- Seq(0L, 7L, 123L, 250L, 251L)) {
      val (w, h, d) = (Multimodal.imgW(id), Multimodal.imgH(id),
        Multimodal.imgSeed(id))
      var (sr, sg, sb) = (0L, 0L, 0L)
      for (x <- 0 until w; y <- 0 until h) {
        val rgb = Multimodal.pixel(d, x, y)
        sr += rgb._1; sg += rgb._2; sb += rgb._3
      }
      val want = (w.toLong, h.toLong, sr, sg, sb)
      assert(got(id) == want, s"doc $id")
    }
    // features: decoded-luminance histogram, L1-normalized
    val feats = Multimodal.imageFeatures(packed, dim = 8).collect()
    assert(feats.forall(_.getSeq[Float](1).size == 8))
    assert(feats.forall(r => math.abs(r.getSeq[Float](1).sum - 1f) < 1e-5))
    // thumbnail: re-encoded PNG whose decoded dims fit the bound
    val thumbs = Multimodal.decodeImage(
      Multimodal.thumbnail(packed, maxDim = 8)).collect()
    assert(thumbs.forall(r => r.getLong(1) <= 8 && r.getLong(2) <= 8
      && r.getLong(1) >= 1 && r.getLong(2) >= 1))
  }

  test("video: PNG-frame container slices and decodes exactly (#67e)") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 2L, 3L, 123L, 250L)
    val packed = Multimodal.packVideo(ids.toDF("doc_id"))
    // every frame slice is itself a well-formed PNG (magic at offset 0)
    val magic = Array(0x89, 'P', 'N', 'G').map(_.toByte)
    assert(packed.select("payload").collect()
      .forall(_.getAs[Array[Byte]](0).take(4).sameElements(magic)))
    // stride=1 sums every frame: equals the closed form over ALL frames
    val all = Multimodal.decodeVideo(packed, stride = 1).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    for (id <- ids) {
      val nf = Multimodal.vidFrames(id)
      val (w, h) = (Multimodal.imgW(id), Multimodal.imgH(id))
      var (sr, sg, sb) = (0L, 0L, 0L)
      for (f <- 0 until nf; x <- 0 until w; y <- 0 until h) {
        val rgb = Multimodal.pixel(Multimodal.frameSeed(id, f), x, y)
        sr += rgb._1; sg += rgb._2; sb += rgb._3
      }
      assert(all(id) == (nf.toLong, nf.toLong, sr, sg, sb), s"doc $id")
    }
    // a stride past the frame count still decodes frame 0
    val sparse = Multimodal.decodeVideo(packed, stride = 100).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(ids.forall(sparse(_) == 1L))
  }

  test("audio: WAV round trip recovers closed-form PCM exactly (#67c)") {
    import spark.implicits._
    val docs = Seq(3L, 41L, 1000L).toDF("doc_id")
    val got = Multimodal.decodeAudio(Multimodal.packAudio(docs))
      .orderBy("doc_id").collect()
    got.foreach { r =>
      val id = r.getLong(0)
      val (n, d) = (Multimodal.wavN(id), Multimodal.wavSeed(id))
      val xs = (0 until n).map(Multimodal.sample(d, _))
      assert(r.getLong(1) == 8000L && r.getLong(2) == 1L)
      assert(r.getLong(3) == n.toLong)
      assert(r.getLong(4) == xs.map(_.toLong).sum)
      assert(r.getLong(5) == xs.map(x => x.toLong * x).sum)
      assert(r.getLong(6) == xs.map(x => math.abs(x.toLong)).max)
    }
    // energy-band features: deterministic, L1-normalized, right arity
    val f1 = Multimodal.audioFeatures(Multimodal.packAudio(docs), dim = 16)
      .orderBy("doc_id").collect().map(_.getSeq[Float](1))
    val f2 = Multimodal.audioFeatures(Multimodal.packAudio(docs), dim = 16)
      .orderBy("doc_id").collect().map(_.getSeq[Float](1))
    assert(f1.map(_.toSeq).toSeq == f2.map(_.toSeq).toSeq)
    assert(f1.forall(v => v.length == 16 && math.abs(v.sum - 1f) < 1e-3))
  }

  test("asofJoin: inclusive ties, atomic payload, outer nulls (#55b)") {
    import spark.implicits._
    val left = Seq((1, 5, "L5"), (1, 10, "L10"), (1, 3, "L3"), (2, 7, "L7"))
      .toDF("k", "t", "tag")
    // right row at t=5 has a NULL in one payload column: per-column
    // last(ignoreNulls) would stitch v1 from t=5 with v2 from t=2 —
    // the struct payload must keep the matched row atomic
    val right = Seq((1, 2, Some("a"), Some("x")), (1, 5, Some("b"), None),
      (3, 1, Some("z"), Some("z"))).toDF("k", "t", "v1", "v2")
    val out = graft.ops.Relational.asofJoin(left, right, Seq("k"), "t")
      .orderBy("k", "t").collect()
    // t=3 → right t=2; t=5 → right t=5 (equality inclusive, v2 null
    // stays null); t=10 → right t=5; k=2 → no match, all nulls
    assert(out.map(r => (r.getInt(0), r.getInt(1),
      Option(r.get(3)), Option(r.get(4)), Option(r.get(5)))).toSeq == Seq(
      (1, 3, Some(2), Some("a"), Some("x")),
      (1, 5, Some(5), Some("b"), None),
      (1, 10, Some(5), Some("b"), None),
      (2, 7, None, None, None)))
    // right-side ties on (k, t) resolve deterministically (max by
    // payload struct), not by partition order
    val tied = Seq((1, 5, "p"), (1, 5, "q")).toDF("k", "t", "v")
      .repartition(4)
    val got = (1 to 3).map { _ =>
      graft.ops.Relational.asofJoin(
          Seq((1, 9)).toDF("k", "t"), tied, Seq("k"), "t")
        .collect().map(r => (r.get(2), r.get(3))).toSeq
    }
    assert(got.distinct == Seq(Seq((5, "q"))))
  }

  test("file-source streaming replay equals batch on real events (#68)") {
    val dir = "/root/testdata/sf0.001"
    val stream = Streams.hourlyRollup(Streams.eventsStream(spark, dir))
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("replay_out").start()
    q.processAllAvailable()
    val streamed = spark.table("replay_out")
      .orderBy("hour", "event_type").collect().map(_.toSeq).toSeq
    q.stop()
    val batch = Streams.hourlyRollup(
        graft.tables.Tables(spark, dir).events)
      .orderBy("hour", "event_type").collect().map(_.toSeq).toSeq
    assert(streamed == batch && streamed.nonEmpty)
  }
}
