package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Channel, Fold, Source}
import graft.dedup.Dedup

/** Property-based laws for the combinator surface — the reference's
  * algebraic structure (list-transformer Source, fold algebra) should
  * hold for arbitrary inputs, not just the fixtures. */
class PropertySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def check(name: String, p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), p)
    assert(res.passed, s"$name: $res")
  }

  test("take(n) ++ drop(n) partitions the ordered stream") {
    import spark.implicits._
    check("take++drop", Prop.forAll { (xs0: List[Int], n0: Byte) =>
      val xs = xs0.distinct
      xs.isEmpty || {
        val n = math.abs(n0 % 5)
        val src = Source(xs.toDF("x"))
        val taken = src.take(n, col("x")).toDF.as[Int].collect().toList
        val dropped = src.drop(n, col("x")).toDF.as[Int].collect().toList
        taken ++ dropped == xs.sorted
      }
    })
  }

  test("concat preserves multiset union; merge preserves both streams") {
    import spark.implicits._
    check("concat/merge", Prop.forAll { (a0: List[Int], b0: List[Int]) =>
      val (a, b) = (a0.distinct, b0.distinct)
      a.isEmpty || b.isEmpty || {
        val sa = Source(a.toDF("x")); val sb = Source(b.toDF("x"))
        val cat = sa.concat(sb).ds.collect().map(_.getInt(0)).toList
        val merged = sa.merge(sb, Seq(col("x"))).toDF
          .select("x").as[Int].collect().toList
        cat.sorted == (a ++ b).sorted && merged.sorted == (a ++ b).sorted
      }
    })
  }

  test("Source.empty is the Monoid/Alternative identity of concat") {
    import spark.implicits._
    check("empty-identity", Prop.forAll { (a0: List[Int]) =>
      val a = a0.distinct
      val sa = Source(a.toDF("x"))
      val e = Source.empty[Int](spark).select(col("value").as("x"))
      val left = e.concat(sa).ds.collect().map(_.getInt(0)).toList
      val right = sa.concat(e).ds.collect().map(_.getInt(0)).toList
      left.sorted == a.sorted && right.sorted == a.sorted &&
        e.ds.isEmpty
    })
  }

  test("Channel.second coincides with first under the named-column swap") {
    import spark.implicits._
    val df = Seq((1, 10L), (2, 20L), (3, 30L)).toDF("a", "b")
    val f = Map("b" -> (col("b") * 2))
    val viaFirst = Channel.first(f).run(df).collect().toSeq
    val viaSecond = Channel.second(f).run(df).collect().toSeq
    assert(viaFirst == viaSecond)
    // and it really transforms only the named component
    assert(Channel.second(f).run(df).select("a").as[Int].collect().toSeq
      == Seq(1, 2, 3))
    assert(Channel.second(f).run(df).select("b").as[Long].collect().toSeq
      == Seq(20L, 40L, 60L))
  }

  test("Fold.decimalSum is partitioning-invariant and resumable-additive") {
    import spark.implicits._
    check("fold", Prop.forAll { (xs: List[Int], split0: Byte) =>
      xs.isEmpty || {
        val split = math.abs(split0 % (xs.size + 1))
        val dec = xs.map(i => new java.math.BigDecimal(i))
        val (l, r) = dec.splitAt(split)
        val f = Fold.decimalSum[java.math.BigDecimal](identity)
        val whole = f.run(spark.createDataset(dec).repartition(3))
        val (_, resumed) = f.runResumable(spark.createDataset(l))
        val twoStep = resumed.run(spark.createDataset(r))
        whole.compareTo(twoStep) == 0 && whole.intValue == xs.sum
      }
    })
  }

  test("Source Num lift is liftA2: pairwise sums, commutative as multiset") {
    import spark.implicits._
    check("numLift", Prop.forAll { (a0: List[Int], b0: List[Int]) =>
      // bounded: ANSI mode (correctly) raises on integer overflow, and
      // the law is about pairing, not 32-bit wraparound
      val a = a0.take(6).map(_ % 100000)
      val b = b0.take(6).map(_ % 100000)
      a.isEmpty || b.isEmpty || {
        val sa = Source(a.toDF("x")); val sb = Source(b.toDF("y"))
        val ab = (sa + sb).toDF.as[Int].collect().toList.sorted
        val ba = (sb + sa).toDF.as[Int].collect().toList.sorted
        val expect = (for (x <- a; y <- b) yield x + y).sorted
        ab == expect && ba == expect
      }
    })
  }

  test("Source Num unary members: abs/signum/negate laws, fromInteger") {
    import spark.implicits._
    check("numUnary", Prop.forAll { (a0: List[Int]) =>
      val a = a0.take(8).map(_ % 100000)
      a.isEmpty || {
        val sa = Source(a.toDF("x"))
        // abs s * signum s == s  (the defining Num law), pointwise here
        // because both sides derive from the same single stream
        val absV = sa.absA.toDF.as[Int].collect().toList
        val sgnV = sa.signumA.toDF.as[Double].collect().toList
        val neg2 = sa.negateA.negateA.toDF.as[Int].collect().toList
        absV.zip(sgnV).map { case (av, sv) => (av * sv).toInt } == a &&
          neg2 == a && absV == a.map(math.abs) &&
          sgnV == a.map(x => math.signum(x.toDouble))
      }
    })
    // fromInteger: the literal as a one-element stream; s + fromInteger(k)
    // shifts every element through the applicative lift
    val s = Source(Seq(1L, 2L, 3L).toDF("x"))
    val shifted = (s + Source.fromInteger(spark, 10L))
      .toDF.as[Long].collect().toList.sorted
    assert(shifted == List(11L, 12L, 13L))
  }

  test("StatePump comonad: duplicate checkpoints, sendAll is monoidal") {
    import graft.core.StatePump
    check("pump", Prop.forAll { (xs: List[Int], ys: List[Int]) =>
      val p = StatePump.lfold[Int, Int, Int](0)(_ + _)(s => s)
      // extract . duplicate == id (the checkpoint is the pump itself)
      val mid = p.sendAll(xs)
      val branch = mid.duplicate.extract
      // a branch and the original diverge independently from the checkpoint
      branch.sendAll(ys).extract == xs.sum + ys.sum &&
        mid.extract == xs.sum &&
        p.sendAll(xs ++ ys).extract == p.sendAll(xs).sendAll(ys).extract
    })
  }

  test("BPE laws on random corpora: replay==greedy encode, argmax first") {
    import org.scalacheck.Gen
    import graft.text.Bpe
    val word = Gen.chooseNum(1, 7)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')))
      .map(_.mkString)
    val corpus = Gen.chooseNum(1, 12).flatMap(Gen.listOfN(_, word))
    // non-overlapping left-to-right replay of one merge — the paper's
    // definition, written independently of Bpe.scala
    def rep(syms: List[String], a: String, b: String): List[String] =
      syms match {
        case x :: y :: rest if x == a && y == b => (a + b) :: rep(rest, a, b)
        case x :: rest => x :: rep(rest, a, b)
        case Nil => Nil
      }
    check("bpe-laws", Prop.forAll(corpus) { words =>
      val wf = words.groupBy(identity).view
        .mapValues(_.size.toLong).toMap
      val merges = Bpe.trainInMemory(wf.iterator, numMerges = 10)
      val again = Bpe.trainInMemory(wf.iterator, numMerges = 10)
      val rankOf = merges.map(m => (m.left, m.right) -> m.rank).toMap
      // greedy lowest-rank-first encode == rank-order replay, per word
      val replayAgrees = words.distinct.forall { w =>
        var syms = w.toList.map(_.toString)
        merges.foreach(m => syms = rep(syms, m.left, m.right))
        Bpe.encodeWord(w, rankOf).toList == syms
      }
      // the first merge is THE argmax pair of the char-level table
      // under the (-freq, left, right) order, when any merge happened
      val argmaxOk = merges.headOption.forall { m =>
        val counts = collection.mutable
          .Map.empty[(String, String), Long]
        for ((w, f) <- wf; Seq(x, y) <- w.map(_.toString).sliding(2))
          counts((x, y)) = counts.getOrElse((x, y), 0L) + f
        val best = counts.minBy { case ((a, b), n) => (-n, a, b) }
        (m.left, m.right) == best._1 && m.pairFreq == best._2
      }
      merges == again && replayAgrees && argmaxOk &&
        merges.forall(_.pairFreq >= 2L)
    })
  }

  test("chunking: exact spans on every edge size (1, W-1, W, W+1, kS, kS+1)") {
    import spark.implicits._
    // the boundary sizes where an off-by-one in the start formula or
    // slice arithmetic would bite; independent Scala recomputation
    val sizes = Seq(1, 10, 39, 40, 41, 60, 61, 70, 71, 100, 130, 131)
    val docs = sizes.zipWithIndex
      .map { case (n, i) => (i.toLong, (1 to n).map(k => s"t$k").mkString(" ")) }
      .toDF("doc_id", "text")
    val got = graft.ops.Queries.chunkTokens(docs)
      .select("doc_id", "chunk_id", "n_tok").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = sizes.zipWithIndex.flatMap { case (n, i) =>
      val nst = (math.max(n - 40, 0) + 29) / 30 + 1
      (0 until nst).map { c =>
        (i.toLong, c.toLong, math.min(40, n - c * 30).toLong) }
    }.toSet
    assert(got == want)
  }

  test("packing: boundary counts match a driver-side simulation (random)") {
    import spark.implicits._
    // replicate the seeded md5 order in plain JVM code and simulate the
    // concat-and-chunk packing — the Spark window cumsum must agree on
    // every aggregate, not just the obvious ceil/pad identities
    def rk(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"p#$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    check("pack", Prop.forAll { (ns0: List[Int]) =>
      val ns = ns0.map(n => math.abs(n % 120) + 1).take(25)
      ns.isEmpty || {
        val docs = ns.zipWithIndex.map { case (n, i) =>
          (i.toLong, if (i % 2 == 0) "aa" else "bb",
            (1 to n).map(k => s"w$k").mkString(" ")) }
        val got = graft.ops.Queries.packStats(
            docs.toDF("doc_id", "lang", "text"))
          .collect().map(r => r.getString(0) ->
            (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
             r.getLong(5))).toMap
        val want = docs.groupBy(_._2).map { case (lang, ds) =>
          val ordered = ds.sortBy(d => (rk(d._1), d._1))
          var end = 0L; var straddle = 0L
          ordered.foreach { d =>
            val n = d._3.split(" ").length.toLong
            val start = end; end += n
            if (start / 512 != (end - 1) / 512) straddle += 1
          }
          val seqs = (end + 511) / 512
          lang -> (ds.size.toLong, end, seqs, straddle, seqs * 512 - end)
        }
        got == want
      }
    })
  }

  test("FFD packing: matches driver simulation; waste <= next-fit (random)") {
    import spark.implicits._
    // driver-side FFD replay + the ordering claims behind q_pack_bestfit:
    // bins respect the cap, every in-range doc packs exactly once, the
    // bin count can't beat the volume lower bound, and first-fit over
    // the decreasing order never wastes more than next-fit (closing
    // bins early can only lose capacity)
    check("ffd", Prop.forAll { (ns0: List[Int]) =>
      val ns = ns0.map(n => math.abs(n % 700) + 1).take(30)
      ns.isEmpty || {
        val docs = ns.zipWithIndex.map { case (n, i) =>
          (i.toLong, if (i % 2 == 0) "aa" else "bb",
            (1 to n).map(k => s"w$k").mkString(" ")) }
        val got = graft.ops.Queries.packBestFitStats(
            docs.toDF("doc_id", "lang", "text"))
          .collect().map(r => r.getString(0) ->
            (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
             r.getLong(5))).toMap
        docs.groupBy(_._2).forall { case (lang, ds) =>
          val sizes = ds.map(d => (d._3.split(" ").length, d._1))
          val in = sizes.filter(_._1 <= 512).sortBy { case (n, id) => (-n, id) }
          val over = sizes.count(_._1 > 512)
          // driver FFD
          val loads = scala.collection.mutable.ArrayBuffer.empty[Int]
          in.foreach { case (n, _) =>
            val i = loads.indexWhere(_ + n <= 512)
            if (i < 0) loads += n else loads(i) += n
          }
          // driver next-fit-decreasing (same order, last bin only)
          var nfBins = 0; var last = 512
          in.foreach { case (n, _) =>
            if (last + n <= 512) last += n else { nfBins += 1; last = n }
          }
          val vol = in.map(_._1.toLong).sum
          if (in.isEmpty) !got.contains(lang) // no packable docs → no row
          else {
            val (gotDocs, gotOver, gotBins, gotTok, gotWaste) =
              got.getOrElse(lang, (0L, 0L, 0L, 0L, 0L))
            val wantWaste = loads.length.toLong * 512 - vol
            loads.forall(_ <= 512) &&
              gotDocs == in.size.toLong && gotOver == over.toLong &&
              gotBins == loads.length.toLong && gotTok == vol &&
              gotWaste == wantWaste &&
              gotBins >= (vol + 511) / 512 &&
              gotWaste <= nfBins.toLong * 512 - vol
          }
        }
      }
    })
  }

  test("segment dedup: per-doc drop counts match recomputation (random)") {
    import spark.implicits._
    // small vocab ("a".."e") forces genuine cross-doc segment clashes;
    // the df>=2 rule is recomputed independently over aligned 10-grams
    check("segdedup", Prop.forAll { (seed0: Int, ns0: List[Int]) =>
      val rnd = new scala.util.Random(seed0)
      val ns = ns0.map(n => math.abs(n % 45) + 1).take(12)
      ns.isEmpty || {
        val docs = ns.zipWithIndex.map { case (n, i) =>
          (i.toLong, (1 to n).map(_ => ('a' + rnd.nextInt(5)).toChar.toString)
            .mkString(" ")) }
        val segsOf = docs.map { case (id, text) =>
          id -> text.split(" ").grouped(10).map(_.mkString(" ")).toSeq }
        val df = segsOf.flatMap { case (id, segs) => segs.distinct.map(_ -> id) }
          .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).distinct.size }
        val want = segsOf.map { case (id, segs) =>
          id -> (segs.count(s => df(s) < 2).toLong,
                 segs.count(s => df(s) >= 2).toLong) }.toMap
        val got = graft.ops.Queries.segmentDedup(docs.toDF("doc_id", "text"))
          .collect().map(r => r.getLong(0) ->
            (r.getLong(1), r.getLong(2))).toMap
        got == want
      }
    })
  }

  test("jaccard is symmetric, bounded, and 1 on equal sets") {
    import spark.implicits._
    check("jaccard", Prop.forAll { (a0: List[String], b0: List[String]) =>
      val a = a0.filter(_.nonEmpty).distinct.take(20)
      val b = b0.filter(_.nonEmpty).distinct.take(20)
      a.isEmpty || b.isEmpty || {
        val df = Seq((a, b)).toDF("a", "b")
        val row = df.select(
          Dedup.jaccard(col("a"), col("b")),
          Dedup.jaccard(col("b"), col("a"))).collect()(0)
        val (jab, jba) = (row.getDouble(0), row.getDouble(1))
        jab == jba && jab >= 0.0 && jab <= 1.0 &&
          (a.toSet != b.toSet || jab == 1.0)
      }
    })
  }

  /** canonicalizeUrl is a TOTAL idempotent function of arbitrary
    * strings — a crawl-dedup key must never throw or oscillate on the
    * garbage a real crawl feeds it. Driver-side on the shared static
    * rule body (the same code both eval paths call), plus the
    * standalone percent-normalization law. */
  test("UrlCanon: total + idempotent on arbitrary strings") {
    check("urlcanon-total", Prop.forAll { (s0: String) =>
      // salt in URL-ish structure so '%', '//', '#', '?' arms all fire
      val s = s0 + "%4a//x#f?a=%zz&utm_x=1"
      val once = graft.functions.UrlCanon.canonical(s)
      val host = graft.functions.UrlCanon.host(s)
      graft.functions.UrlCanon.canonical(once) == once &&
        once.startsWith("https://") && host != null
    })
    check("pct-idempotent", Prop.forAll { (s: String) =>
      val p = graft.functions.UrlCanon.pctNormalize(s)
      graft.functions.UrlCanon.pctNormalize(p) == p
    })
  }

  /** The repo's integer-exact portability discipline (q_rand_proj's
    * Q16 signed projection, q_dsir's Q20 weighted score, q_pagerank's
    * Q=10^6 recurrence) rests on long arithmetic never wrapping. This
    * sweep drives the folds to the overflow boundary and asserts the
    * contract on each side of it: EXACT (BigInt-equal) within the
    * documented headroom, and a RAISE — never a silent wrap — beyond
    * it (Spark 4 ANSI arithmetic, the session default). */
  test("quantized-integer folds: BigInt-exact in headroom, raise past it") {
    import org.apache.spark.sql.Column
    val rnd = new scala.util.Random(7)
    // q_rand_proj's Q16 fold shape: sum_i floor(v_i * 2^16) * s_i
    def foldQ16(vs: Seq[Double], signs: Seq[Long]): Column =
      aggregate(
        zip_with(lit(vs.toArray), lit(signs.toArray),
          (v, sg) => floor(v * lit(65536d)).cast("long") * sg),
        lit(0L), (a, x) => a + x)
    def flat(t: Throwable): String = {
      val sb = new StringBuilder
      var e = t
      while (e != null) { sb ++= e.toString; e = e.getCause }
      sb.toString
    }
    // headroom sweep: components up to ~2^31 — far above any real
    // embedding, still ~2^16 of slack under the 64-term Q16 sum bound
    // (64 * 2^47 = 2^53 << 2^63)
    for (_ <- 1 to 20) {
      val vs = Seq.fill(64)((rnd.nextDouble() - 0.5) * 4e9)
      val signs = Seq.fill(64)(if (rnd.nextBoolean()) 1L else -1L)
      val ref = vs.zip(signs).map { case (v, s) =>
        BigInt(math.floor(v * 65536d).toLong) * s }.sum
      assert(ref.isValidLong)
      val got = spark.range(1).select(foldQ16(vs, signs).as("s"))
        .head.getLong(0)
      assert(got == ref.toLong, s"Q16 fold diverged from BigInt: $got $ref")
    }
    // boundary 1 — the quantizing CAST itself: v*2^16 past Long.Max
    val castBoom = intercept[Throwable] {
      spark.range(1)
        .select(foldQ16(Seq.fill(64)(1.7e14), Seq.fill(64)(1L))).head()
    }
    assert(flat(castBoom).toLowerCase.contains("overflow"),
      s"cast boundary did not raise an overflow: $castBoom")
    // boundary 2 — the SUM: 64 valid 2^58 terms overflow the long add
    val sumBoom = intercept[Throwable] {
      spark.range(1)
        .select(foldQ16(Seq.fill(64)(4.4e12), Seq.fill(64)(1L))).head()
    }
    assert(flat(sumBoom).toLowerCase.contains("overflow"),
      s"sum boundary did not raise an overflow: $sumBoom")
    // q_dsir's Q20 weighted-score shape: sum(c * wq) over buckets
    import spark.implicits._
    val inHead = (1 to 64).map(i =>
      (1L << 21, (1L << 20) + i.toLong)) // c*wq ≈ 2^41, sum ≈ 2^47
    val refD = inHead.map { case (c, w) => BigInt(c) * w }.sum
    val gotD = inHead.toDF("c", "wq")
      .agg(sum(col("c") * col("wq"))).head.getLong(0)
    assert(refD.isValidLong && gotD == refD.toLong)
    val dsirBoom = intercept[Throwable] {
      Seq.fill(4)((1L << 62, 4L)).toDF("c", "wq")
        .agg(sum(col("c") * col("wq"))).head()
    }
    assert(flat(dsirBoom).toLowerCase.contains("overflow"),
      s"Q20 score boundary did not raise: $dsirBoom")
    // q_pagerank's documented magnitude bound on an adversarial STAR
    // graph (the max-skew degree case): every rank stays within
    // [0.15*scale, ~scale*maxdeg] — iterations cannot creep toward the
    // long boundary, the headroom is structural (2^63 / 10^6 ≈ 9e12
    // aggregate degree before the discipline would need revisiting)
    val n = 64
    val star = (1 until n).map(i => (0L, i.toLong)).toDF("doc_a", "doc_b")
    val pr = Dedup.pageRank(star, iters = 8, scale = 1000000L)
    val mx = pr.agg(max("pr")).head.getLong(0)
    val mn = pr.agg(min("pr")).head.getLong(0)
    assert(mn >= 150000L && mx <= 1000000L * n,
      s"pagerank magnitude left the documented band: [$mn, $mx]")
  }
}
