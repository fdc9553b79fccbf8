package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.Bpe

/** BPE trainer gates: the distributed trainer must reproduce an
  * INDEPENDENT in-memory reference implementation merge-for-merge
  * (including tie-breaks), greedy encoding must agree with training's
  * final symbol state, and the learned table must be a deterministic
  * pure function of the corpus. */
class BpeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  // ── independent reference trainer (plain Scala, no Spark) ──────────
  // Sennrich et al. 2016: count adjacent pairs over the distinct-word
  // frequency table, fuse the most frequent (ties: lexicographic on
  // (left,right)), repeat. Written against the PAPER, not against
  // Bpe.scala, so agreement is a real gate.
  private def refPreTokens(text: String): Seq[String] = {
    val re = graft.text.TextFunctions.bpeRe.r
    re.findAllIn(text.toLowerCase).toSeq
  }

  private def refMergeWord(syms: List[String], a: String, b: String)
      : List[String] = syms match {
    case x :: y :: rest if x == a && y == b =>
      (a + b) :: refMergeWord(rest, a, b)
    case x :: rest => x :: refMergeWord(rest, a, b)
    case Nil => Nil
  }

  private def refTrain(corpus: Seq[String], numMerges: Int,
                       minWordFreq: Long = 1L, minPairFreq: Long = 2L)
      : Seq[(String, String, Long)] = {
    var words: Map[List[String], Long] = corpus.flatMap(refPreTokens)
      .groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= minWordFreq)
      .map { case (w, f) => w.toList.map(_.toString) -> f }.toMap
    val out = Seq.newBuilder[(String, String, Long)]
    var r = 0
    var stop = false
    while (r < numMerges && !stop) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- words; p <- syms.zip(syms.tail))
        counts(p) = counts.getOrElse(p, 0L) + f
      if (counts.isEmpty) stop = true
      else {
        val ((a, b), n) = counts.minBy { case ((a, b), n) => (-n, a, b) }
        if (n < minPairFreq) stop = true
        else {
          out += ((a, b, n))
          words = words.groupMapReduce(
            { case (syms, _) => refMergeWord(syms, a, b) })(_._2)(_ + _)
          r += 1
        }
      }
    }
    out.result()
  }

  // Sennrich's running example vocabulary, as raw text
  val tiny = Seq(
    "low low low low low",
    "lower lower",
    "newest newest newest newest newest newest",
    "widest widest widest")

  test("distributed trainer == reference trainer on the closed corpus") {
    import spark.implicits._
    val docs = spark.createDataset(tiny).toDF("text")
    val got = Bpe.train(docs, "text", numMerges = 12, minWordFreq = 1L)
      .map(m => (m.left, m.right, m.pairFreq))
    val want = refTrain(tiny, 12)
    assert(got == want)
    // the canonical first merges for this vocabulary: "es" (9), then
    // "est" (9) — a hand-checkable anchor independent of both impls
    assert(got.take(2) == Seq(("e", "s", 9L), ("es", "t", 9L)))
  }

  test("distributed trainer == reference trainer on real sf0.001 docs") {
    val docs = graft.tables.Tables(spark, sf).documents
    val texts = docs.select("text").collect().map(_.getString(0)).toSeq
    val got = Bpe.train(docs, "text", numMerges = 24, minWordFreq = 2L)
      .map(m => (m.left, m.right, m.pairFreq))
    val want = refTrain(texts, 24, minWordFreq = 2L)
    assert(got == want)
  }

  test("cluster-resident path == driver path (forced past the vocab bound)") {
    import spark.implicits._
    val docs = spark.createDataset(tiny).toDF("text")
    // driverVocabLimit=1 forces the distributed merge loop; the learned
    // table must be identical to the driver-local loop's
    val viaCluster = Bpe.train(docs, "text", numMerges = 12,
      driverVocabLimit = 1)
    val viaDriver = Bpe.train(docs, "text", numMerges = 12)
    assert(viaCluster == viaDriver)
    // and on real documents, where ties and multi-byte text exercise
    // the ordering contract across JVM vs shuffle comparators
    val real = graft.tables.Tables(spark, sf).documents
    val realCluster = Bpe.train(real, "text", numMerges = 16,
      minWordFreq = 2L, driverVocabLimit = 1)
    val realDriver = Bpe.train(real, "text", numMerges = 16,
      minWordFreq = 2L)
    assert(realCluster == realDriver)
  }

  test("greedy encode reproduces training's final symbol state") {
    import spark.implicits._
    val docs = spark.createDataset(tiny).toDF("text")
    val merges = Bpe.train(docs, "text", numMerges = 12)
    val rankOf = merges.map(m => (m.left, m.right) -> m.rank).toMap
    // replay training's merge sequence over the reference word table...
    var words: Set[List[String]] = tiny.flatMap(refPreTokens)
      .map(_.toList.map(_.toString)).toSet
    for (m <- merges)
      words = words.map(refMergeWord(_, m.left, m.right))
    // ...and the greedy encoder must land on the identical segmentation
    val encoded = tiny.flatMap(refPreTokens).toSet[String]
      .map(w => Bpe.encodeWord(w, rankOf).toList)
    assert(encoded == words)
    // round-trip: concatenating subwords recovers each word
    for (w <- tiny.flatMap(refPreTokens))
      assert(Bpe.encodeWord(w, rankOf).mkString == w)
  }

  test("byte fallback: no token outside vocab ∪ bytes; no-op in-alphabet") {
    import spark.implicits._
    val docs = spark.createDataset(tiny).toDF("text")
    val merges = Bpe.train(docs, "text", numMerges = 12)
    val rankOf = merges.map(m => (m.left, m.right) -> m.rank).toMap
    val vocab = Bpe.vocabulary(docs, "text", merges)
    // the law: every emitted token is a vocabulary member, for inputs
    // WELL OUTSIDE the training alphabet (accents, CJK, emoji — multi-
    // byte UTF-8 — plus unseen ASCII)
    val alien = Seq("café", "日本語", "naïve",
      "😀ok", "zzzqqq", "x́")
    for (w <- alien; t <- Bpe.encodeWordFallback(w, rankOf, vocab))
      assert(vocab.contains(t), s"token '$t' of '$w' outside vocabulary")
    // byte round-trip: decoding the byte tokens recovers the input
    def decode(toks: Seq[String]): String = {
      val bytes = toks.flatMap { t =>
        if (t.startsWith("<0x") && t.length == 6)
          Seq(Integer.parseInt(t.substring(3, 5), 16).toByte)
        else t.getBytes(java.nio.charset.StandardCharsets.UTF_8).toSeq
      }
      new String(bytes.toArray, java.nio.charset.StandardCharsets.UTF_8)
    }
    for (w <- alien)
      assert(decode(Bpe.encodeWordFallback(w, rankOf, vocab)) == w)
    // in-alphabet inputs: fallback is a strict no-op vs plain encode
    for (w <- tiny.flatMap(refPreTokens).toSet[String])
      assert(Bpe.encodeWordFallback(w, rankOf, vocab) ==
        Bpe.encodeWord(w, rankOf))
    // plain encode CAN leak out-of-vocab single chars — the gap the
    // fallback exists to close (sanity that the law isn't vacuous)
    assert(Bpe.encodeWord("café", rankOf).exists(!vocab.contains(_)))
  }

  test("q_tokens_bpe is deterministic and well-formed") {
    val a = ops.Queries.qTokensBpe(spark, sf).collect()
    val b = ops.Queries.qTokensBpe(spark, sf).collect()
    assert(a.toSeq == b.toSeq)
    assert(a.nonEmpty)
    // ranks are 0..n-1 in order; pair freqs never increase below... no:
    // pair frequencies need not be monotone (later merges can create
    // new frequent pairs), but every freq >= the minPairFreq cutoff
    assert(a.map(_.getInt(0)).toSeq == a.indices)
    assert(a.forall(_.getLong(3) >= 2L))
    // corpus_tokens: positive, and <= the char-level upper bound
    val docs = graft.tables.Tables(spark, sf).documents
    val chars = docs.agg(sum(length(lower(col("text"))))).head.getLong(0)
    val nTok = a.head.getLong(4)
    assert(nTok > 0 && nTok <= chars)
  }

  test("tokenCount under merges <= pre-token char count, >= pre-token count") {
    import spark.implicits._
    val docs = spark.createDataset(tiny).toDF("text")
    val merges = Bpe.train(docs, "text", numMerges = 6)
    val got = docs.select(Bpe.tokenCount(col("text"), merges).as("n"))
      .as[Long].collect()
    val pre = tiny.map(refPreTokens(_).size.toLong)
    val chars = tiny.map(t => refPreTokens(t).map(_.length).sum.toLong)
    for (((n, lo), hi) <- got.zip(pre).zip(chars)) {
      assert(n >= lo)  // merges can't make fewer tokens than pre-tokens
      assert(n <= hi)  // nor more than character count
    }
  }
}
