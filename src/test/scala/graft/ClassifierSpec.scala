package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.Classifier

/** Gates for the trained classifier (#64e) — the three properties that
  * make a distributed trainer auditable:
  * 1. partitioning invariance (the Q20 integer-gradient design claim),
  * 2. bit-equality to an independent driver-local reference trainer,
  * 3. it actually learns (accuracy on the seed-lexicon demo label). */
class ClassifierSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dim = 256
  private def label =
    expr(s"arrays_overlap(${graft.dedup.Dedup.toksExpr}, " +
      "array('join', 'shuffle', 'broadcast'))")
  private def docs = graft.tables.Tables(spark, "/root/testdata/sf0.001")
    .documents

  test("training is bit-identical under different partitionings (#64e)") {
    val f = Classifier.featurize(docs, label, col("lang"), dim)
    val w2 = Classifier.train(f.repartition(2), dim, iters = 5)
    val w9 = Classifier.train(f.repartition(9), dim, iters = 5)
    assert(w2.toSeq == w9.toSeq) // exact, not approximate
  }

  test("cluster trainer == driver-local reference, bit for bit (#64e)") {
    val f = Classifier.featurize(docs, label, col("lang"), dim)
    val wCluster = Classifier.train(f, dim, iters = 5)

    // independent reference: same quantized recurrence in plain Scala
    val rows = f.select("y", "bs").collect()
      .map(r => (r.getDouble(0), r.getSeq[Int](1).toArray))
    val q = 1L << 20
    val lr = 1.0
    val w = Array.fill(dim + 1)(0.0)
    for (_ <- 1 to 5) {
      val g = Array.fill(dim + 1)(0L)
      rows.foreach { case (y, bs) =>
        var m = 0.0
        bs.foreach(b => m += w(b))
        val e = 1.0 / (1.0 + math.exp(-m)) - y
        // Spark's round(): BigDecimal.valueOf + HALF_UP
        val eq = java.math.BigDecimal.valueOf(e * q)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
        bs.foreach(b => g(b) += eq)
      }
      var b = 0
      while (b < dim + 1) {
        w(b) -= lr * (g(b).toDouble / q) / rows.length
        b += 1
      }
    }
    assert(wCluster.toSeq == w.toSeq)
  }

  test("seed-lexicon demo label is learned (accuracy >= 0.97) (#64e)") {
    val sums = graft.ops.Queries.qClassifier(spark, "/root/testdata/sf0.001")
      .agg(sum("n_docs"), sum("n_correct"), sum("n_pred_pos")).head
    val n = sums.getLong(0)
    val acc = sums.getLong(1).toDouble / n
    // both classes present, and the majority-class baseline is beaten
    val pos = sums.getLong(2)
    assert(pos > 0 && pos < n, s"degenerate predictions: $pos of $n")
    assert(acc >= 0.97, s"train accuracy $acc")
  }

  test("held-out docs (outside the trainCap sample) generalize (#64e)") {
    // cap the training sample below the corpus so a real held-out
    // slice exists; the model must generalize, not memorize
    val r = graft.ml.Classifier.trainAndSummarize(
        docs, label, col("lang"), trainCap = 256)
      .agg(sum("n_docs"), sum("n_train"), sum("n_holdout_correct")).head
    val held = r.getLong(0) - r.getLong(1)
    assert(held > 100, s"expected a real held-out slice, got $held")
    val acc = r.getLong(2).toDouble / held
    assert(acc >= 0.9, s"held-out accuracy $acc over $held docs")
  }
}
