package graft.core

import org.apache.spark.sql.{Dataset, Encoder}

/** Spark-native analogue of the reference's resumable left fold `lfold`
  * (Tubes/Util.hs:160) and the `Pump`-driven `reduce` (Source.hs:158).
  *
  * The reference folds sequentially; at 100 TB a fold must be
  * commutative-associative in its merge, so graft's `Fold` carries an
  * explicit `merge` for the partial states (map-side partials, one
  * driver-side combine — the same contract as Catalyst partial
  * aggregation). Resumability — the reference's headline `lfold` demo
  * (fold [1..10], extract 55, keep folding [11..20] to 210) — comes from
  * `state`: the accumulated value so far, merged in exactly once (never
  * used as a per-partition seed, which would double-count it).
  */
final case class Fold[A, S, B](empty: S, step: (S, A) => S,
                               merge: (S, S) => S, out: S => B,
                               state: Option[S] = None) {

  /** Strict fold of a Dataset: per-partition left folds (the reference's
    * sequential semantics, executor-local), then a driver combine. */
  def run(ds: Dataset[A])(implicit se: Encoder[S]): B = out(total(ds))

  /** Fold and keep folding later: returns the result AND the resumed
    * fold seeded with the accumulated state (Util.hs:160's example). */
  def runResumable(ds: Dataset[A])(implicit se: Encoder[S]): (B, Fold[A, S, B]) = {
    val t = total(ds)
    (out(t), copy(state = Some(t)))
  }

  private def total(ds: Dataset[A])(implicit se: Encoder[S]): S = {
    val partials = ds.mapPartitions { it =>
      if (it.isEmpty) Iterator.empty
      else Iterator.single(it.foldLeft(empty)(step))
    }.collect()
    val combined = partials.foldLeft(empty)(merge)
    state.fold(combined)(s => merge(s, combined))
  }
}

object Fold {
  /** Exact-decimal sum — the workhorse fold (immune to double
    * summation-order drift, so it matches any oracle bit-for-bit). */
  def decimalSum[A](get: A => java.math.BigDecimal): Fold[A, java.math.BigDecimal, java.math.BigDecimal] =
    Fold(java.math.BigDecimal.ZERO, (s, a) => s.add(get(a)), _.add(_), identity)

  def count[A]: Fold[A, Long, Long] = Fold(0L, (s, _) => s + 1, _ + _, identity)
}
