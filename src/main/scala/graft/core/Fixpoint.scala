package graft.core

import org.apache.spark.sql.DataFrame

/** Bounded distributed fixpoint — the TOTAL form of the reference's
  * `fix` (Tubes/Core.hs:264, `fix f = f (fix f)` over coroutines).
  * Unbounded coroutine recursion (`diverge`, Core.hs:269) IS
  * divergence and stays deliberately unmapped; the productive use of
  * `fix` — feed a transformation its own output until it stabilizes —
  * is what iterative distributed algorithms (label propagation,
  * closure computation, PageRank-style loops) actually need, and maps
  * cleanly: iterate `step` from `seed` until a caller-supplied
  * convergence measure stops changing.
  *
  * Mechanics, each learned the hard way elsewhere in this repo:
  *  - `localCheckpoint` EVERY iteration: a lazily-stacked lineage of
  *    self-referential steps re-derives the whole chain per iteration
  *    and was measured exponential past ~12 levels (graft.text.Bpe);
  *    truncation is load-bearing. Reliable `checkpoint` on real
  *    clusters with lossy executors.
  *  - `maxIter` RAISES instead of returning the unconverged frame: a
  *    silently truncated fixpoint is a wrong answer, not a slow one.
  *  - The measure must be a pure function of the frame's CONTENT that
  *    provably changes while iteration progresses (e.g. the sum of a
  *    monotonically decreasing label column): measure-equal ⇒ fixed.
  */
object Fixpoint {
  /** `A` is any equality-comparable measure value — Long for small
    * label domains, BigDecimal when labels are wide hashes whose sum
    * overflows a long (q_er_cluster's 60-bit name ids). */
  def iterate[A](seed: DataFrame, maxIter: Int)(
      step: DataFrame => DataFrame)(
      measure: DataFrame => A): DataFrame = {
    var cur = seed.localCheckpoint()
    var m = measure(cur)
    var i = 0
    while (i < maxIter) {
      val next = step(cur).localCheckpoint()
      val m2 = measure(next)
      cur.unpersist()
      cur = next
      if (m2 == m) return cur
      m = m2
      i += 1
    }
    cur.unpersist()
    throw new IllegalStateException(
      s"Fixpoint.iterate: no convergence within $maxIter iterations " +
        "(raise maxIter, or check the measure is fixpoint-faithful)")
  }
}
