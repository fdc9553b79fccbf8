package graft.core

import org.apache.spark.sql.Dataset
import scala.jdk.CollectionConverters._

/** Spark-native analogue of the reference's `Pump` (Tubes/Core.hs:170) —
  * the driver that steps a stream incrementally. In graft the executors
  * stream partitions to the driver lazily (`toLocalIterator`), so `recv`
  * (the reference's `recv`/`unyield`, Core.hs:196 / Util.hs:124) pulls one
  * element without materializing the stream — at most one partition is
  * resident.
  *
  * This is deliberately a driver-side tool (REPL inspection, incremental
  * consumption); distributed folding is `Fold`, not `Pump`.
  */
final class Pump[A] private (it: Iterator[A]) {

  /** `recv` / `unyield`: next element plus the pump's future, or None when
    * the stream is exhausted. */
  def recv(): Option[(A, Pump[A])] =
    if (it.hasNext) Some((it.next(), this)) else None

  /** `stream p tube`-style driver fold (Core.hs:232): consume the rest. */
  def fold[S](zero: S)(stepF: (S, A) => S): S = it.foldLeft(zero)(stepF)
}

object Pump {
  def apply[A](ds: Dataset[A]): Pump[A] =
    new Pump(ds.toLocalIterator().asScala)

  def fromSeq[A](xs: Seq[A]): Pump[A] = new Pump(xs.iterator)
}

/** The reference's `pumpT` (Core.hs:205): a comonadic machine that can
  * always be `send` a value or asked to `recv` one, built from a state
  * and two transitions. `lfold` (Util.hs:160) is the special case with
  * `onRecv = s => (out(s), s)` — see [[StatePump.lfold]]; resumability
  * falls out of the state being a first-class value, exactly like the
  * reference's `duplicate summer` demo. */
final case class StatePump[A, S, B](state: S, onSend: (S, A) => S,
                                    onRecv: S => (B, S)) {
  /** `send` (Core.hs:196): feed a value, get the future pump. */
  def send(a: A): StatePump[A, S, B] = copy(state = onSend(state, a))

  /** `recv` (Core.hs:200): extract a value plus the future pump. */
  def recv(): (B, StatePump[A, S, B]) = {
    val (b, s) = onRecv(state)
    (b, copy(state = s))
  }

  /** Drive with a whole stream (the `stream const p (each xs)` shape). */
  def sendAll(xs: IterableOnce[A]): StatePump[A, S, B] =
    xs.iterator.foldLeft(this)(_.send(_))

  /** Comonad `extract`: the current output without advancing state. */
  def extract: B = onRecv(state)._1

  /** Comonad `duplicate` (Core.hs:170–230): a pump of pumps — its
    * extract at any point is the WHOLE pump frozen at that state, i.e. a
    * checkpoint that can be branched: the reference's `duplicate summer`
    * demo folds half a stream, duplicates, and resumes the two copies
    * independently without re-reading the prefix. The duplicate's recv
    * advances state exactly as the original's does (extract∘duplicate =
    * id AND the dynamics mirror — not only for identity-transition
    * folds). */
  def duplicate: StatePump[A, S, StatePump[A, S, B]] =
    StatePump(state, onSend, s => (copy(state = s), onRecv(s)._2))
}

object StatePump {
  /** `lfold step done init` (Util.hs:160). */
  def lfold[A, S, B](init: S)(step: (S, A) => S)(done: S => B): StatePump[A, S, B] =
    StatePump(init, step, s => (done(s), s))
}
