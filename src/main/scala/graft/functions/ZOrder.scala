package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering key — the multi-dimensional data-layout
  * primitive: writing files range-partitioned on the interleaved key
  * gives EVERY dimension locality, so per-file min/max statistics prune
  * files for predicates on any dimension — where a 1-D sort key prunes
  * only its own dimension and reads the whole table for the others.
  * This is what `OPTIMIZE ... ZORDER BY` does in lakehouse engines; at
  * 100 TB the layout decides whether a selective 2-D predicate scans
  * gigabytes or the full corpus.
  *
  * Pure integer bit math (shifts, masks, adds) over non-negative
  * inputs, built from codegen'd builtins and reproducible bit-for-bit
  * in any engine — the oracle restates the same 2·bits-term sum in SQL.
  * Inputs are masked to `bits` low bits (caller buckets/quantizes
  * first); the result fits a long for 2·bits ≤ 63.
  */
object ZOrder {
  /** Interleaved key: bit b of `x` lands at position 2b, bit b of `y`
    * at 2b+1. */
  def zval(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val xs = x.cast("long") % (1L << bits)
    val ys = y.cast("long") % (1L << bits)
    (0 until bits).map { b =>
      shiftleft(shiftright(xs, b) % 2, 2 * b) +
        shiftleft(shiftright(ys, b) % 2, 2 * b + 1)
    }.reduce(_ + _)
  }

  /** The identical computation as DuckDB SQL text (for oracle use). */
  def zvalSql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).map { b =>
      s"((($x >> $b) & 1) << ${2 * b}) + ((($y >> $b) & 1) << ${2 * b + 1})"
    }.mkString("(", " + ", ")")
}
