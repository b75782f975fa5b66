package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving as pure codegen'd column arithmetic — the
  * multi-dimension clustering key behind `OPTIMIZE ... ZORDER BY`: sorting
  * by the interleaved key at write time gives parquet row groups narrow
  * min/max ranges in EVERY interleaved dimension at once, so selective
  * filters on ANY of them prune row groups. A linear sort can only do this
  * for its leading column (ClusteringSpec measures both effects).
  *
  * No UDFs: each bit-spread step is shift/or/and on longs, so the whole
  * key stays inside whole-stage codegen and is usable in a write-time
  * `sortWithinPartitions`/`repartitionByRange` at any scale.
  */
object ZOrder {

  /** Spread the low 31 bits of `c` to the even bit positions of a long
    * (classic magic-mask Morton dilation). 31, not 32: with 32-bit
    * dilation the partner dimension's top bit would land in the long's
    * SIGN bit, making half the z-address space sort before the other half
    * and silently destroying clustering. 31+31 bits fill bits 0..61. */
  private def spread(c: Column): Column = {
    val m0 = c.bitwiseAND(lit(0x7fffffffL))
    val m1 = m0.bitwiseOR(shiftleft(m0, 16)).bitwiseAND(lit(0x0000ffff0000ffffL))
    val m2 = m1.bitwiseOR(shiftleft(m1, 8)).bitwiseAND(lit(0x00ff00ff00ff00ffL))
    val m3 = m2.bitwiseOR(shiftleft(m2, 4)).bitwiseAND(lit(0x0f0f0f0f0f0f0f0fL))
    val m4 = m3.bitwiseOR(shiftleft(m3, 2)).bitwiseAND(lit(0x3333333333333333L))
    m4.bitwiseOR(shiftleft(m4, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** Interleaved 2-D z-address of two columns in [0, 2^31) — values
    * outside wrap via masking, so pre-scale real domains (ranks, epoch
    * days, bucket ids) into range first, as ZORDER implementations do.
    * `a` takes the even bits, `b` the odd; the result is always
    * non-negative, so a plain ascending sort is a z-order walk. */
  def zorder2(a: Column, b: Column): Column =
    spread(a.cast("long")).bitwiseOR(shiftleft(spread(b.cast("long")), 1))
}
