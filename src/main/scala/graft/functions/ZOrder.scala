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

  /** Spread the low 21 bits of `c` to every third bit position (stride-3
    * Morton dilation — the standard mask ladder). 21 bits/dim × 3 dims
    * fills bits 0..62, keeping the long non-negative. */
  private def spread3(c: Column): Column = {
    val m0 = c.bitwiseAND(lit(0x1fffffL))
    val m1 = m0.bitwiseOR(shiftleft(m0, 32)).bitwiseAND(lit(0x1f00000000ffffL))
    val m2 = m1.bitwiseOR(shiftleft(m1, 16)).bitwiseAND(lit(0x1f0000ff0000ffL))
    val m3 = m2.bitwiseOR(shiftleft(m2, 8)).bitwiseAND(lit(0x100f00f00f00f00fL))
    val m4 = m3.bitwiseOR(shiftleft(m3, 4)).bitwiseAND(lit(0x10c30c30c30c30c3L))
    m4.bitwiseOR(shiftleft(m4, 2)).bitwiseAND(lit(0x1249249249249249L))
  }

  /** Spread the low 15 bits of `c` to every fourth bit position (stride-4
    * dilation). 15, not 16: 16-bit dilation would land the 4th dimension's
    * top bit in the sign bit; 15 × 4 fills bits 0..59. */
  private def spread4(c: Column): Column = {
    val m0 = c.bitwiseAND(lit(0x7fffL))
    val m1 = m0.bitwiseOR(shiftleft(m0, 24)).bitwiseAND(lit(0x000000ff000000ffL))
    val m2 = m1.bitwiseOR(shiftleft(m1, 12)).bitwiseAND(lit(0x000f000f000f000fL))
    val m3 = m2.bitwiseOR(shiftleft(m2, 6)).bitwiseAND(lit(0x0303030303030303L))
    m3.bitwiseOR(shiftleft(m3, 3)).bitwiseAND(lit(0x1111111111111111L))
  }

  /** Interleaved 3-D z-address over [0, 2^21)³ — bit i of `a`/`b`/`c`
    * lands at position 3i / 3i+1 / 3i+2. */
  def zorder3(a: Column, b: Column, c: Column): Column =
    spread3(a.cast("long"))
      .bitwiseOR(shiftleft(spread3(b.cast("long")), 1))
      .bitwiseOR(shiftleft(spread3(c.cast("long")), 2))

  /** Interleaved 4-D z-address over [0, 2^15)⁴. */
  def zorder4(a: Column, b: Column, c: Column, d: Column): Column =
    spread4(a.cast("long"))
      .bitwiseOR(shiftleft(spread4(b.cast("long")), 1))
      .bitwiseOR(shiftleft(spread4(c.cast("long")), 2))
      .bitwiseOR(shiftleft(spread4(d.cast("long")), 3))

  /** Buckets per interleaved dimension for [[zorderKey]]: up to 2^20 ≈ 1M
    * cells/dim keeps quantization error irrelevant at any file count
    * while staying far inside zorder2's 31-bit/dim budget; 3- and 4-dim
    * keys shrink to their dilation budget (2^20 fits 3-D's 21 bits;
    * 4-D gets 2^15 = 32k cells/dim — still ≫ any real file count). */
  private val KeyBuckets = 1L << 20

  private def bucketsFor(k: Int): Long =
    math.min(KeyBuckets, 1L << (63 / k))

  /** A column's numeric view for z-scaling (dates as epoch days,
    * timestamps as epoch micros, strings as a truncated binary prefix
    * rank) — or None if the type can't order on a number line.
    *
    * Strings use Delta's approach: the first [[PrefixBytes]] UTF-8 bytes,
    * zero-padded and read as an unsigned big-endian integer. Byte order
    * equals Spark's binary string collation, and right-padding keeps
    * "ab" < "b" ordering under truncation; 6 bytes = 48 bits stays exact
    * in the double the scaler works in. Strings sharing a 6-byte prefix
    * land in one bucket — clustering quality degrades gracefully on
    * low-prefix-entropy domains (long common URL prefixes), exactly like
    * Delta's truncated encoding. Still pure codegen built-ins
    * (cast/rpad/hex/conv). */
  private def numericView(c: Column, dt: org.apache.spark.sql.types.DataType)
      : Option[Column] = dt match {
    case org.apache.spark.sql.types.DateType =>
      Some(datediff(c, lit("1970-01-01").cast("date")).cast("double"))
    case org.apache.spark.sql.types.TimestampType => Some(unix_micros(c).cast("double"))
    case _: org.apache.spark.sql.types.NumericType => Some(c.cast("double"))
    case org.apache.spark.sql.types.StringType =>
      Some(conv(hex(rpad(c.cast("binary"), PrefixBytes, Array[Byte](0))),
        16, 10).cast("double"))
    case _ => None
  }

  /** String-dimension prefix width: 48 bits — the widest that stays
    * exactly representable in the scaler's double arithmetic. */
  private val PrefixBytes = 6

  /** The materialized z-order clustering key for `df` over 2–4
    * NUMERIC/date/timestamp columns — the `OPTIMIZE ... ZORDER BY (a, b
    * [, c [, d]])` write-time sort key. Each dimension is equi-width-
    * scaled into [0, bucketsFor(k)) from its ACTUAL min/max (one
    * column-pruned aggregate pass over `df` — a rounding error next to
    * the full rewrite that follows), then bit-interleaved by
    * [[zorder2]]/[[zorder3]]/[[zorder4]] (bits per dim = 63/k, so the
    * key always sorts non-negative); nulls scale to bucket 0 (sort
    * first, Spark's null ordering). Constant or all-null dimensions
    * collapse to 0 — the key degrades to a lower-dimensional walk on
    * the others. */
  def zorderKey(df: org.apache.spark.sql.DataFrame, cols: Seq[String]): Column = {
    require(cols.length >= 2 && cols.length <= 4,
      s"z-order interleaving takes 2 to 4 columns, got $cols")
    val k = cols.length
    val buckets = bucketsFor(k)
    val views = cols.map { name =>
      // case-insensitive resolution, matching what col() gives cluster_by
      val f = df.schema.fields.find(_.name.equalsIgnoreCase(name))
        .getOrElse(throw new IllegalArgumentException(
          s"z-order column '$name' not found in ${df.schema.fieldNames.mkString(", ")}"))
      numericView(col(f.name), f.dataType).getOrElse(throw new IllegalArgumentException(
        s"z-order column '$name' must be numeric, date, timestamp, or string; " +
          s"is ${f.dataType.simpleString}"))
    }
    val boundAggs = views.zipWithIndex.flatMap { case (v, i) =>
      Seq(min(v).as(s"mn$i"), max(v).as(s"mx$i")) }
    val bounds = df.agg(boundAggs.head, boundAggs.tail: _*).head()
    def scaled(v: Column, i: Int): Column = {
      if (bounds.isNullAt(2 * i)) return lit(0L) // all-null dimension
      val (mn, mx) = (bounds.getDouble(2 * i), bounds.getDouble(2 * i + 1))
      if (mx <= mn) lit(0L)
      // the null arm must come FIRST: least() IGNORES nulls (it returns
      // the least non-null operand), so a null value fed through the
      // clamp would silently scale to the MAX bucket, not 0
      else when(v.isNull, lit(0L)).otherwise(
        least(lit(buckets - 1),
          floor((v - mn) / (mx - mn) * buckets).cast("long")))
    }
    val s = views.zipWithIndex.map { case (v, i) => scaled(v, i) }
    k match {
      case 2 => zorder2(s(0), s(1))
      case 3 => zorder3(s(0), s(1), s(2))
      case _ => zorder4(s(0), s(1), s(2), s(3))
    }
  }
}
