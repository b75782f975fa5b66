package graft.core

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Commit-time column HISTOGRAMS served to the optimizer from the log —
  * value-distribution estimates without an ANALYZE pass, the second half
  * of the CBO channel [[NdvStats]] opened (distinct counts alone size
  * equality predicates; range predicates and skew need the distribution).
  *
  * Collection: every NUMERIC column declared in `graft.ndv.columns` gets
  * one per-file equi-width grid ([[FileStats.Hist]]: exact non-null counts
  * over [[Buckets]] equal-width buckets spanning the file's own bounds) at
  * commit time — two grouped aggregation passes over the JUST-WRITTEN
  * delta (one for exact per-file bounds, one for the bucket counts), so
  * commit cost stays O(delta) and a file's histogram dies with the file,
  * exactly like the sketches.
  *
  * Serving: scan planning re-bins the PLANNED files' grids (piecewise-
  * uniform within a bucket) into one table-level EQUI-HEIGHT histogram —
  * the form catalyst's FilterEstimation consumes — and ships it through
  * DSv2 `columnStats().histogram()` → `transformV2Stats`. Per-bin ndv is
  * apportioned from the HLL-served distinct count by value-range share
  * (estimate-grade, like every CBO input; a column serves only when every
  * planned file carries both its sketch and its grid). Deletion-vector-
  * masked rows stay counted until `purge_deletes` — same overcount
  * caveat as [[NdvStats.mergedDistinct]]. */
object HistStats {

  /** Buckets per file grid. 16 longs/column/file keeps the marker cost
    * ~128 B — two orders below the HLL sketch riding next to it. */
  val Buckets = 16

  /** Histogram domain: plain numerics plus date/timestamp (gridded on
    * catalyst's own internal number line — epoch DAYS for dates, epoch
    * MICROS for timestamps — so the served bins speak the exact units
    * `FilterEstimation.toDouble` expects for literals of those types).
    *
    * STRINGS are deliberately excluded, matching Spark's own contract:
    * `ANALYZE ... COMPUTE STATISTICS FOR COLUMNS` refuses string
    * histograms too, because catalyst's `FilterEstimation` cannot place
    * a string literal on a number line (`EstimationUtils.toDouble`
    * covers numeric/date/timestamp/boolean only — a served string
    * histogram would crash the estimator, not improve it). What string
    * keys DO get from the log: HLL-served distinct counts (equality
    * predicates estimate as 1/ndv from data), exact null counts, and
    * FILE-granularity min/max skipping — a string range predicate
    * prunes whole files through [[FileStats.mayMatch]]'s StringVal
    * bounds, which on a string-clustered layout is a stronger lever
    * than any row-level distribution estimate. */
  def eligible(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType |
         FloatType | DoubleType | DateType | TimestampType => true
    case _ => false
  }

  /** A histogram-eligible column on its grid number line (catalyst's
    * internal units; float/double NaNs masked out — a NaN-polluted
    * bound would make every bucket degenerate). ONE definition shared
    * by the fused bounds pass and the count pass — drift between the
    * two would mis-bucket silently. */
  private[core] def gridView(c: org.apache.spark.sql.Column, dt: DataType)
      : org.apache.spark.sql.Column = dt match {
    case FloatType | DoubleType => when(!isnan(c), c.cast("double"))
    case DateType =>
      datediff(c, lit("1970-01-01").cast("date")).cast("double")
    case TimestampType => unix_micros(c).cast("double")
    case _ => c.cast("double")
  }

  /** One equi-width grid per (file, numeric declared column) for the
    * staged files. `bounds` carries the exact per-file min/max (NaNs
    * excluded — a NaN-polluted bound would make every bucket degenerate),
    * computed by the FUSED sketch pass
    * ([[NdvStats.collectSketchesAndBounds]]) so the whole stat harvest is
    * two delta reads, not three; this pass is ONE grouped aggregation
    * computing all 16 bucket counts for every column at once (conditional
    * counts, no explode, no shuffle wider than the delta). Keys are
    * dir-relative paths matching `files`. */
  def collectHists(spark: SparkSession, dataDir: String, files: Seq[String],
                   cols: Seq[String],
                   bounds: Map[String, (String, Map[String, (Double, Double)])])
      : Map[String, Map[String, FileStats.Hist]] = {
    if (files.isEmpty || cols.isEmpty || bounds.isEmpty) return Map.empty
    val df = spark.read.parquet(files.map(f => s"$dataDir/$f"): _*)
    val byName = df.schema.fields.map(f => f.name.toLowerCase -> f).toMap
    val present = cols.flatMap(c => byName.get(c.toLowerCase))
      .filter(f => eligible(f.dataType)).map(_.name)
    if (present.isEmpty) return Map.empty

    def clean(c: String) = gridView(col(c), byName(c.toLowerCase).dataType)

    // the fused pass's bounds as a driver-built frame keyed by the abs
    // path `_metadata` spells (null bounds = zero non-null values)
    val boundSchema = StructType(
      StructField("_gf_path", StringType, nullable = false) +:
        present.flatMap(c => Seq(
          StructField(s"_lo_$c", DoubleType, nullable = true),
          StructField(s"_hi_$c", DoubleType, nullable = true))))
    val boundRows: java.util.List[org.apache.spark.sql.Row] =
      java.util.Arrays.asList(bounds.values.toSeq.map { case (abs, byCol) =>
        org.apache.spark.sql.Row.fromSeq(abs +: present.flatMap { c =>
          byCol.get(c.toLowerCase) match {
            case Some((lo, hi)) => Seq[Any](lo, hi)
            case None           => Seq[Any](null, null)
          }
        })
      }: _*)
    val boundsDf = spark.createDataFrame(boundRows, boundSchema)

    // bucket counts — bounds broadcast back onto the rows, every
    // (column, bucket) pair one conditional count in a single grouped agg
    val withBounds = df
      .select(col("_metadata.file_path").as("_gf_path") +: present.map(col): _*)
      .join(broadcast(boundsDf), "_gf_path")
    val countAggs = present.flatMap { c =>
      val lo = col(s"_lo_$c"); val hi = col(s"_hi_$c")
      val bucket = when(clean(c).isNull || lo.isNull, lit(null))
        .when(hi === lo, lit(0))
        .otherwise(least(lit(Buckets - 1),
          floor((clean(c) - lo) / (hi - lo) * Buckets)).cast("int"))
      (0 until Buckets).map(b =>
        count(when(bucket === b, 1)).as(s"_ct_${b}_$c"))
    }
    val rows = withBounds.groupBy("_gf_path")
      .agg(countAggs.head, countAggs.tail: _*)
      .join(broadcast(boundsDf), "_gf_path")
      .collect()

    rows.map { r =>
      val abs = r.getString(r.fieldIndex("_gf_path"))
      val rel = files.find(f => abs.endsWith("/" + f)).getOrElse(abs)
      rel -> present.map { c =>
        val loI = r.fieldIndex(s"_lo_$c"); val hiI = r.fieldIndex(s"_hi_$c")
        val h =
          if (r.isNullAt(loI) || r.isNullAt(hiI))
            FileStats.Hist(0.0, 0.0, Vector.empty) // zero non-null values
          else {
            val lo = r.getDouble(loI); val hi = r.getDouble(hiI)
            val counts = (0 until Buckets)
              .map(b => r.getLong(r.fieldIndex(s"_ct_${b}_$c"))).toVector
            if (lo == hi) FileStats.Hist(lo, hi, Vector(counts.sum))
            else FileStats.Hist(lo, hi, counts)
          }
        c.toLowerCase -> h
      }.toMap
    }.toMap
  }

  /** Fold per-file grids into the footer-harvested stats (mirror of
    * [[NdvStats.attach]]). */
  def attach(stats: Map[String, FileStats.Stats],
             hists: Map[String, Map[String, FileStats.Hist]]): Map[String, FileStats.Stats] =
    stats.map { case (f, st) =>
      hists.get(f) match {
        case None => f -> st
        case Some(byCol) => f -> st.copy(cols = st.cols.map { case (c, cs) =>
          c -> byCol.get(c).map(h => cs.copy(hist = Some(h))).getOrElse(cs)
        } ++ byCol.view.filterKeys(c => !st.cols.contains(c))
          .mapValues(h => FileStats.ColStats(None, None, None, None, Some(h))).toMap)
      }
    }

  /** Merge the planned files' grids into one EQUI-HEIGHT histogram
    * (height = rows/bin, the catalyst form): each grid bucket is a
    * piecewise-uniform segment (single-bucket grids are point masses),
    * segments are resampled onto a fine uniform grid over the global
    * range, and bin boundaries cut the cumulative distribution at equal
    * mass with linear interpolation inside a cell. Per-bin ndv
    * apportions `ndvTotal` by VALUE-RANGE share (distinct values assumed
    * spread over the range — a narrow bin in a dense region gets few
    * distincts and therefore high per-value frequency, the right bias
    * for skew). Returns None when no grid holds any value. */
  def mergedEquiHeight(hists: Seq[FileStats.Hist], bins: Int, ndvTotal: Long)
      : Option[(Double, Seq[(Double, Double, Long)])] = {
    val segs = hists.flatMap { h =>
      if (h.counts.isEmpty) Nil
      else if (h.counts.length == 1) Seq((h.lo, h.lo, h.counts.head))
      else {
        val w = (h.hi - h.lo) / h.counts.length
        h.counts.zipWithIndex.collect { case (c, i) if c > 0 =>
          (h.lo + w * i,
            if (i == h.counts.length - 1) h.hi else h.lo + w * (i + 1), c)
        }
      }
    }.filter(_._3 > 0)
    if (segs.isEmpty) return None
    val n = segs.map(_._3).sum.toDouble
    val lo = segs.map(_._1).min
    val hi = segs.map(_._2).max
    val height = n / bins
    if (hi == lo) // constant column: point bins, one distinct value
      return Some((height, Seq.fill(bins)((lo, hi, 1L))))

    val G = math.max(bins * 16, 256)
    val cellW = (hi - lo) / G
    val cell = new Array[Double](G)
    def cellIdx(x: Double): Int =
      math.min(G - 1, math.max(0, ((x - lo) / cellW).toInt))
    segs.foreach { case (s, e, c) =>
      if (e <= s) cell(cellIdx(s)) += c
      else {
        val g0 = cellIdx(s); val g1 = cellIdx(math.nextDown(e))
        if (g0 == g1) cell(g0) += c
        else {
          val segW = e - s
          for (g <- g0 to g1) {
            val cLo = lo + cellW * g; val cHi = cLo + cellW
            val overlap = math.min(e, cHi) - math.max(s, cLo)
            if (overlap > 0) cell(g) += c * overlap / segW
          }
        }
      }
    }
    val cum = cell.scanLeft(0.0)(_ + _) // cum(g) = mass strictly before cell g
    def quantile(q: Double): Double = {
      var g = 0
      while (g < G && cum(g + 1) < q) g += 1
      if (g >= G) hi
      else {
        val inCell = q - cum(g)
        val frac = if (cell(g) > 0) inCell / cell(g) else 0.0
        lo + cellW * (g + frac)
      }
    }
    val edges = (0 to bins).map {
      case 0          => lo
      case j if j == bins => hi
      case j          => quantile(height * j)
    }
    val out = (0 until bins).map { j =>
      val (blo, bhi) = (edges(j), edges(j + 1))
      val ndv = math.max(1L,
        math.round(ndvTotal * math.max(0.0, bhi - blo) / (hi - lo)))
      (blo, bhi, ndv)
    }
    Some((height, out))
  }

  /** [[mergedEquiHeight]] memoized by (dir, column, planned-file-set) —
    * the same planning-cost argument as [[NdvStats.mergedDistinctCached]]:
    * committed files are immutable, so a (file set, column) pair always
    * merges to the same bins, and a 10⁵-file scan must not re-walk
    * 10⁵ × 16 grid segments on every plan. File-set identity is the
    * strong [[NdvStats.fileSetDigest]] — a colliding weak hash would
    * serve another plan's distribution to CBO. */
  private val MergeCacheMax = 256
  private val mergeCache = new java.util.LinkedHashMap[
      (String, String, String),
      Option[(Double, Seq[(Double, Double, Long)])]](64, 0.75f, true) {
    override protected def removeEldestEntry(
        e: java.util.Map.Entry[(String, String, String),
                               Option[(Double, Seq[(Double, Double, Long)])]]): Boolean =
      size() > MergeCacheMax
  }

  def mergedEquiHeightCached(dir: String, col: String, plannedFiles: Seq[String],
                             hists: => Seq[FileStats.Hist], bins: Int,
                             ndvTotal: Long)
      : Option[(Double, Seq[(Double, Double, Long)])] = {
    val key = (dir, col, NdvStats.fileSetDigest(plannedFiles))
    mergeCache.synchronized {
      val hit = mergeCache.get(key)
      if (hit != null) return hit
    }
    val merged = mergedEquiHeight(hists, bins, ndvTotal)
    mergeCache.synchronized { mergeCache.put(key, merged); () }
    merged
  }
}
