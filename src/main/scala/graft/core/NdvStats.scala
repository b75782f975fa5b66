package graft.core

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Commit-time column NDV sketches served to the optimizer from the log —
  * distinct counts without an ANALYZE pass (SURVEY §2 lakehouse surface;
  * the capability Iceberg ships as puffin theta sketches, expressed
  * through the manifest's per-file stats channel).
  *
  * A table declaring `graft.ndv.columns` gets one DataSketches HLL sketch
  * PER FILE PER COLUMN at commit time (one extra aggregation pass over
  * the just-written delta — commit cost stays O(delta)), stored in the
  * marker next to min/max. Sketches are mergeable, so scan planning
  * unions the PLANNED files' sketches (post data-skipping) into a
  * distinct count and serves it through DSv2 `columnStats()` →
  * `transformV2Stats` → catalyst `ColumnStat` — CBO filter/join
  * estimation then runs on log-served NDV alone. File granularity
  * composes with removes and rewrites: a file's sketch dies with the
  * file. A column is served only when EVERY planned file carries its
  * sketch (files written by paths that don't sketch — e.g. pre-NDV
  * history — soundly disable serving rather than under-count). */
object NdvStats {

  /** Sketchable domain: Spark's `hll_sketch_agg` input types, plus
    * date/timestamp sketched through their catalyst epoch integers
    * (distinct days/micros = distinct dates/timestamps). */
  def eligible(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType |
         org.apache.spark.sql.types.StringType | org.apache.spark.sql.types.BinaryType |
         org.apache.spark.sql.types.DateType | org.apache.spark.sql.types.TimestampType => true
    case _ => false
  }

  /** The sketch input for a column: raw for hll_sketch_agg's native
    * domain, the epoch integer for date/timestamp. */
  private def sketchView(c: org.apache.spark.sql.Column,
      dt: org.apache.spark.sql.types.DataType): org.apache.spark.sql.Column = dt match {
    case org.apache.spark.sql.types.DateType =>
      datediff(c, lit("1970-01-01").cast("date"))
    case org.apache.spark.sql.types.TimestampType => unix_micros(c)
    case _ => c
  }

  /** One HLL sketch per (file, column) for the staged files — a single
    * grouped aggregation over the delta (`_metadata` file path groups the
    * rows by their physical file; no shuffle wider than the delta). Keys
    * of the result are dir-relative file paths matching `files`. */
  def collectSketches(spark: SparkSession, dataDir: String, files: Seq[String],
                      cols: Seq[String]): Map[String, Map[String, Array[Byte]]] =
    collectSketchesAndBounds(spark, dataDir, files, cols)._1

  /** [[collectSketches]] FUSED with the exact per-file histogram bounds
    * ([[HistStats]] pass 1) — one grouped aggregation instead of two, so
    * a declared-column commit reads its delta twice (sketch+bounds, then
    * bucket counts), not three times. Bounds cover the HIST-eligible
    * declared columns (NaNs excluded from float/double bounds — a
    * NaN-polluted bound would make every bucket degenerate), keyed
    * rel-file -> (abs path as `_metadata` spells it — what the count
    * pass joins on, Map col -> (lo, hi)); a column with zero non-null
    * values in a file has no entry. */
  def collectSketchesAndBounds(spark: SparkSession, dataDir: String,
                               files: Seq[String], cols: Seq[String])
      : (Map[String, Map[String, Array[Byte]]],
         Map[String, (String, Map[String, (Double, Double)])]) = {
    if (files.isEmpty || cols.isEmpty) return (Map.empty, Map.empty)
    val df = spark.read.parquet(files.map(f => s"$dataDir/$f"): _*)
    val byName = df.schema.fields.map(f => f.name.toLowerCase -> f).toMap
    val present = cols.flatMap(c => byName.get(c.toLowerCase)).map(_.name)
    if (present.isEmpty) return (Map.empty, Map.empty)
    // sketch only the hll_sketch_agg domain (DDL validates catalog
    // declarations; core-API callers get bounds-only for e.g. doubles),
    // grid only the numeric domain
    val sketchCols = present.filter(c => eligible(byName(c.toLowerCase).dataType))
    val histCols = present.filter(c =>
      HistStats.eligible(byName(c.toLowerCase).dataType))
    def clean(c: String) = HistStats.gridView(col(c), byName(c.toLowerCase).dataType)
    val aggs = sketchCols.map(c =>
      hll_sketch_agg(sketchView(col(c), byName(c.toLowerCase).dataType)).as(s"_sk_$c")) ++
      histCols.flatMap(c => Seq(
        min(clean(c)).as(s"_lo_$c"), max(clean(c)).as(s"_hi_$c")))
    if (aggs.isEmpty) return (Map.empty, Map.empty)
    val rows = df
      .select(col("_metadata.file_path").as("_gf_path") +: present.map(col): _*)
      .groupBy("_gf_path").agg(aggs.head, aggs.tail: _*)
      .collect()
    val sketches = rows.map { r =>
      val abs = r.getString(0)
      val rel = files.find(f => abs.endsWith("/" + f)).getOrElse(abs)
      rel -> sketchCols.flatMap { c =>
        val i = r.fieldIndex(s"_sk_$c")
        if (r.isNullAt(i)) None
        else Some(c.toLowerCase -> r.getAs[Array[Byte]](i))
      }.toMap
    }.toMap
    val bounds = rows.map { r =>
      val abs = r.getString(0)
      val rel = files.find(f => abs.endsWith("/" + f)).getOrElse(abs)
      rel -> (abs, histCols.flatMap { c =>
        val lo = r.fieldIndex(s"_lo_$c"); val hi = r.fieldIndex(s"_hi_$c")
        if (r.isNullAt(lo) || r.isNullAt(hi)) None
        else Some(c.toLowerCase -> (r.getDouble(lo), r.getDouble(hi)))
      }.toMap)
    }.toMap
    (sketches, bounds)
  }

  /** Fold per-file sketches into footer-harvested stats (the map
    * [[collectSketches]] returns into what `FileStats.collect` built). */
  def attach(stats: Map[String, FileStats.Stats],
             sketches: Map[String, Map[String, Array[Byte]]]): Map[String, FileStats.Stats] =
    stats.map { case (f, st) =>
      sketches.get(f) match {
        case None => f -> st
        case Some(byCol) => f -> st.copy(cols = st.cols.map { case (c, cs) =>
          c -> byCol.get(c).map(b => cs.copy(ndvSketch = Some(b))).getOrElse(cs)
        } ++ byCol.view.filterKeys(c => !st.cols.contains(c))
          .mapValues(b => FileStats.ColStats(None, None, None, Some(b))).toMap)
      }
    }

  /** Union per-file sketches into one distinct-count estimate
    * (driver-side; sketches are ~KB each and union is O(registers)).
    * Estimates count STORED rows — deletion-vector-masked rows are still
    * in their files' sketches, so a heavily vectored table overcounts
    * until `purge_deletes` rewrites (estimate-grade, like all CBO
    * stats). */
  def mergedDistinct(sketches: Iterable[Array[Byte]]): Long = {
    val union = new org.apache.datasketches.hll.Union(12)
    sketches.foreach { b =>
      union.update(org.apache.datasketches.hll.HllSketch.heapify(
        org.apache.datasketches.memory.Memory.wrap(b)))
    }
    math.round(union.getResult.getEstimate)
  }

  /** STRONG identity of a planned file set: md5 over the newline-joined
    * names. The memo keys below feed STATISTICS to the optimizer — a
    * 32-bit Seq.hashCode collides at ~77k distinct plans (birthday
    * bound) and would silently serve another plan's numbers; a 128-bit
    * digest makes that impossible in practice. Hashing 100k names costs
    * ~ms, far under the O(files) merge the memo avoids. */
  private[core] def fileSetDigest(files: Seq[String]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    files.foreach { f => md.update(f.getBytes("UTF-8")); md.update('\n'.toByte) }
    java.util.Base64.getEncoder.encodeToString(md.digest())
  }

  /** [[mergedDistinct]] memoized by (dir, column, planned-file-set):
    * data files are immutable once committed, so a (file set, column)
    * pair always merges to the same estimate — and scan PLANNING must
    * not pay an O(files) sketch union per query on a 10⁵-file table
    * (~µs per union × 100k files ≈ 0.3 s/plan otherwise). The file set
    * is identified by [[fileSetDigest]], not the sketch bytes. */
  private val MergeCacheMax = 256
  private val mergeCache =
    new java.util.LinkedHashMap[(String, String, String), java.lang.Long](64, 0.75f, true) {
      override protected def removeEldestEntry(
          e: java.util.Map.Entry[(String, String, String), java.lang.Long]): Boolean =
        size() > MergeCacheMax
    }

  def mergedDistinctCached(dir: String, col: String, plannedFiles: Seq[String],
                           sketches: => Iterable[Array[Byte]]): Long = {
    val key = (dir, col, fileSetDigest(plannedFiles))
    mergeCache.synchronized {
      val hit = mergeCache.get(key)
      if (hit != null) return hit.longValue
    }
    val merged = mergedDistinct(sketches)
    mergeCache.synchronized { mergeCache.put(key, java.lang.Long.valueOf(merged)); () }
    merged
  }
}
