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

  /** Spark's `hll_sketch_agg` input domain. */
  def eligible(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType |
         org.apache.spark.sql.types.StringType | org.apache.spark.sql.types.BinaryType => true
    case _ => false
  }

  /** One HLL sketch per (file, column) for the staged files — a single
    * grouped aggregation over the delta (`_metadata` file path groups the
    * rows by their physical file; no shuffle wider than the delta). Keys
    * of the result are dir-relative file paths matching `files`. */
  def collectSketches(spark: SparkSession, dataDir: String, files: Seq[String],
                      cols: Seq[String]): Map[String, Map[String, Array[Byte]]] = {
    if (files.isEmpty || cols.isEmpty) return Map.empty
    val df = spark.read.parquet(files.map(f => s"$dataDir/$f"): _*)
    val present = cols.filter(c => df.schema.fieldNames.exists(_.equalsIgnoreCase(c)))
    if (present.isEmpty) return Map.empty
    val aggs = present.map(c => hll_sketch_agg(col(c)).as(c))
    val rows = df
      .select(col("_metadata.file_path").as("_gf_path") +: present.map(col): _*)
      .groupBy("_gf_path").agg(aggs.head, aggs.tail: _*)
      .collect()
    rows.map { r =>
      val abs = r.getString(0)
      val rel = files.find(f => abs.endsWith("/" + f)).getOrElse(abs)
      rel -> present.zipWithIndex.flatMap { case (c, i) =>
        if (r.isNullAt(i + 1)) None
        else Some(c.toLowerCase -> r.getAs[Array[Byte]](i + 1))
      }.toMap
    }.toMap
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

  /** [[mergedDistinct]] memoized by (dir, column, planned-file-set):
    * data files are immutable once committed, so a (file set, column)
    * pair always merges to the same estimate — and scan PLANNING must
    * not pay an O(files) sketch union per query on a 10⁵-file table
    * (~µs per union × 100k files ≈ 0.3 s/plan otherwise). The key
    * hashes the planned names (String#hashCode is cached per instance),
    * not the sketch bytes. */
  private val MergeCacheMax = 256
  private val mergeCache =
    new java.util.LinkedHashMap[(String, String, Int, Int), java.lang.Long](64, 0.75f, true) {
      override protected def removeEldestEntry(
          e: java.util.Map.Entry[(String, String, Int, Int), java.lang.Long]): Boolean =
        size() > MergeCacheMax
    }

  def mergedDistinctCached(dir: String, col: String, plannedFiles: Seq[String],
                           sketches: => Iterable[Array[Byte]]): Long = {
    val key = (dir, col, plannedFiles.length, plannedFiles.hashCode())
    mergeCache.synchronized {
      val hit = mergeCache.get(key)
      if (hit != null) return hit.longValue
    }
    val merged = mergedDistinct(sketches)
    mergeCache.synchronized { mergeCache.put(key, java.lang.Long.valueOf(merged)); () }
    merged
  }
}
