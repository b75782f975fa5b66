package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Scale probe for the round's WAP-decontamination rework: staged-batch
  * near-dup detection against a RELEASED corpus via the STORED LSH index
  * ([[Dedup.minhashLshPairsAgainstIndex]]) versus the pre-rework shape
  * that re-shingled the whole corpus per release
  * ([[Dedup.minhashLshPairs]] over released ∪ staged).
  *
  * The claim: with a FIXED staged delta, the indexed probe's cost grows
  * sub-linearly in the corpus (a columnar scan of the stored (doc_id,
  * band, bucket) table filtered by a broadcast of the delta's bands —
  * no shingling, no signature aggregation over released text), while
  * the re-shingle shape grows ~linearly (it tokenizes + 64-way-minhashes
  * every released document again). Corpus replicated 10× and 100× with
  * disjoint ids; delta fixed at ~100 docs; 3-run medians. Prints one
  * JSON line. Usage: `sbt "runMain graft.tools.IndexProbeScale"`. */
object IndexProbeScale {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("index-probe-scale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](f: => T): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def med3(f: => Unit): Double = (1 to 3).map(_ => time(f)).sorted.apply(1)

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val nDocs = docs.count()
    // replica/delta id offsets DERIVED from the corpus size so disjoint
    // ids stay disjoint at any scale factor (a fixed 1e6 stride would
    // silently self-collide past 1M docs and invalidate the probe)
    val stride = nDocs + 1
    // the FIXED staged delta: ~100 docs, near-dups of the base slice
    val delta = docs.filter(col("doc_id") < 100)
      .select((col("doc_id") + lit(stride * 1000L)).as("doc_id"), col("text"))
      .localCheckpoint()

    val results = Seq(1, 10, 100).flatMap { times =>
      // disjoint-id replication => corpus of n*times docs
      val corpus = (0 until times).map { r =>
        docs.select((col("doc_id") + lit(r.toLong * stride)).as("doc_id"),
          col("text"))
      }.reduce(_.unionByName(_)).localCheckpoint()
      // release-time index build (once per release, O(corpus) by design)
      val idxDir = graft.core.TempDirs.create(s"graft_ips_${times}x_")
      val buildSec = time {
        graft.core.ManifestTable.write(
          Dedup.lshIndex(corpus, "doc_id", "text", 3), idxDir)
      }
      val idx = graft.core.ManifestTable.read(spark, idxDir)
      // per-batch paths under test. The re-shingle arm stops at 10×: it
      // shuffles the full corpus's shingle explosion (the 100× run spills
      // tens of GB — which IS the point; its 1×→10× slope establishes
      // the linear growth the stored-index probe avoids).
      val probeSec = med3 {
        Dedup.minhashLshPairsAgainstIndex(corpus, idx, delta,
          "doc_id", "text", 3, 0.8).count(); ()
      }
      val reshingle =
        if (times > 10) Nil
        else Seq(s""""reshingle_sec_${times}x":${med3 {
          Dedup.minhashLshPairs(corpus.unionByName(delta),
            "doc_id", "text", 3, 0.8).count(); ()
        }}""")
      Seq(
        s""""corpus_docs_${times}x":${nDocs * times}""",
        s""""index_build_sec_${times}x":$buildSec""",
        s""""probe_sec_${times}x":$probeSec""") ++ reshingle
    }
    println(s"""{"metric":"index_probe_scale",${results.mkString(",")}}""")
    spark.stop()
  }
}
