package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Scale probe for the IVF-pruned exact range search
  * ([[Similarity.rangeSearch]]) vs the brute-force formulation at growing
  * corpus sizes. With tight clusters (structured spike+noise vectors, 10
  * clusters, ~1 admitted per query at tau=0.6) the pruned scan should
  * score ~1/10th of the pairs — the probe verifies the wall-clock gap
  * GROWS with the corpus (the 100 TB argument: brute force is O(nq × n),
  * the pruned path O(nq × n/K) after one O(n) assignment pass).
  *
  * Prints one JSON line with 3-run medians at 1× and 10× the sf0.01
  * corpus. Usage: `sbt "runMain graft.tools.RangeScale"`. */
object RangeScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("range-scale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dim = 64
    val tau = 0.6

    // the SHARED qv08 formula (tight label clusters; see VectorQueries)
    def synth(ids: DataFrame): DataFrame = ids.select(col("vec_id"), col("label"),
      graft.queries.VectorQueries.rangeSynthVec.as("v"))

    val base = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select(col("vec_id"), col("label"))
    def corpusAt(times: Int): DataFrame = {
      val n = 1000000L
      val rep = base.crossJoin(
          spark.range(times.toLong).select(col("id").as("rep")))
        .select((col("vec_id") + col("rep") * n).as("vec_id"), col("label"))
      synth(rep).select(col("vec_id").as("id"), col("label"), col("v").as("vec"))
        .repartition(32)
        .localCheckpoint() // pin the corpus: time the SEARCH, not the synth
    }
    val queries = synth(base.filter(col("vec_id") < 512))
      .select(col("vec_id").as("q_id"), col("v").as("q_vec"))
      .localCheckpoint()

    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    def run3(f: => Long): Double = med(Seq(time(f), time(f), time(f)))

    def brute(corpus: DataFrame): Long =
      corpus.crossJoin(broadcast(queries))
        .withColumn("cosine", round(
          graft.functions.VectorFunctions.cosineSimilarity(col("q_vec"), col("vec")), 6))
        .filter(col("cosine") >= tau).count()

    // production shape: the IVF index (assignment + per-cluster radii) is
    // built once and stored; queries probe it. Time the QUERY path.
    def buildIndex(corpus: DataFrame): (DataFrame, DataFrame) = {
      val cents = Similarity.centroids(
        corpus.select(col("label"), col("vec").cast("array<float>").as("v")),
        "label", "v", dim).localCheckpoint()
      val assigned = Similarity.assignNearest(
        corpus.select(col("id"), col("vec")), "id", "vec", cents).localCheckpoint()
      (assigned, Similarity.clusterRadii(assigned, cents).localCheckpoint())
    }

    def pruned(assigned: DataFrame, radii: DataFrame): Long =
      Similarity.rangeSearchIndexed(queries, assigned, radii, tau).count()

    // warmup
    { val w = corpusAt(1); brute(w); val (a, c) = buildIndex(w); pruned(a, c) }

    def r(x: Double) = math.rint(x * 1000) / 1000
    val out = Seq(40, 400).map { times =>
      val corpus = corpusAt(times)
      val (assigned, radii) = buildIndex(corpus)
      val nb = brute(corpus); val np = pruned(assigned, radii)
      require(nb == np, s"pruned range search diverged at ${times}x: $np vs $nb")
      val tb = run3(brute(corpus))
      val tp = run3(pruned(assigned, radii))
      s""""x$times":{"rows":$nb,"brute_sec":${r(tb)},"pruned_sec":${r(tp)},"speedup":${r(tb / tp)}}"""
    }.mkString(",")
    println(s"""{"metric":"range_scale",$out}""")
    spark.stop()
  }
}
