package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Scale probe for the vector-assignment family after the map-only
  * rewrite: nearest-centroid (kmeans/IVF) and sign-LSH bucket assignment
  * used to crossJoin K broadcast rows per corpus row and collapse them
  * with a groupBy(id) — a full-corpus Exchange per call (per Lloyd
  * iteration). The broadcast-array argmax/fold is a pure map, so the
  * per-iteration cost must now scale with the SCAN, not a shuffle of the
  * corpus, and grow ~linearly (sub-shuffle) at 10×.
  *
  * Replicates the sf embeddings 100× and 1000× (vec_id re-keyed
  * disjoint; both well past fixed job overhead, 10× apart), then times
  * 2-iteration kmeans end-to-end, the assignment alone, and the LSH
  * bucket fold. Prints one JSON line. Usage:
  * `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.VecScale"`. */
object VecScale {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("vec-scale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    val dim = 32

    def time[T](f: => T): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def med3(f: => Unit): Double = (1 to 3).map(_ => time(f)).sorted.apply(1)

    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("label"), col("embedding"))
      .localCheckpoint()
    // replicate well past fixed job overhead: 100x (~200k rows) vs
    // 1000x (~2M rows) — a 10x jump between two above-overhead scales
    def rep(k: Int) = base.crossJoin(
        spark.range(k.toLong).select(col("id").as("_r")))
      .select((col("vec_id") + col("_r") * 10000000L).as("vec_id"),
        col("label"), col("embedding"))
      .repartition(32).localCheckpoint()
    val emb1 = rep(100)
    val n1 = emb1.count()
    val emb10 = rep(1000)
    val n10 = emb10.count()

    def probe(emb: org.apache.spark.sql.DataFrame): (Double, Double, Double) = {
      val cents = Similarity.centroids(
        emb.select(col("label"), col("embedding")), "label", "embedding", dim)
        .localCheckpoint()
      val assign = med3 {
        Similarity.assignNearest(emb, "vec_id", "embedding", cents)
          .agg(sum("cluster")).collect(); ()
      }
      val kmeans = med3 {
        Similarity.kmeans(emb.select(col("vec_id"), col("embedding")),
          "vec_id", "embedding", dim, cents, iters = 2).collect(); ()
      }
      val hyper = Similarity.seededHyperplanes(spark, numPlanes = 8, dim = dim)
      val lsh = med3 {
        Similarity.signLshBuckets(emb, "vec_id", "embedding", hyper)
          .agg(sum("bucket")).collect(); ()
      }
      (assign, kmeans, lsh)
    }

    val (a1, k1, l1) = probe(emb1)
    val (a10, k10, l10) = probe(emb10)
    def r(x: Double) = f"$x%.3f"
    println(s"""{"metric":"vec_scale","sf_dir":"$sfDir","rows_1x":$n1,"rows_10x":$n10,""" +
      s""""assign_1x_sec":${r(a1)},"assign_10x_sec":${r(a10)},""" +
      s""""kmeans2_1x_sec":${r(k1)},"kmeans2_10x_sec":${r(k10)},""" +
      s""""lsh_1x_sec":${r(l1)},"lsh_10x_sec":${r(l10)},""" +
      s""""assign_ratio":${r(a10 / a1)},"kmeans_ratio":${r(k10 / k1)},""" +
      s""""lsh_ratio":${r(l10 / l1)}}""")
    spark.stop()
  }
}
