package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TextFunctions._
import graft.operators.Dedup

/** Temporary profiling harness (not part of the library). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val docs = Tables.documents(spark, sfDir).cache()
    println("docs: " + docs.count())

    // stage-by-stage replica of minhashLshPairs
    val sh = time("shingleSet build+persist") {
      val s = Dedup.shingleSet(docs, "doc_id", "text", 3).persist()
      s.count(); s
    }
    println("shingle rows: " + sh.count())

    val numBands = 16; val rowsPerBand = 4; val numHashes = 64
    val sig = time("signatures (64 min aggs)") {
      val hashAggs = (0 until numHashes).map(i => min(xxhash64(col("s"), lit(i))).as(s"h$i"))
      val g = sh.groupBy("doc_id").agg(hashAggs.head, hashAggs.tail: _*).persist()
      g.count(); g
    }

    val bands = time("bands") {
      val bucketCols = (0 until numBands).map { b =>
        xxhash64(((b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"h$i")) :+ lit(b)): _*)
      }
      val bd = sig.select(col("doc_id"), posexplode(array(bucketCols: _*)))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket").persist()
      bd.count(); bd
    }

    val candidates = time("candidates (band self-join)") {
      val c = bands.as("x").join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
        .distinct().persist()
      println("candidates: " + c.count()); c
    }

    time("exact verify") {
      val candDocs = candidates.select(col("d1").as("doc_id"))
        .union(candidates.select(col("d2"))).distinct()
      val candSh = sh.join(broadcast(candDocs), Seq("doc_id"), "left_semi")
      val sizes = candSh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
      val inter = candSh.as("a").join(candSh.as("b"),
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(count(lit(1)).as("inter"))
      val out = candidates.join(inter, Seq("d1", "d2"))
        .join(sizes.as("s1"), col("d1") === col("s1.doc_id"))
        .join(sizes.as("s2"), col("d2") === col("s2.doc_id"))
        .withColumn("jaccard",
          col("inter").cast("double") / (col("s1.n_sh") + col("s2.n_sh") - col("inter")))
        .filter(col("jaccard") >= 0.8)
      println("pairs: " + out.count())
    }

    // full operator end-to-end, twice
    time("full minhashLshPairs #1") {
      println(Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 0.8).count())
    }
    time("full minhashLshPairs #2") {
      println(Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 0.8).count())
    }
    spark.stop()
  }
}
