package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-study data generator: replicate the TPC-H-ish tables of an input
  * SF directory `factor`x with DISJOINT key spaces per replica (every
  * foreign-key relationship preserved within a replica, never across), so
  * join/aggregate plans face factor-x cardinality with realistic key
  * distributions. Usage:
  * {{{ runMain graft.ScaleReplicate <inDir> <outDir> <factor> }}}
  * Scratch tooling for the scaling study in STATE.md — not part of the
  * library surface; writes only under the given outDir.
  */
object ScaleReplicate {
  def main(args: Array[String]): Unit = {
    val Array(inDir, outDir, factorS) = args
    val factor = factorS.toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def load(t: String): DataFrame = spark.read.parquet(s"$inDir/$t.parquet")
    def replicate(df: DataFrame, keyCols: Seq[String]): DataFrame = {
      val offsets = keyCols.map(c => c -> (df.agg(max(col(c))).head().getLong(0) + 1L)).toMap
      val reps = (0 until factor).map { i =>
        keyCols.foldLeft(df)((d, c) =>
          d.withColumn(c, col(c) + lit(i.toLong * offsets(c))))
      }
      reps.reduce(_ unionByName _)
    }
    def write(df: DataFrame, t: String): Unit = {
      df.repartition(32).write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      println(s"[replicate] $t: ${spark.read.parquet(s"$outDir/$t.parquet").count()} rows")
    }

    // copied verbatim (dimension tables joined by every replica)
    Seq("region", "nation").foreach(t => write(load(t), t))
    write(replicate(load("supplier"), Seq("s_suppkey")), "supplier")
    write(replicate(load("part"), Seq("p_partkey")), "part")
    write(replicate(load("customer"), Seq("c_custkey")), "customer")
    write(replicate(load("orders"), Seq("o_orderkey", "o_custkey")), "orders")
    write(replicate(load("lineitem"),
      Seq("l_orderkey", "l_partkey", "l_suppkey")), "lineitem")
    // events: disjoint users + event ids per replica; ts untouched so
    // window/funnel densities scale with user count, not time range
    write(replicate(load("events"), Seq("event_id", "user_id")), "events")
    spark.stop()
  }
}
