package graft.operators

import graft.core.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sampling surface (SURVEY.md §2 Part B scans/sources adjunct): seeded
  * Bernoulli sampling, stratified sampleBy, and SQL TABLESAMPLE. No DuckDB
  * oracle — sampling RNGs are engine-specific — so the contract here is
  * determinism under a fixed seed (what makes sampled pipelines reproducible
  * across retries at scale) plus statistical bounds. */
class SamplingSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.01"

  test("seeded sample is deterministic and near the requested fraction") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_linenumber")
    val total = li.count()
    val a = li.sample(withReplacement = false, fraction = 0.1, seed = 42L)
    val b = li.sample(withReplacement = false, fraction = 0.1, seed = 42L)
    val rowsA = a.collect().toSet
    assert(rowsA === b.collect().toSet, "same seed must select the same rows")
    val frac = rowsA.size.toDouble / total
    assert(frac > 0.07 && frac < 0.13, s"fraction $frac too far from 0.1")
    // different seed -> (overwhelmingly) different selection
    val c = li.sample(withReplacement = false, fraction = 0.1, seed = 43L)
    assert(c.collect().toSet !== rowsA)
  }

  test("stratified sampleBy honors per-stratum fractions with a seed") {
    val li = Tables.lineitem(spark, sf).select("l_returnflag")
    val fractions = Map("A" -> 0.05, "N" -> 0.2, "R" -> 0.1)
    val sampled = li.stat.sampleBy("l_returnflag", fractions, 7L)
      .groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = li.groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    fractions.foreach { case (k, f) =>
      val got = sampled.getOrElse(k, 0L).toDouble / totals(k)
      assert(math.abs(got - f) < 0.05, s"stratum $k: got $got want ~$f")
    }
    // determinism
    val again = li.stat.sampleBy("l_returnflag", fractions, 7L).count()
    assert(again === sampled.values.sum)
  }

  test("SQL TABLESAMPLE runs through the front door") {
    Tables.orders(spark, sf).createOrReplaceTempView("sampling_orders")
    val n = spark.sql(
      "SELECT count(*) AS n FROM sampling_orders TABLESAMPLE (10 PERCENT) REPEATABLE (5)")
      .head().getLong(0)
    val total = spark.table("sampling_orders").count()
    assert(n > 0 && n < total)
  }
}
