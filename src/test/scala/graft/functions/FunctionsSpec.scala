package graft.functions

import graft.core.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Numeric parity + accuracy specs for the custom vector kernel and the
  * approximate aggregates. */
class FunctionsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("FloatVecDot codegen == interpreted HOF fold, bit-for-bit") {
    val emb = Tables.embeddings(spark, sf)
    val both = emb.select(
      VectorFunctions.dotProduct(col("embedding"), col("embedding")).as("fused"),
      VectorFunctions.dotProductHof(col("embedding"), col("embedding")).as("hof"))
    val mismatches = both.filter(col("fused") =!= col("hof")).count()
    assert(mismatches === 0)
  }

  test("FloatVecDot: nulls propagate, double arrays accepted") {
    import spark.implicits._
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), Some(Array(3.0f, 4.0f))),
      (None, Some(Array(1.0f)))).toDF("a", "b")
    val got = df.select(VectorFunctions.dotProduct(col("a"), col("b"))).collect()
    assert(got(0).getDouble(0) === 11.0)
    assert(got(1).isNullAt(0))
    val dd = Seq((Array(1.5, 2.5), Array(2.0, 4.0))).toDF("a", "b")
    assert(dd.select(VectorFunctions.dotProduct(col("a"), col("b")))
      .head().getDouble(0) === 13.0)
    // mixed float x double (query vector vs double centroid)
    val mixed = Seq((Array(1.0f, 2.0f), Array(2.0, 3.0))).toDF("a", "b")
    assert(mixed.select(VectorFunctions.dotProduct(col("a"), col("b")))
      .head().getDouble(0) === 8.0)
    // mismatched lengths -> null (zip_with pads with null and propagates)
    val mm = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f))).toDF("a", "b")
    assert(mm.select(VectorFunctions.dotProduct(col("a"), col("b"))).head().isNullAt(0))
    // null element -> null, matching the HOF reference
    val ne = Seq((Array[java.lang.Float](1.0f, null), Array[java.lang.Float](1.0f, 2.0f)))
      .toDF("a", "b")
    assert(ne.select(VectorFunctions.dotProduct(col("a"), col("b"))).head().isNullAt(0))
  }

  test("approx_count_distinct within 5% of exact (q28 backing)") {
    val li = Tables.lineitem(spark, sf)
    val exact = li.select(countDistinct(col("l_partkey"))).head().getLong(0)
    val approx = li.select(approx_count_distinct(col("l_partkey"))).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("percentile_approx within 2% of exact median (q28 backing)") {
    val li = Tables.lineitem(spark, sf)
    val exact = li.select(expr("percentile(l_extendedprice, 0.5)")).head().getDouble(0)
    val approx = li.select(percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)))
      .head().getDouble(0)
    assert(math.abs(approx - exact) / exact < 0.02, s"approx=$approx exact=$exact")
  }

  test("cosine of a vector with itself is 1") {
    val one = Tables.embeddings(spark, sf).limit(5)
      .select(round(VectorFunctions.cosineSimilarity(col("embedding"), col("embedding")), 9).as("c"))
      .collect()
    assert(one.forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-9))
  }
}
