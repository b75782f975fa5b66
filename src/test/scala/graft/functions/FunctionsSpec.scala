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

  test("ngrams_table generator: rows, positions, and edge cases from SQL") {
    import spark.implicits._
    GraftFunctions.registerAll(spark)
    Seq(
      (1L, "a b c d"),
      (2L, "x y"),          // shorter than n -> zero rows
      (3L, null.asInstanceOf[String]), // null -> zero rows
      (4L, "only"),
      (5L, "p q r")
    ).toDF("doc_id", "text").createOrReplaceTempView("ngt_docs")
    val got = spark.sql(
      """SELECT doc_id, g.pos, g.ngram
         FROM ngt_docs LATERAL VIEW ngrams_table(text, 3) g AS pos, ngram
         ORDER BY doc_id, pos""")
      .as[(Long, Int, String)].collect().toSeq
    assert(got === Seq(
      (1L, 0, "a b c"), (1L, 1, "b c d"), (5L, 0, "p q r")))
  }

  test("ngrams_table matches the explode(ngrams(tokens)) composition on real docs") {
    GraftFunctions.registerAll(spark)
    Tables.documents(spark, sf).createOrReplaceTempView("ngt_real")
    val viaGenerator = spark.sql(
      """SELECT doc_id, g.ngram FROM ngt_real
         LATERAL VIEW ngrams_table(text, 3) g AS pos, ngram""")
    val viaArrays = Tables.documents(spark, sf)
      .select(col("doc_id"),
        explode(TextFunctions.ngrams(TextFunctions.tokens(col("text")), 3)).as("ngram"))
    assert(viaGenerator.exceptAll(viaArrays).count() === 0)
    assert(viaArrays.exceptAll(viaGenerator).count() === 0)
  }

  test("ngrams_table rejects a non-literal n at analysis") {
    GraftFunctions.registerAll(spark)
    import spark.implicits._
    Seq((1L, "a b c", 2)).toDF("doc_id", "text", "k")
      .createOrReplaceTempView("ngt_bad")
    val e = intercept[Exception] {
      spark.sql(
        """SELECT g.ngram FROM ngt_bad
           LATERAL VIEW ngrams_table(text, k) g AS pos, ngram""").collect()
    }
    assert(e.getMessage.toLowerCase.contains("ngrams_table") ||
      e.getMessage.toLowerCase.contains("foldable"))
  }

  test("HLL sketch union of daily partials within 2% of exact distinct (q57 backing)") {
    val li = Tables.lineitem(spark, sf)
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("exact"))
    val merged = li.groupBy(col("l_returnflag"), col("l_shipdate"))
      .agg(hll_sketch_agg(col("l_partkey")).as("sk"))
      .groupBy("l_returnflag")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx"))
    val joined = exact.join(merged, "l_returnflag")
      .select(col("exact").cast("double"), col("approx").cast("double"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (e, a) = (r.getDouble(0), r.getDouble(1))
      assert(math.abs(a - e) / e < 0.02, s"exact=$e approx=$a")
    }
  }

  test("theta sketch: exact below nominal entries; bounded error above (q58 backing)") {
    val li = Tables.lineitem(spark, sf)
    li.createOrReplaceTempView("li_theta_spec")
    // exact mode: lgK=16 nominal 65536 >> distinct partkeys at sf0.001
    val exactMode = spark.sql(
      """SELECT theta_sketch_estimate(theta_sketch_agg(l_partkey, 16)) AS est,
                count(DISTINCT l_partkey) AS exact
         FROM li_theta_spec""").head()
    assert(exactMode.getLong(0) === exactMode.getLong(1))
    // estimation mode: lgK=5 (32 nominal) on ~200 distinct -> sampling; the
    // estimate must still land within the sketch's error envelope (~20% at
    // this tiny k; real deployments size k for ~1%)
    val estMode = spark.sql(
      """SELECT theta_sketch_estimate(theta_sketch_agg(l_partkey, 5)) AS est,
                count(DISTINCT l_partkey) AS exact
         FROM li_theta_spec""").head()
    val (est, exact) = (estMode.getLong(0).toDouble, estMode.getLong(1).toDouble)
    assert(math.abs(est - exact) / exact < 0.25, s"exact=$exact est=$est")
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

  test("quantile sketch: one-cell error envelope and exact merge associativity (q65 backing)") {
    import graft.operators.QuantileSketch
    val lo = 0.0; val hi = 131072.0; val nb = 1024; val w = (hi - lo) / nb
    val li = Tables.lineitem(spark, sf)
    val parts = QuantileSketch.partials(li, "l_extendedprice",
      Seq("l_returnflag", "l_shipdate"), lo, hi, nb)
    val merged = QuantileSketch.merge(parts, Seq("l_returnflag"))
    val qs = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99)
    val got = QuantileSketch.quantiles(merged, Seq("l_returnflag"), qs, lo, hi, nb)
      .collect().map(r => ((r.getString(0), r.getDouble(1)), r.getDouble(3))).toMap
    // the PRECISE contract: the sketch returns the upper edge of the
    // bucket holding the rank-ceil(q*N) ORDER STATISTIC, so that order
    // statistic lies in (sketch - w, sketch]. (An INTERPOLATED percentile
    // adds an inter-rank gap on top, which no grid bounds.)
    val byFlag = li.select(col("l_returnflag").as("flag"),
        col("l_extendedprice").cast("double").as("v"))
    val ns = byFlag.groupBy("flag").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ordered = byFlag.collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    assert(got.nonEmpty && ns.nonEmpty)
    got.foreach { case ((flag, q), sk) =>
      val os = ordered(flag)(math.ceil(q * ns(flag)).toLong.toInt - 1)
      assert(os > sk - w - 1e-9 && os <= sk + 1e-9,
        s"($flag,$q): order statistic $os outside the sketch cell ($sk - $w, $sk]")
    }
    // merge associativity: per-segment partials union-merged == sketch
    // built with no segmentation at all, counter for counter
    val direct = QuantileSketch.partials(li, "l_extendedprice",
      Seq("l_returnflag"), lo, hi, nb)
      .withColumnRenamed("cnt", "cnt_direct")
    val viaMerge = merged.withColumnRenamed("cnt", "cnt_merged")
    val diff = direct.join(viaMerge, Seq("l_returnflag", "bucket"), "full_outer")
      .filter(coalesce(col("cnt_direct"), lit(-1L)) =!=
        coalesce(col("cnt_merged"), lit(-1L)))
      .count()
    assert(diff == 0, "union-merge must equal the unsegmented build exactly")
  }
}
