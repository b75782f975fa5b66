package graft

import java.sql.Timestamp

import graft.core.{LakeConfig, LakePath}
import graft.operators.{RangeJoin, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Randomized equivalence properties: composite operators must agree with
  * their naive reference formulations on arbitrary inputs, not just the
  * driver fixtures. */
class PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
  import spark.implicits._

  private def check(p: Prop, n: Int = 100): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(r.passed, r.status.toString)
  }

  test("property: URL codec round-trips single-segment object names") {
    val cfg = LakeConfig(root = "file:///x", namespace = "ns", bucket = "bkt")
    val name = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    check(Prop.forAll(name) { n =>
      LakePath.bucketAndFile(LakePath.fullUrl(cfg, n)).contains(("bkt", n))
    })
  }

  test("property: multi-segment names truncate to the first segment") {
    val cfg = LakeConfig(root = "file:///x", bucket = "bkt")
    val seg = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val multi = for { a <- seg; b <- seg } yield (a, s"$a/$b")
    check(Prop.forAll(multi) { case (head, full) =>
      LakePath.bucketAndFile(LakePath.fullUrl(cfg, full)).contains(("bkt", head))
    })
  }

  test("percent-encoded object names stay one (encoded) segment") {
    // ref parses the raw URI path: a%2Fb.json must NOT decode to a/b.json
    // and truncate to "a" (OCIClient.getBucketAndFilenameFromURI semantics)
    val cfg = LakeConfig(root = "file:///x", namespace = "ns", bucket = "bkt")
    assert(LakePath.bucketAndFile(LakePath.fullUrl(cfg, "a%2Fb.json"))
      .contains(("bkt", "a%2Fb.json")))
  }

  test("TopKByScore ranks NaN scores first, matching Spark NaN-largest sort") {
    val scored = Seq((1L, 10L, Double.NaN), (1L, 11L, 0.9), (1L, 12L, 0.8),
      (1L, 13L, Double.NaN)).toDF("q_id", "id", "cosine")
    val topk = udaf(new Similarity.TopKByScore(3),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Similarity.Scored]())
    val viaAgg = scored.groupBy(col("q_id"))
      .agg(topk(col("id"), col("cosine")).as("top"))
      .select(posexplode(col("top"))).select(col("col.id"))
      .as[Long].collect().toSeq
    // Spark orders NaN as largest: window formulation yields 10, 13, 11
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("id"))
    val viaWindow = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3).orderBy("rank").select(col("id"))
      .as[Long].collect().toSeq
    assert(viaAgg === viaWindow)
    assert(viaAgg === Seq(10L, 13L, 11L))
  }

  test("TopKByScore treats -0.0 and 0.0 as ties, matching SQL sort") {
    // Spark sort (SQLOrderingUtil.compareDoubles) ties signed zeros, so the
    // id tiebreak decides; raw Double.compare would rank 0.0 above -0.0
    val scored = Seq((1L, 10L, -0.0), (1L, 11L, 0.0)).toDF("q_id", "id", "cosine")
    val topk = udaf(new Similarity.TopKByScore(1),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Similarity.Scored]())
    val viaAgg = scored.groupBy(col("q_id"))
      .agg(topk(col("id"), col("cosine")).as("top"))
      .select(posexplode(col("top"))).select(col("col.id"))
      .as[Long].collect().toSeq
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("id"))
    val viaWindow = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") === 1).select(col("id")).as[Long].collect().toSeq
    assert(viaAgg === viaWindow)
    assert(viaAgg === Seq(10L))
  }

  test("bucketed range join == naive theta join on random timestamps") {
    // another suite sharing this session may have installed the
    // RangeJoinRewrite rule; strip it so the naive side really is naive
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations
        .filterNot(_.isInstanceOf[graft.plans.RangeJoinRewrite])
    val rnd = new scala.util.Random(42)
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val left = (1 to 300).map(i => (i.toLong, new Timestamp(base + rnd.nextInt(3600_000))))
      .toDF("l_id", "l_ts")
    val right = (1 to 300).map(i => (i.toLong, new Timestamp(base + rnd.nextInt(3600_000))))
      .toDF("r_id", "r_ts")
    val win = 137L // deliberately not aligned to anything
    val bucketed = RangeJoin.timeWindowJoin(left, right, "l_ts", "r_ts", win)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    val naive = left.join(right,
        col("r_ts") >= col("l_ts") &&
        col("r_ts") < col("l_ts") + expr(s"INTERVAL $win SECONDS"))
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    assert(bucketed === naive)
    assert(naive.nonEmpty)
  }

  test("asOf (union+window) == naive greatest-preceding lookup on random data") {
    import java.sql.Timestamp
    import graft.operators.AsOfJoin
    val rnd = new scala.util.Random(23)
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    // coarse timestamps force plenty of exact-tie collisions
    def t() = new Timestamp(base + rnd.nextInt(200) * 60000L)
    val left = (1 to 400).map(i => (i.toLong, i % 7L, t())).toDF("l_id", "k", "lt")
    val right = (1 to 300).map(i => (i.toLong, i % 7L, t(), rnd.nextInt(100).toDouble))
      .toDF("rid", "k", "rt", "v")
    val got = AsOfJoin.asOf(left, right, "k", "lt", "rt", Seq("v"), Some("rid"))
      .select("l_id", "asof_v").as[(Long, Option[Double])].collect().toMap
    // naive reference: per left row, the max-(rt, rid) preceding right row
    val rightRows = right.as[(Long, Long, Timestamp, Double)].collect()
    left.as[(Long, Long, Timestamp)].collect().foreach { case (lId, k, lt) =>
      val candidates = rightRows.filter(r => r._2 == k && !r._3.after(lt))
      val expect = if (candidates.isEmpty) None
        else Some(candidates.maxBy(r => (r._3.getTime, r._1))._4)
      assert(got(lId) === expect, s"l_id=$lId")
    }
  }

  test("distributed prefix-sum packing == naive global-window cumsum") {
    import graft.operators.Packing
    val rnd = new scala.util.Random(31)
    val df = (1 to 5000).map(i => (i.toLong, (1 + rnd.nextInt(500)).toLong))
      .toDF("id", "w")
    val got = Packing.packBudget(df, "id", "w", budget = 1000L, numPartitions = 7)
      .select("id", "cum", "pack_id").as[(Long, Long, Long)].collect()
      .map { case (id, c, p) => id -> ((c, p)) }.toMap
    // naive reference: driver-side running sum in id order
    val weights = df.orderBy("id").as[(Long, Long)].collect()
    var cum = 0L
    weights.foreach { case (id, w) =>
      cum += w
      val (gcum, gpack) = got(id)
      assert(gcum === cum, s"cum mismatch at id=$id")
      assert(gpack === (cum - w) / 1000L, s"pack mismatch at id=$id")
    }
    // the running-sum window must be partition-local (parallel), not global
    val plan = Packing.packBudget(df, "id", "w", 1000L, 7)
      .queryExecution.executedPlan.toString
    assert(plan.contains("windowspecdefinition(_pid"),
      s"prefix sum not partition-local:\n$plan")
  }

  test("TopKByScore aggregator == window row_number on random scores w/ ties") {
    val rnd = new scala.util.Random(7)
    // coarse scores force plenty of ties -> exercises the (score, id) order
    val scored = (1 to 2000).map(i =>
      (i % 13L, i.toLong, (rnd.nextInt(10) / 10.0)))
      .toDF("q_id", "id", "cosine")
    val topk = udaf(new Similarity.TopKByScore(5),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Similarity.Scored]())
    val viaAgg = scored.groupBy(col("q_id"))
      .agg(topk(col("id"), col("cosine")).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), (col("pos") + 1).as("rank"), col("col.id").as("id"))
      .as[(Long, Long, Long)].collect().toSet
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("id"))
    val viaWindow = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("rank").cast("long"), col("id"))
      .as[(Long, Long, Long)].collect().toSet
    assert(viaAgg === viaWindow)
  }

  test("property: TopKPerGroup physical operator == window row_number on random data") {
    // random multisets with heavy duplicate values (ties broken by id),
    // nullable group keys, random k and partitioning
    val rows = Gen.listOfN(200, for {
      g <- Gen.oneOf(Gen.choose(0, 5).map(Option(_)), Gen.const(Option.empty[Int]))
      v <- Gen.choose(0, 9) // few distinct values -> constant tie pressure
    } yield (g, v))
    val params = for { r <- rows; k <- Gen.choose(1, 7); p <- Gen.choose(1, 6) }
      yield (r, k, p)
    check(Prop.forAll(params) { case (data, k, parts) =>
      val df = data.zipWithIndex
        .map { case ((g, v), i) =>
          (g.map(x => java.lang.Long.valueOf(x.toLong)).orNull, v.toLong, i.toLong) }
        .toDF("g", "v", "id").repartition(parts)
      val got = graft.plans.TopKPerGroup(df, Seq("g"),
          Seq(("v", false), ("id", true)), k)
        .select("g", "v", "id").collect()
        .map(r => (Option(r.get(0)), r.getLong(1), r.getLong(2))).toSet
      val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id"))
      val want = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
        .select("g", "v", "id").collect()
        .map(r => (Option(r.get(0)), r.getLong(1), r.getLong(2))).toSet
      got == want
    }, n = 25)
  }

  test("property: exact heavy hitters == naive count-filter on random corpora") {
    // random zipf-ish corpora with random partitioning; MG guarantee keeps
    // the verified result partition-invariant and exact
    val params = for {
      nWords <- Gen.choose(5, 40)
      reps <- Gen.listOfN(nWords, Gen.choose(1, 120))
      parts <- Gen.choose(1, 8)
    } yield (reps, parts)
    check(Prop.forAll(params) { case (reps, parts) =>
      val rows = reps.zipWithIndex.flatMap { case (r, i) => List.fill(r)(s"w$i") }
      val n = rows.size
      val minFrac = 0.05
      val df = scala.util.Random.shuffle(rows).toDF("item").repartition(parts)
      val got = graft.operators.HeavyHitters.exact(df, "item", minFrac, capacity = 64)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val threshold = math.ceil(minFrac * n).toLong
      val want = rows.groupBy(identity).view.mapValues(_.size.toLong)
        .filter(_._2 >= threshold).toSet
      got == want
    }, n = 20)
  }
}
