package graft.plans

import graft.core.Tables
import org.apache.spark.sql.{Row, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom physical operator must (a) match row_number semantics
  * exactly, (b) plan as partial-heap -> exchange -> final-heap with NO
  * Window and NO full Sort, (c) handle the group-by edge cases (null keys,
  * k larger than a group, empty input, global top-k). */
class TopKPerGroupSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def windowTwin(k: Int) = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, sf).select("o_custkey", "o_orderkey", "o_totalprice")
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k).drop("rn")
  }

  test("matches the window row_number result exactly (sf0.001 orders)") {
    for (k <- Seq(1, 3, 10)) {
      val got = TopKPerGroup(
        Tables.orders(spark, sf).select("o_custkey", "o_orderkey", "o_totalprice"),
        Seq("o_custkey"), Seq(("o_totalprice", false), ("o_orderkey", true)), k)
      assert(got.count() === windowTwin(k).count(), s"row count differs at k=$k")
      assert(got.exceptAll(windowTwin(k)).isEmpty && windowTwin(k).exceptAll(got).isEmpty,
        s"row set differs at k=$k")
    }
  }

  test("plan has the custom exec pair and no Window / full Sort") {
    val df = TopKPerGroup(
      Tables.orders(spark, sf).select("o_custkey", "o_orderkey", "o_totalprice"),
      Seq("o_custkey"), Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
    val p = df.queryExecution.executedPlan.toString
    assert("TopKPerGroup".r.findAllMatchIn(p).length >= 2,
      s"partial+final exec pair missing:\n$p")
    assert(p.contains("Exchange hashpartitioning(o_custkey"),
      s"no group-key exchange between partial and final:\n$p")
    assert(!p.contains("Window") && !p.contains("Sort "),
      s"fell back to sort/window machinery:\n$p")
  }

  test("null group keys form their own group; k > group size keeps all rows") {
    import spark.implicits._
    val df = Seq[(java.lang.Integer, Int)](
      (1, 10), (1, 20), (1, 30), (null, 5), (null, 7), (2, 1)
    ).toDF("g", "v")
    val got = TopKPerGroup(df, Seq("g"), Seq(("v", true)), 2)
      .collect().map(r => (Option(r.get(0)), r.getInt(1))).toSet
    assert(got === Set(
      (Some(1), 10), (Some(1), 20),     // top-2 ascending of group 1
      (None, 5), (None, 7),             // null group kept whole (k=2, size=2)
      (Some(2), 1)))                    // k > size -> all rows
  }

  test("empty group list = global top-k (single partition merge)") {
    import spark.implicits._
    val df = (1 to 100).toDF("v")
    val got = TopKPerGroup(df, Seq.empty, Seq(("v", false)), 5)
      .collect().map(_.getInt(0)).toSet
    assert(got === Set(100, 99, 98, 97, 96))
  }

  test("empty input yields empty output") {
    import spark.implicits._
    val df = Seq.empty[(Int, Int)].toDF("g", "v")
    assert(TopKPerGroup(df, Seq("g"), Seq(("v", true)), 3).count() === 0)
  }

  test("GraftSparkExtensions registers the strategy and the rewrite rule") {
    val ext = new SparkSessionExtensions
    new GraftSparkExtensions().apply(ext)
    // exercised through the injected builders: both extension points accept
    // a session and return the configured objects
    import org.apache.spark.sql.graftbridge.ExtensionsBridge
    assert(ExtensionsBridge.plannerStrategies(ext, spark).contains(TopKPerGroupStrategy))
    assert(ExtensionsBridge.optimizerRules(ext, spark).exists(_.isInstanceOf[RangeJoinRewrite]))
  }
}
