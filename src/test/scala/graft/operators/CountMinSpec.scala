package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Count-min sketch: never undercounts, overcount bounded by the CMS
  * guarantee, partition-invariant, absent keys estimate from empty cells. */
class CountMinSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def tokens = {
    import spark.implicits._
    // zipfian-ish: key i appears ~200/i times
    (1 to 50).flatMap(i => Seq.fill(200 / i)(s"key$i")).toDF("k")
  }

  test("estimates never undercount and respect the 2N/w error bound") {
    import spark.implicits._
    val df = tokens
    val n = df.count()
    val width = 256
    val cells = CountMin.sketch(df, "k", depth = 4, width = width)
    val truth = df.groupBy("k").agg(count(lit(1)).as("true_cnt"))
    val est = CountMin.estimate(cells, truth, "k", depth = 4, width = width)
      .select($"k", $"true_cnt", $"est".as("est_cnt")).collect()
    est.foreach { r =>
      val (t, e) = (r.getLong(1), r.getLong(2))
      assert(e >= t, s"${r.getString(0)}: CMS undercounted $e < $t")
      assert(e - t <= 2 * n / width,
        s"${r.getString(0)}: overcount ${e - t} above 2N/w = ${2 * n / width}")
    }
  }

  test("cell table is partition-invariant and capped at depth*width rows") {
    val a = CountMin.sketch(tokens.repartition(13), "k", depth = 3, width = 64)
    val b = CountMin.sketch(tokens.repartition(1), "k", depth = 3, width = 64)
    val sa = a.collect().map(_.toSeq).toSet
    assert(sa === b.collect().map(_.toSeq).toSet)
    assert(sa.size <= 3 * 64)
    assert(sa.forall(_.head.asInstanceOf[Int] < 3))
  }

  test("a key the sketch never saw estimates 0 when its cells are empty") {
    import spark.implicits._
    // singleton corpus: all other cells empty -> unseen key hits empty cells
    val cells = CountMin.sketch(Seq("only").toDF("k"), "k", depth = 4, width = 1024)
    val est = CountMin.estimate(cells, Seq("definitely-absent").toDF("k"), "k",
      depth = 4, width = 1024).head()
    assert(est.getLong(1) === 0L)
  }
}
