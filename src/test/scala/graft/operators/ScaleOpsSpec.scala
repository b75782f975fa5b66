package graft.operators

import graft.core.{LakeCompaction, Tables}
import graft.functions.GraftFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-path operators: salted skew join equivalence, bronze compaction,
  * SQL function registry. */
class ScaleOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("salted join returns exactly the rows of the plain join") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val ord = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val plain = li.join(ord, Seq("l_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
      .collect().map(_.toSeq).toSet
    val salted = SkewJoin.saltedJoin(li, ord, "l_orderkey", saltFactor = 7)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
      .collect().map(_.toSeq).toSet
    assert(salted === plain)
  }

  test("salted join spreads a hot key over multiple partitions") {
    import spark.implicits._
    // 10k rows of ONE key — the pathological tenant
    val hot = (1 to 10000).map(i => ("hot", i.toLong)).toDF("k", "v")
    val dim = Seq(("hot", "dim-value")).toDF("k", "label")
    val parts = SkewJoin.saltedJoin(hot, dim, "k", saltFactor = 8)
      .groupBy(spark_partition_id()).count().count()
    assert(parts > 1, "hot key stayed on one partition")
  }

  test("compaction rewrites small files and preserves data") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_").toString
    // simulate the publish small-file storm: 40 tiny files
    Tables.orders(spark, sf).repartition(40).write.mode("overwrite").parquet(dir)
    val beforeRows = spark.read.parquet(dir).count()
    val beforeSum = spark.read.parquet(dir).agg(sum("o_totalprice")).head().getDouble(0)
    val (nBefore, nAfter) = LakeCompaction.compactParquet(spark, dir)
    assert(nBefore > 30)
    assert(nAfter === 1) // tiny data -> one target file
    assert(spark.read.parquet(dir).count() === beforeRows)
    val afterSum = spark.read.parquet(dir).agg(sum("o_totalprice")).head().getDouble(0)
    assert(math.abs(afterSum - beforeSum) < 1e-6)
  }

  test("AQE splits a skewed join partition at runtime (skew=true in plan)") {
    // the runtime complement to saltedJoin: AQE detects the oversized
    // post-shuffle partition and splits it into parallel sub-joins with
    // no query rewrite. Local thresholds sized down from cluster defaults.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.adaptive.forceOptimizeSkewedJoin",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      import spark.implicits._
      // one hot key dominating the shuffle + a spread of cold keys
      val left = ((1 to 50000).map(i => ("hot", i.toLong)) ++
        (1 to 500).map(i => (s"k$i", i.toLong))).toDF("k", "v")
      val right = (("hot" +: (1 to 500).map(i => s"k$i")).map(k => (k, s"dim_$k")))
        .toDF("k", "label")
      val joined = left.join(right, "k").groupBy("label").count()
      // execute THIS QueryExecution (df.count() would spawn its own) so the
      // adaptive plan finalizes and carries the runtime skew annotation
      assert(joined.queryExecution.toRdd.count() === 501)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), s"AQE did not mark the skewed join:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("observe(): in-flight data-quality metrics without a second scan") {
    // the monitoring hook a pipeline attaches to every stage: row counts /
    // sums ride along with the action instead of re-running the query
    val obs = new org.apache.spark.sql.Observation("stage_metrics")
    val df = Tables.lineitem(spark, sf)
      .observe(obs, count(lit(1)).as("rows_seen"),
        sum(col("l_quantity")).as("qty_sum"),
        count(when(col("l_quantity").isNull, 1)).as("null_qty"))
      .filter(col("l_quantity") > 0)
    val kept = df.count()
    val m = obs.get
    assert(m("rows_seen").asInstanceOf[Long] >= kept)
    assert(m("null_qty") === 0L)
    val direct = Tables.lineitem(spark, sf).agg(sum("l_quantity")).head().getDouble(0)
    assert(math.abs(m("qty_sum").asInstanceOf[Double] - direct) < 1e-6)
  }

  test("SQL registry: vec_dot/cosine_sim/vec_norm/hl7_msh9 callable from SQL") {
    GraftFunctions.registerAll(spark)
    import spark.implicits._
    Seq((Array(3.0f, 4.0f), Array(3.0f, 4.0f))).toDF("a", "b").createOrReplaceTempView("v")
    val r = spark.sql(
      "SELECT vec_dot(a,b) d, cosine_sim(a,b) c, vec_norm(a) n FROM v").head()
    assert(r.getDouble(0) === 25.0)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    assert(r.getDouble(2) === 5.0)
    val h = spark.sql(
      """SELECT hl7_msh9('MSH|^~\\&|a|b|c|d|e||ADT^A01|x|y|z') m""").head()
    assert(h.getStruct(0).getString(0) === "ADT")
  }
}
