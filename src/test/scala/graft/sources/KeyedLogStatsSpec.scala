package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.GraftCatalog

/** Journal-carried column stats on keyedlog dirs: per-file [min,max]
  * bounds of the long-typed columns ride every write commit ("st"
  * entries), anchors accumulate them, and the scan prunes files whose
  * bounds cannot satisfy pushed comparison predicates — with NULL
  * semantics (a missing column key means all-null, prunable), pre-drift
  * interaction (files written before ADD COLUMNS prune on the new
  * column), and stats survival through compaction and row-level
  * rewrites. */
class KeyedLogStatsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    GraftCatalog.register(s, "gkls", root)
    s
  }
  private lazy val root =
    "file://" + Files.createTempDirectory("graft_klstats_").toString

  private def ensureDb(): Unit =
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gkls.db")

  /** A plain keyedlog scan plans one split per surviving file. */
  private def planned(df: org.apache.spark.sql.DataFrame): Int =
    df.rdd.getNumPartitions

  test("disjoint-band appends prune on metric bounds; results stay exact") {
    ensureDb()
    spark.sql("CREATE TABLE gkls.db.t1 (key STRING, seq BIGINT, metric BIGINT) " +
      "USING keyedlog")
    // one file per insert (coalesced input), three disjoint metric bands
    spark.range(10).selectExpr("'a' AS key", "id AS seq", "id AS metric")
      .coalesce(1).writeTo("gkls.db.t1").append()
    spark.range(10).selectExpr("'b' AS key", "id + 10 AS seq", "id + 100 AS metric")
      .coalesce(1).writeTo("gkls.db.t1").append()
    spark.range(10).selectExpr("'c' AS key", "id + 20 AS seq", "id + 200 AS metric")
      .coalesce(1).writeTo("gkls.db.t1").append()
    val t = spark.table("gkls.db.t1")
    assert(planned(t) == 3)
    assert(planned(t.filter(col("metric") >= 200L)) == 1,
      "only the third band's file may survive metric >= 200")
    assert(planned(t.filter(col("metric") < 100L)) == 1)
    assert(planned(t.filter(col("metric") === 105L)) == 1)
    assert(planned(t.filter(col("metric") > 500L)) == 0)
    // pruning must never change answers
    assert(t.filter(col("metric") >= 200L).count() == 10)
    assert(t.filter(col("metric") === 105L).count() == 1)
    assert(t.filter(col("metric") > 500L).count() == 0)
  }

  test("all-null columns prune for comparisons but never lose rows") {
    ensureDb()
    spark.sql("CREATE TABLE gkls.db.t2 (key STRING, seq BIGINT, metric BIGINT) " +
      "USING keyedlog")
    spark.sql("INSERT INTO gkls.db.t2 VALUES ('a', 1, NULL), ('a', 2, NULL)")
    spark.sql("INSERT INTO gkls.db.t2 VALUES ('b', 3, 30)")
    val t = spark.table("gkls.db.t2")
    // the all-null-metric file has no 'metric' stats key -> prunable for
    // any comparison (no NULL satisfies one)
    assert(planned(t.filter(col("metric") > 0L)) == 1)
    assert(t.filter(col("metric") > 0L).count() == 1)
    // but a non-comparison read still sees every row
    assert(t.count() == 3)
    assert(t.filter(col("metric").isNull).count() == 2)
  }

  test("pre-drift files prune on a column added later") {
    ensureDb()
    spark.sql("CREATE TABLE gkls.db.t3 (key STRING, seq BIGINT, metric BIGINT) " +
      "USING keyedlog")
    spark.sql("INSERT INTO gkls.db.t3 VALUES ('a', 1, 10), ('b', 2, 20)")
    spark.sql("ALTER TABLE gkls.db.t3 ADD COLUMNS (tag STRING, n BIGINT)")
    spark.sql("INSERT INTO gkls.db.t3 VALUES ('c', 3, 30, 'x', 7)")
    val t = spark.table("gkls.db.t3")
    assert(planned(t) >= 2) // pre-drift rows may span multiple task files
    // the pre-drift file's stats entry has no key for the BIGINT extra:
    // all-null there, so a comparison on it skips the file entirely
    assert(planned(t.filter(col("n") >= 0L)) == 1)
    assert(t.filter(col("n") >= 0L).count() == 1)
    // STRING extras carry no bounds (positional key only covers longs):
    // never pruned, still correct
    assert(t.filter(col("tag") === "x").count() == 1)
  }

  test("stats survive compaction and row-level rewrites") {
    ensureDb()
    spark.sql("CREATE TABLE gkls.db.t4 (key STRING, seq BIGINT, metric BIGINT) " +
      "USING keyedlog")
    spark.range(5).selectExpr("'lo' AS key", "id AS seq", "id AS metric")
      .coalesce(1).writeTo("gkls.db.t4").append()
    spark.range(5).selectExpr("'hi' AS key", "id + 5 AS seq", "id + 1000 AS metric")
      .coalesce(1).writeTo("gkls.db.t4").append()
    spark.sql("CALL gkls.system.compact('db.t4')")
    val t = spark.table("gkls.db.t4")
    // compaction rewrote to one clustered file per key; the rewrite entry
    // carries the freshly computed bounds, so band pruning still works
    assert(planned(t) == 2)
    assert(planned(t.filter(col("metric") >= 1000L)) == 1,
      "compacted files must keep journal-carried stats")
    assert(t.filter(col("metric") >= 1000L).count() == 5)
    // a row-level UPDATE journals its replacement file's stats too
    spark.sql("UPDATE gkls.db.t4 SET metric = metric + 10000 WHERE key = 'lo'")
    val t2 = spark.table("gkls.db.t4")
    assert(planned(t2.filter(col("metric") >= 10000L)) == 1,
      "the un-updated key's file must prune on the new bounds")
    assert(t2.filter(col("metric") >= 10000L).count() == 5)
    assert(t2.filter(col("metric") >= 1000L).count() == 10)
  }

  /** Strip every "st" field from a dir's journal markers — simulating a
    * table written by a pre-stats version of the engine. */
  private def stripStats(dir: String): Unit =
    new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("_klogv_")).foreach { m =>
        val txt = new String(Files.readAllBytes(m.toPath), "UTF-8")
        val j = org.json4s.jackson.JsonMethods.parse(txt)
          .removeField(_._1 == "st")
        Files.write(m.toPath, org.json4s.jackson.JsonMethods.compact(
          org.json4s.jackson.JsonMethods.render(j)).getBytes("UTF-8"))
      }

  test("collect_stats backfills bounds for pre-stats files without a rewrite") {
    ensureDb()
    spark.sql("CREATE TABLE gkls.db.t6 (key STRING, seq BIGINT, metric BIGINT) " +
      "USING keyedlog")
    spark.range(5).selectExpr("'a' AS key", "id AS seq", "id AS metric")
      .coalesce(1).writeTo("gkls.db.t6").append()
    spark.range(5).selectExpr("'b' AS key", "id + 5 AS seq", "id + 1000 AS metric")
      .coalesce(1).writeTo("gkls.db.t6").append()
    spark.sql("ALTER TABLE gkls.db.t6 ADD COLUMNS (n BIGINT)")
    spark.range(5).selectExpr("'c' AS key", "id + 10 AS seq",
        "id + 2000 AS metric", "id AS n")
      .coalesce(1).writeTo("gkls.db.t6").append()
    val dir = root.stripPrefix("file://") + "/db/t6"
    stripStats(dir)
    val t0 = spark.table("gkls.db.t6")
    assert(planned(t0.filter(col("metric") >= 2000L)) == 3,
      "stripped stats: nothing prunes")
    val dataBefore = new java.io.File(dir).listFiles()
      .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(f => (f.getName, f.lastModified())).sorted.toSeq
    val row = spark.sql("CALL gkls.system.collect_stats('db.t6')").head()
    assert(row.getLong(1) == 3L, s"expected 3 backfilled files, got $row")
    val t = spark.table("gkls.db.t6")
    assert(planned(t.filter(col("metric") >= 2000L)) == 1,
      "backfilled bounds must prune")
    assert(planned(t.filter(col("n") >= 0L)) == 1,
      "backfill marks pre-drift files all-null for the added column")
    assert(t.filter(col("metric") >= 2000L).count() == 5)
    // no data file was rewritten — the backfill is one journal entry
    val dataAfter = new java.io.File(dir).listFiles()
      .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(f => (f.getName, f.lastModified())).sorted.toSeq
    assert(dataAfter == dataBefore, "backfill must not touch data files")
    // idempotent: a second call finds nothing missing
    assert(spark.sql("CALL gkls.system.collect_stats('db.t6')").head()
      .getLong(1) == 0L)
    // mode => 'all' recomputes everything
    assert(spark.sql("CALL gkls.system.collect_stats('db.t6', mode => 'all')")
      .head().getLong(1) == 3L)
  }

  test("collect_stats on a pre-journal dir journals genesis names WITH bounds") {
    ensureDb()
    spark.sql("CREATE TABLE gkls.db.t7 (key STRING, seq BIGINT, metric BIGINT) " +
      "USING keyedlog")
    spark.range(4).selectExpr("'a' AS key", "id AS seq", "id AS metric")
      .coalesce(1).writeTo("gkls.db.t7").append()
    spark.range(4).selectExpr("'b' AS key", "id + 4 AS seq", "id + 100 AS metric")
      .coalesce(1).writeTo("gkls.db.t7").append()
    // simulate a pre-journal dir (hand-managed files): drop the journal
    val dir = root.stripPrefix("file://") + "/db/t7"
    new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("_klogv_"))
      .foreach(f => assert(f.delete()))
    val row = spark.sql("CALL gkls.system.collect_stats('db.t7')").head()
    assert(row.getLong(1) == 2L, s"expected 2 genesis files, got $row")
    val t = spark.table("gkls.db.t7")
    assert(planned(t.filter(col("metric") >= 100L)) == 1,
      "genesis-journaled bounds must prune")
    assert(t.filter(col("metric") >= 100L).count() == 4)
    assert(t.count() == 8)
  }

  test("IS NOT NULL prunes all-null files, including pre-drift ones") {
    ensureDb()
    spark.sql("CREATE TABLE gkls.db.t8 (key STRING, seq BIGINT, metric BIGINT) " +
      "USING keyedlog")
    spark.sql("INSERT INTO gkls.db.t8 VALUES ('a', 1, NULL), ('a', 2, NULL)")
    spark.sql("ALTER TABLE gkls.db.t8 ADD COLUMNS (n BIGINT)")
    spark.sql("INSERT INTO gkls.db.t8 VALUES ('b', 3, 30, 7)")
    val t = spark.table("gkls.db.t8")
    assert(planned(t.filter(col("metric").isNotNull)) == 1,
      "the all-null-metric file must prune under IS NOT NULL")
    assert(t.filter(col("metric").isNotNull).count() == 1)
    assert(planned(t.filter(col("n").isNotNull)) == 1,
      "pre-drift files are all-null for the added column")
    assert(t.filter(col("n").isNotNull).count() == 1)
    // IS NULL is NOT pruned (would need null counts) but stays correct
    assert(t.filter(col("metric").isNull).count() == 2)
  }

  test("key-grouped (clustered) reads prune files inside groups by bounds") {
    ensureDb()
    spark.sql("CREATE TABLE gkls.db.t9 (key STRING, seq BIGINT, metric BIGINT) " +
      "USING keyedlog")
    // two clustered writes -> per key, one file per band
    spark.range(4).selectExpr(
        "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS key",
        "id AS seq", "id AS metric")
      .writeTo("gkls.db.t9").option("clusterByKey", "true").append()
    spark.range(4).selectExpr(
        "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS key",
        "id + 4 AS seq", "id + 1000 AS metric")
      .writeTo("gkls.db.t9").option("clusterByKey", "true").append()
    val prev = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    try {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      val t = spark.table("gkls.db.t9")
      // key-grouped: one partition per key (2), whatever the file count
      assert(planned(t) == 2, s"expected 2 key groups, got ${planned(t)}")
      // a band filter keeps the grouping but halves each group's files;
      // group count is unchanged (all keys still have matching files)
      assert(planned(t.filter(col("metric") >= 1000L)) == 2)
      assert(t.filter(col("metric") >= 1000L).count() == 4)
      // group-level pruning: a filter only the null-key group could miss
      // drops nothing here, but a band NO file satisfies drops ALL groups
      assert(planned(t.filter(col("metric") > 100000L)) == 0)
      // the shuffle-free key aggregation still answers exactly under a
      // band filter (partitioning and splits come from the same lazy
      // resolution, so they cannot desync)
      val agg = t.filter(col("metric") >= 1000L).groupBy("key").count()
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(agg == Map("a" -> 2L, "b" -> 2L), agg.toString)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.v2.bucketing.enabled", v)
      case None => spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
    }
  }

  test("pre-stats journal entries leave files unpruned (never wrong)") {
    ensureDb()
    spark.sql("CREATE TABLE gkls.db.t5 (key STRING, seq BIGINT, metric BIGINT) " +
      "USING keyedlog")
    spark.range(3).selectExpr("'a' AS key", "id AS seq", "id AS metric")
      .coalesce(1).writeTo("gkls.db.t5").append()
    // simulate a pre-stats writer: strip "st" from the journal entry
    val dir = root.stripPrefix("file://") + "/db/t5"
    val marker = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("_klogv_")).minBy(_.getName)
    val txt = new String(Files.readAllBytes(marker.toPath), "UTF-8")
    val stripped = org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(
        org.json4s.jackson.JsonMethods.parse(txt).removeField(_._1 == "st")))
    Files.write(marker.toPath, stripped.getBytes("UTF-8"))
    val t = spark.table("gkls.db.t5")
    assert(planned(t.filter(col("metric") > 100L)) == 1,
      "a file without journaled stats must never be pruned")
    assert(t.filter(col("metric") > 100L).count() == 0)
    assert(t.filter(col("metric") <= 2L).count() == 3)
  }
}
