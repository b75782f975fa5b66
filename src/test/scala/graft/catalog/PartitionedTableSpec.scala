package graft.catalog

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{FileStats, ManifestTable}

/** `PARTITIONED BY (identity / years / months / days / hours / truncate)`
  * on manifest tables — declarative partition transforms implemented as
  * range-clustered writes: every data file covers a narrow DISJOINT slice
  * of the partition source columns, so the log's stats prune partitions
  * at plan time through the ordinary data-skipping layer (no second
  * partition-tuple metadata channel, and predicates on the RAW column
  * prune without transform rewriting). */
class PartitionedTableSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    GraftCatalog.register(s, "gpt", root)
    s
  }
  private lazy val root =
    "file://" + Files.createTempDirectory("graft_catalog_part_").toString

  private def ensureDb(): Unit =
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gpt.db")

  private def dir(t: String): String = s"$root/db/$t"

  private def state(t: String): ManifestTable.TableState =
    ManifestTable.state(dir(t), ManifestTable.currentVersion(dir(t)).get)

  /** Per-file (min, max) bounds of `col`, one pair per file with stats. */
  private def bounds(t: String, col: String): Seq[(FileStats.StatVal, FileStats.StatVal)] = {
    val st = state(t)
    st.files.flatMap(f => st.stats.get(f).flatMap(_.col(col)))
      .flatMap(c => for (mn <- c.min; mx <- c.max) yield (mn, mx))
  }

  private def disjoint(ranges: Seq[(FileStats.StatVal, FileStats.StatVal)]): Boolean = {
    val sorted = ranges.sortWith((a, b) => FileStats.compare(a._1, b._1).get < 0)
    sorted.sliding(2).forall {
      case Seq((_, mx), (mn2, _)) => FileStats.compare(mx, mn2).get <= 0
      case _                      => true
    }
  }

  test("days(ts) writes land range-clustered: disjoint per-file ts slices") {
    ensureDb()
    spark.sql("CREATE TABLE gpt.db.ev (ts TIMESTAMP, user_id BIGINT) " +
      "USING manifest PARTITIONED BY (days(ts))")
    // unsorted input spanning 40 days; the write must cluster it. AQE
    // right-sizes the range shuffle's output — at test scale it coalesces
    // everything into ONE (perfectly clustered) file, so switch it off
    // for the insert to observe several files' DISJOINTNESS, which is
    // the property under test
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      spark.sql("""INSERT INTO gpt.db.ev
        SELECT timestampadd(HOUR, CAST(hash(id) % 960 AS INT) + 960,
                 TIMESTAMP'2024-01-01 00:00:00') AS ts, id AS user_id
        FROM range(20000)""")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val r = bounds("ev", "ts")
    assert(r.length >= 2, "the range shuffle must produce multiple files")
    assert(disjoint(r), s"per-file ts ranges must be disjoint: $r")
    // declared transform round-trips through the descriptor and SHOW
    assert(spark.table("gpt.db.ev").count() === 20000L)
    val props = spark.sql("SHOW TBLPROPERTIES gpt.db.ev").collect()
      .map(row => (row.getString(0), row.getString(1))).toMap
    assert(props("graft.partitioning") === "days(ts)")
    // a one-day window answers exactly (pruning is proved by
    // StatsSkippingSpec machinery; disjointness above is what unlocks it)
    val day = spark.sql("SELECT count(*) FROM gpt.db.ev " +
      "WHERE ts >= TIMESTAMP'2024-02-10 00:00:00' AND ts < TIMESTAMP'2024-02-11 00:00:00'")
      .head().getLong(0)
    val expected = spark.sql("SELECT count(*) FROM range(20000) " +
      "WHERE timestampadd(HOUR, CAST(hash(id) % 960 AS INT) + 960, " +
      "TIMESTAMP'2024-01-01 00:00:00') BETWEEN TIMESTAMP'2024-02-10 00:00:00' " +
      "AND TIMESTAMP'2024-02-10 23:59:59'").head().getLong(0)
    assert(day === expected)
  }

  test("t.partitions labels transform value spans; DML rewrite re-clusters") {
    ensureDb()
    spark.sql("CREATE TABLE gpt.db.evp (ts TIMESTAMP, v BIGINT) " +
      "USING manifest PARTITIONED BY (days(ts))")
    spark.sql("""INSERT INTO gpt.db.evp
      SELECT timestampadd(MINUTE, CAST(id AS INT), TIMESTAMP'2024-03-01 00:00:00'), id
      FROM range(4320)""") // three days, minute grain
    val labels = spark.sql("SELECT partition FROM gpt.db.evp.partitions")
      .collect().map(_.getString(0)).toSeq
    assert(labels.forall(_.startsWith("ts_day=")), s"labels: $labels")
    assert(labels.exists(_.contains("2024-03-01")), s"labels: $labels")
    // a group-based UPDATE must keep the layout clustered (the rewrite
    // declares an ordered distribution on the partition source columns)
    spark.sql("UPDATE gpt.db.evp SET v = v + 1 WHERE v % 97 = 0")
    assert(disjoint(bounds("evp", "ts")),
      "the DML rewrite must preserve disjoint per-file ts slices")
    assert(spark.table("gpt.db.evp").count() === 4320L)
  }

  test("t.partitions composes labels across ALL transforms, not just the first") {
    ensureDb()
    spark.sql("CREATE TABLE gpt.db.evmulti (ts TIMESTAMP, lang STRING, v BIGINT) " +
      "USING manifest PARTITIONED BY (days(ts), lang)")
    spark.sql("""INSERT INTO gpt.db.evmulti
      SELECT timestampadd(MINUTE, CAST(id AS INT), TIMESTAMP'2024-03-01 00:00:00'),
             element_at(array('de','en'), CAST(id % 2 + 1 AS INT)), id
      FROM range(2880)""") // two days, two languages
    val labels = spark.sql("SELECT partition FROM gpt.db.evmulti.partitions")
      .collect().map(_.getString(0)).toSeq
    // every label must carry BOTH dimensions: <day segment>/<lang segment>
    assert(labels.nonEmpty)
    assert(labels.forall(l => l.startsWith("ts_day=") &&
        l.contains("/lang_identity=")),
      s"labels must compose both transforms: $labels")
  }

  test("partition-spec evolution: days -> hours is metadata-only; pruning and labels span both specs") {
    ensureDb()
    // AQE wraps the physical plan and hides BatchScanExec from collect —
    // plan each probe with it off (plan-shape inspection only)
    def plannedFiles(sql: String): Seq[String] = {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try spark.sql(sql).queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
      }.flatMap {
        case ms: ManifestStreamScan => ms.inner.fileIndex.inputFiles.toSeq
        case ps: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan =>
          ps.fileIndex.inputFiles.toSeq
        case _ => Seq.empty
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
    spark.sql("CREATE TABLE gpt.db.evo (ts TIMESTAMP, v BIGINT) " +
      "USING manifest PARTITIONED BY (days(ts))")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      spark.sql("""INSERT INTO gpt.db.evo
        SELECT timestampadd(MINUTE, CAST(id AS INT), TIMESTAMP'2024-03-01 00:00:00'), id
        FROM range(4320)""") // three days under the days() spec
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val oldFiles = state("evo").files.toSet
    // EVOLVE the spec: metadata-only — zero files rewritten
    val res = spark.sql("CALL gpt.system.set_partitioning('db.evo', 'hours(ts)')")
      .head().getString(0)
    assert(res === "hours(ts)")
    assert(state("evo").files.toSet === oldFiles,
      "spec evolution must not rewrite any data file")
    val props = spark.sql("SHOW TBLPROPERTIES gpt.db.evo").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(props("graft.partitioning") === "hours(ts)")
    // new writes cluster under the NEW spec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      spark.sql("""INSERT INTO gpt.db.evo
        SELECT timestampadd(MINUTE, CAST(id AS INT), TIMESTAMP'2024-03-10 00:00:00'),
               id + 10000
        FROM range(1440)""") // one day under the hours() spec
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val newFiles = state("evo").files.toSet -- oldFiles
    assert(newFiles.nonEmpty)
    assert(disjoint(bounds("evo", "ts")),
      "mixed-spec layout keeps disjoint per-file ts slices")
    // pruning spans BOTH specs through the same source-column stats:
    // an hour window over the old slice prunes every new file (and the
    // old files outside that day); one over the new slice prunes every
    // old file. Both answer exactly.
    val all = plannedFiles("SELECT * FROM gpt.db.evo")
    val oldHour = spark.sql("SELECT count(*) AS n FROM gpt.db.evo " +
      "WHERE ts >= TIMESTAMP'2024-03-02 05:00:00' AND ts < TIMESTAMP'2024-03-02 06:00:00'")
    assert(oldHour.head().getLong(0) === 60L)
    val pOld = plannedFiles("SELECT * FROM gpt.db.evo " +
      "WHERE ts >= TIMESTAMP'2024-03-02 05:00:00' AND ts < TIMESTAMP'2024-03-02 06:00:00'")
    assert(pOld.nonEmpty && pOld.size < all.size,
      s"old-slice window must prune: ${pOld.size} of ${all.size}")
    assert(pOld.forall(f => !newFiles.exists(nf => f.endsWith(nf))),
      "old-slice window must prune every new-spec file")
    val pNew = plannedFiles("SELECT * FROM gpt.db.evo " +
      "WHERE ts >= TIMESTAMP'2024-03-10 05:00:00' AND ts < TIMESTAMP'2024-03-10 06:00:00'")
    assert(pNew.nonEmpty && pNew.forall(f => !oldFiles.exists(of => f.endsWith(of))),
      "new-slice window must prune every old-spec file")
    // whole-table read across both specs stays exact
    assert(spark.table("gpt.db.evo").count() === 5760L)
    // t.partitions labels the whole layout under the NEW spec: evolved-
    // away files show hour SPANS (the compact-me signal), new files land
    // tight
    val labels = spark.sql("SELECT partition FROM gpt.db.evo.partitions")
      .collect().map(_.getString(0)).toSeq
    assert(labels.nonEmpty && labels.forall(_.startsWith("ts_hour=")), s"labels: $labels")
    assert(labels.exists(_.contains("..")),
      s"old day-clustered files must label as hour spans: $labels")
    // truncate + bare identity survive the top-level-comma split
    // (truncate(3, s) carries a comma INSIDE its parens)
    spark.sql("CREATE TABLE gpt.db.evt (s STRING, k BIGINT) USING manifest")
    val tr = spark.sql(
      "CALL gpt.system.set_partitioning('db.evt', 'truncate(3, s), k')")
      .head().getString(0)
    assert(tr === "truncate(3, s), k", s"truncate spec mangled: $tr")
    // guards: unknown column, bucketed tables
    intercept[Exception] {
      spark.sql("CALL gpt.system.set_partitioning('db.evo', 'hours(nope)')").collect()
    }
    spark.sql("CREATE TABLE gpt.db.evob (k BIGINT, s STRING) " +
      "USING manifest PARTITIONED BY (bucket(4, k))")
    val eb = intercept[Exception] {
      spark.sql("CALL gpt.system.set_partitioning('db.evob', 'days(s)')").collect()
    }
    assert(eb.getMessage.contains("bucket"), s"wrong error: ${eb.getMessage}")
  }

  test("identity + truncate transforms; CTAS; compact keeps clustering") {
    ensureDb()
    spark.sql("CREATE TABLE gpt.db.langs (lang STRING, doc_id BIGINT) " +
      "USING manifest PARTITIONED BY (lang)") // bare column = identity
    spark.sql("INSERT INTO gpt.db.langs " +
      "SELECT element_at(array('de','en','fr','ja'), CAST(id % 4 + 1 AS INT)), id " +
      "FROM range(8000)")
    assert(disjoint(bounds("langs", "lang")))
    val parts = spark.sql("SELECT partition, n_files FROM gpt.db.langs.partitions")
      .collect().map(r => r.getString(0)).toSeq
    assert(parts.forall(_.startsWith("lang_identity=")), s"labels: $parts")
    // truncate(2, s): prefix clustering on strings
    spark.sql("CREATE TABLE gpt.db.pre (s STRING, n BIGINT) " +
      "USING manifest PARTITIONED BY (truncate(2, s))")
    spark.sql("INSERT INTO gpt.db.pre SELECT concat(chr(97 + CAST(id % 16 AS INT)), " +
      "'x', id), id FROM range(4000)")
    assert(disjoint(bounds("pre", "s")))
    // CTAS carries the transform; compact defaults to the declared layout
    spark.sql("CREATE TABLE gpt.db.langs2 USING manifest PARTITIONED BY (lang) " +
      "AS SELECT * FROM gpt.db.langs")
    assert(disjoint(bounds("langs2", "lang")))
    spark.sql("INSERT INTO gpt.db.langs2 SELECT 'zz', id FROM range(10)")
    spark.sql("CALL gpt.system.compact('db.langs2')")
    assert(disjoint(bounds("langs2", "lang")),
      "compact must re-cluster on the declared partition columns")
    assert(spark.table("gpt.db.langs2").count() === 8010L)
  }

  test("partition-column DDL guards: drop rejected, rename follows, bad specs reject") {
    ensureDb()
    spark.sql("CREATE TABLE gpt.db.guard (ts TIMESTAMP, v BIGINT) " +
      "USING manifest PARTITIONED BY (months(ts))")
    spark.sql("INSERT INTO gpt.db.guard VALUES (TIMESTAMP'2024-05-05 10:00:00', 1)")
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE gpt.db.guard DROP COLUMN ts")
    }
    assert(e.getMessage.contains("partition column"))
    spark.sql("ALTER TABLE gpt.db.guard RENAME COLUMN ts TO event_ts")
    spark.sql("INSERT INTO gpt.db.guard VALUES (TIMESTAMP'2024-06-06 10:00:00', 2)")
    assert(spark.sql("SELECT count(*) FROM gpt.db.guard WHERE event_ts IS NOT NULL")
      .head().getLong(0) === 2L)
    assert(spark.sql("SHOW TBLPROPERTIES gpt.db.guard").collect()
      .exists(r => r.getString(0) == "graft.partitioning" &&
        r.getString(1) == "months(event_ts)"))
    // type/provider misuse rejects loudly
    val e2 = intercept[Exception] {
      spark.sql("CREATE TABLE gpt.db.bad1 (s STRING, n BIGINT) " +
        "USING manifest PARTITIONED BY (days(s))")
    }
    assert(e2.getMessage.contains("date/timestamp"))
    val e3 = intercept[Exception] {
      spark.sql("CREATE TABLE gpt.db.bad2 (k STRING, ts TIMESTAMP, v BINARY) " +
        "USING keyedlog PARTITIONED BY (days(ts))")
    }
    assert(e3.getMessage.toLowerCase.contains("partitioned by"))
  }
}
