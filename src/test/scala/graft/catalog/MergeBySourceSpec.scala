package graft.catalog

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** `MERGE ... WHEN NOT MATCHED BY SOURCE` — the arm a CDC replica needs
  * to delete/age target rows absent from the source. Spark 4.1's
  * analyzer plans the by-source arms against the existing row-level
  * contracts, so all three DML paths serve them with no connector
  * change: manifest group-based copy-on-write, manifest merge-on-read
  * (SupportsDelta), and the keyedlog row-level rewrite. Covered under
  * the oracle gate by qc50 (both manifest paths) and qk08 (keyedlog). */
class MergeBySourceSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("NOT MATCHED BY SOURCE arms on manifest CoW, merge-on-read, and keyedlog") {
    val root = java.nio.file.Files.createTempDirectory("graft_mbs_").toString
    GraftCatalog.register(spark, "gmbs", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gmbs.db")
    // manifest (CoW)
    spark.sql("CREATE TABLE gmbs.db.t (k BIGINT, v STRING) USING manifest")
    spark.sql("INSERT INTO gmbs.db.t VALUES (1,'a'), (2,'b'), (3,'c')")
    spark.sql("SELECT * FROM (VALUES (2L,'B2'), (9L,'I9')) AS s(k, v)")
      .createOrReplaceTempView("mbs_src")
    spark.sql("""MERGE INTO gmbs.db.t t USING mbs_src s ON t.k = s.k
                 WHEN MATCHED THEN UPDATE SET v = s.v
                 WHEN NOT MATCHED THEN INSERT *
                 WHEN NOT MATCHED BY SOURCE AND k = 1 THEN DELETE
                 WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = 'stale'""")
    val got = spark.sql("SELECT k, v FROM gmbs.db.t ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    println(s"MANIFEST RESULT: $got")
    assert(got == Seq((2L, "B2"), (3L, "stale"), (9L, "I9")))
    // merge-on-read manifest
    spark.sql("CREATE TABLE gmbs.db.m (k BIGINT, v STRING) USING manifest " +
      "TBLPROPERTIES ('graft.dml.mode'='merge-on-read')")
    spark.sql("INSERT INTO gmbs.db.m VALUES (1,'a'), (2,'b'), (3,'c')")
    spark.sql("""MERGE INTO gmbs.db.m t USING mbs_src s ON t.k = s.k
                 WHEN MATCHED THEN UPDATE SET v = s.v
                 WHEN NOT MATCHED THEN INSERT *
                 WHEN NOT MATCHED BY SOURCE AND k = 1 THEN DELETE
                 WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = 'stale'""")
    val gotM = spark.sql("SELECT k, v FROM gmbs.db.m ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    println(s"MOR RESULT: $gotM")
    assert(gotM == Seq((2L, "B2"), (3L, "stale"), (9L, "I9")))
    // keyedlog
    spark.sql("CREATE TABLE gmbs.db.kl (key STRING, seq BIGINT, metric BIGINT) " +
      "USING keyedlog PARTITIONED BY (bucket(2, key))")
    spark.sql("INSERT INTO gmbs.db.kl VALUES ('a',1,10), ('b',2,20), ('c',3,30)")
    spark.sql("SELECT * FROM (VALUES ('b', 2L, 222L), ('d', 9L, 90L)) " +
      "AS s(key, seq, metric)").createOrReplaceTempView("mbs_kl_src")
    spark.sql("""MERGE INTO gmbs.db.kl t USING mbs_kl_src s
                 ON t.key = s.key AND t.seq = s.seq
                 WHEN MATCHED THEN UPDATE SET metric = s.metric
                 WHEN NOT MATCHED THEN INSERT *
                 WHEN NOT MATCHED BY SOURCE AND key = 'a' THEN DELETE
                 WHEN NOT MATCHED BY SOURCE THEN UPDATE SET metric = -1""")
    val gotK = spark.sql("SELECT key, seq, metric FROM gmbs.db.kl ORDER BY seq")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    println(s"KEYEDLOG RESULT: $gotK")
    assert(gotK == Seq(("b", 2L, 222L), ("c", 3L, -1L), ("d", 9L, 90L)))
  }
}
