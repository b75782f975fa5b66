package graft.catalog

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{LakeStorage, ManifestTable}

/** Bloom-filter indexes on declared columns
  * (`TBLPROPERTIES ('graft.bloom.columns'='h')`): every write path bakes
  * a parquet bloom for those columns into its files, giving point
  * lookups on high-cardinality UNSORTED columns row-group skipping that
  * min/max stats cannot provide (every file spans the full hash range). */
class BloomIndexSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    GraftCatalog.register(s, "gbl", root)
    s
  }
  private lazy val root =
    "file://" + Files.createTempDirectory("graft_catalog_bloom_").toString

  private def dir(t: String): String = s"$root/db/$t"

  /** Per-file bloom presence for `col` across the CURRENT snapshot:
    * (filesWithBloom, filesTotal). */
  private def bloomCoverage(t: String, colName: String): (Int, Int) = {
    import scala.jdk.CollectionConverters._
    val d = dir(t)
    val st = ManifestTable.state(d, ManifestTable.currentVersion(d).get)
    val conf = new org.apache.hadoop.conf.Configuration()
    val hits = st.files.count { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(s"$d/$f"), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getFooter.getBlocks.asScala.forall(b =>
        b.getColumns.asScala.exists(c =>
          c.getPath.toDotString == colName && c.getBloomFilterOffset >= 0))
      finally r.close()
    }
    (hits, st.files.length)
  }

  test("declared bloom columns are baked by insert, DML, compact, purge, streaming") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gbl.db")
    spark.sql("CREATE TABLE gbl.db.bl (id BIGINT, h STRING, v STRING) " +
      "USING manifest TBLPROPERTIES ('graft.bloom.columns'='h')")
    // high-cardinality values (md5 strings): the 60k-distinct dictionary
    // overflows parquet's dict page, so the bloom actually gets written
    spark.sql("INSERT INTO gbl.db.bl SELECT id, md5(CAST(id AS STRING)), " +
      "concat('v', id) FROM range(60000)")
    assert(spark.sql("SHOW TBLPROPERTIES gbl.db.bl").collect()
      .exists(r => r.getString(0) == GraftCatalog.BloomColsProp &&
        r.getString(1) == "h"))
    val (withBloom, total) = bloomCoverage("bl", "h")
    assert(total > 0 && withBloom === total,
      s"insert files missing blooms: $withBloom/$total")
    // the NON-declared column gets none
    val (vBloom, _) = bloomCoverage("bl", "v")
    assert(vBloom === 0, "undeclared column must not carry blooms")
    // point lookups stay exact (hit and miss)
    assert(spark.sql("SELECT id FROM gbl.db.bl WHERE h = md5('123')")
      .head().getLong(0) === 123L)
    assert(spark.sql("SELECT count(*) FROM gbl.db.bl WHERE h = 'nope'")
      .head().getLong(0) === 0L)
    // copy-on-write DML rewrite keeps the blooms
    spark.sql("DELETE FROM gbl.db.bl WHERE id % 1000 = 7")
    val (afterDml, totalDml) = bloomCoverage("bl", "h")
    assert(afterDml === totalDml, s"DML rewrite lost blooms: $afterDml/$totalDml")
    // compact keeps them
    spark.sql("CALL gbl.system.compact('db.bl')")
    val (afterCompact, totalCompact) = bloomCoverage("bl", "h")
    assert(afterCompact === totalCompact,
      s"compact lost blooms: $afterCompact/$totalCompact")
    assert(spark.sql("SELECT count(*) FROM gbl.db.bl").head().getLong(0) === 59940L)
    // a table WITHOUT the property writes none
    spark.sql("CREATE TABLE gbl.db.plain (id BIGINT, h STRING) USING manifest")
    spark.sql("INSERT INTO gbl.db.plain SELECT id, md5(CAST(id AS STRING)) " +
      "FROM range(60000)")
    assert(bloomCoverage("plain", "h")._1 === 0)
    // unknown column in the property rejects at CREATE
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE gbl.db.badbl (id BIGINT) USING manifest " +
        "TBLPROPERTIES ('graft.bloom.columns'='nope')")
    }
    assert(e.getMessage.contains("unknown column"))
  }

  test("streaming epochs and merge-on-read inserts carry blooms; rename follows") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gbl.db")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.sql("CREATE TABLE gbl.db.bls (h STRING, x BIGINT) USING manifest " +
      "TBLPROPERTIES ('graft.bloom.columns'='h')")
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val q = ms.toDF().selectExpr("md5(CAST(value AS STRING)) AS h", "value AS x")
      .writeStream.option("checkpointLocation",
        Files.createTempDirectory("graft_bloom_ck_").toString)
      .outputMode("append").toTable("gbl.db.bls")
    try {
      ms.addData(0L until 60000L: _*)
      q.processAllAvailable()
    } finally q.stop()
    val (sBloom, sTotal) = bloomCoverage("bls", "h")
    assert(sTotal > 0 && sBloom === sTotal,
      s"stream epoch files missing blooms: $sBloom/$sTotal")
    // merge-on-read: the UPDATE's re-insert pool carries blooms too
    spark.sql("CREATE TABLE gbl.db.blm (h STRING, x BIGINT) USING manifest " +
      "TBLPROPERTIES ('graft.bloom.columns'='h', 'graft.dml.mode'='merge-on-read')")
    spark.sql("INSERT INTO gbl.db.blm SELECT md5(CAST(id AS STRING)), id FROM range(60000)")
    spark.sql("UPDATE gbl.db.blm SET x = -x WHERE x < 30000")
    val (mBloom, mTotal) = bloomCoverage("blm", "h")
    assert(mBloom === mTotal, s"mor insert pool missing blooms: $mBloom/$mTotal")
    assert(spark.sql("SELECT count(*) FROM gbl.db.blm WHERE x < 0")
      .head().getLong(0) === 29999L) // x=0 negates to itself
    // rename: the declaration follows; new writes bloom the new name
    spark.sql("ALTER TABLE gbl.db.blm RENAME COLUMN h TO doc_hash")
    assert(spark.sql("SHOW TBLPROPERTIES gbl.db.blm").collect()
      .exists(r => r.getString(0) == GraftCatalog.BloomColsProp &&
        r.getString(1) == "doc_hash"))
    spark.sql("INSERT INTO gbl.db.blm SELECT md5(concat('n', id)), id + 100000 " +
      "FROM range(60000)")
    val d = dir("blm")
    val st = ManifestTable.state(d, ManifestTable.currentVersion(d).get)
    val newest = st.files.maxBy(f => LakeStorage.openFor(d)
      .getFileStatus(new org.apache.hadoop.fs.Path(s"$d/$f")).getModificationTime)
    import scala.jdk.CollectionConverters._
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(s"$d/$newest"),
      new org.apache.hadoop.conf.Configuration())
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    val ok = try r.getFooter.getBlocks.asScala.forall(_.getColumns.asScala
      .exists(c => c.getPath.toDotString == "doc_hash" && c.getBloomFilterOffset >= 0))
    finally r.close()
    assert(ok, "post-rename writes must bloom the new physical name")
  }
}
