package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic for the qp05 streaming-dedup pipeline: replays the 3-batch
  * greedy acceptance BATCH-BY-BATCH in plain batch code (no streaming
  * machinery) and prints each batch's intra-batch drops, index-probe
  * drops, and accepted ids — diffable against the DuckDB replay. */
object StreamDedupProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .appName("qp05-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text"))
    var clean: DataFrame = docs.limit(0)
    var index: DataFrame = null
    (0 to 2).foreach { b =>
      val batch = docs.filter(col("doc_id") % 3 === b).persist()
      val intra = graft.operators.Dedup
        .minhashLshPairs(batch, "doc_id", "text", n = 3, threshold = 0.8)
        .select(col("d2").as("doc_id")).distinct()
      val intraIds = intra.collect().map(_.getLong(0)).sorted
      val kept = batch.join(intra, Seq("doc_id"), "left_anti")
      val contaminated =
        if (index == null) kept.select("doc_id").limit(0)
        else graft.operators.Dedup.minhashLshPairsAgainstIndex(
            clean, index, kept, "doc_id", "text", n = 3, threshold = 0.8)
          .select(col("delta_id").as("doc_id")).distinct()
      val contIds = contaminated.collect().map(_.getLong(0)).sorted
      val accepted = kept.join(contaminated, Seq("doc_id"), "left_anti")
        .persist()
      println(s"batch $b: intra-drop=${intraIds.mkString(",")} " +
        s"probe-drop=${contIds.mkString(",")} accepted=${accepted.count()}")
      val newIndex = graft.operators.Dedup
        .lshIndex(accepted, "doc_id", "text", n = 3).persist()
      newIndex.count()
      clean = clean.union(accepted)
      index = if (index == null) newIndex else index.union(newIndex)
      batch.unpersist(); ()
    }
    println("accepted_ids=" + clean.select("doc_id").collect()
      .map(_.getLong(0)).sorted.mkString(","))

    // streaming arm: mirror the qp05 wiring, print what each micro-batch
    // actually drops. clean/index are LOCATION tables — appendIdempotent
    // writes plain name-resolved parquet, which a catalog-mapped table
    // (parquet field ids) would read as all-null columns (the bug this
    // probe originally caught)
    graft.catalog.GraftCatalog.register(spark, "gp",
      graft.core.TempDirs.create("graft_probe_root_"))
    spark.sql("CREATE NAMESPACE gp.db")
    spark.sql("CREATE TABLE gp.db.sd_feed (doc_id BIGINT, lang STRING, text STRING) USING manifest")
    val cleanLoc = graft.core.TempDirs.create("graft_probe_clean_")
    val idxLoc = graft.core.TempDirs.create("graft_probe_idx_")
    spark.sql("CREATE TABLE gp.db.sd_clean (doc_id BIGINT, lang STRING, text STRING) " +
      s"USING manifest LOCATION '$cleanLoc'")
    spark.sql("CREATE TABLE gp.db.sd_index (doc_id BIGINT, band INT, bucket BIGINT) " +
      s"USING manifest LOCATION '$idxLoc'")
    docs.createOrReplaceTempView("probe_documents")
    (0 to 2).foreach(b =>
      spark.sql("INSERT INTO gp.db.sd_feed SELECT doc_id, lang, text " +
        s"FROM probe_documents WHERE doc_id % 3 = $b"))
    val ckpt = graft.core.TempDirs.create("graft_probe_ck_")
    val q = spark.readStream.option("maxVersionsPerTrigger", "1")
      .table("gp.db.sd_feed")
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val sb = batch.sparkSession
        val b = batch.select("doc_id", "lang", "text").persist()
        try {
          val intra = graft.operators.Dedup
            .minhashLshPairs(b, "doc_id", "text", n = 3, threshold = 0.8)
            .select(col("d2").as("doc_id")).distinct()
          val intraIds = intra.collect().map(_.getLong(0)).sorted
          val kept = b.join(intra, Seq("doc_id"), "left_anti")
          val cont = graft.operators.Dedup.minhashLshPairsAgainstIndex(
              sb.table("gp.db.sd_clean"), sb.table("gp.db.sd_index"), kept,
              "doc_id", "text", n = 3, threshold = 0.8)
            .select(col("delta_id").as("doc_id")).distinct()
          val contIds = cont.collect().map(_.getLong(0)).sorted
          val accepted = b.join(intra, Seq("doc_id"), "left_anti")
            .join(cont, Seq("doc_id"), "left_anti").persist()
          try {
            graft.core.ManifestTable.appendIdempotent(
              accepted, cleanLoc, s"probe-b$id")
            graft.core.ManifestTable.appendIdempotent(
              graft.operators.Dedup.lshIndex(accepted, "doc_id", "text", n = 3),
              idxLoc, s"probe-b$id")
            println(s"STREAM batch $id rows=${b.count()} " +
              s"intra=[${intraIds.mkString(",")}] cont=[${contIds.mkString(",")}]")
            ()
          } finally { accepted.unpersist(); () }
        } finally { b.unpersist(); () }
      }.start()
    if (!q.awaitTermination(300000)) println("STREAM did not drain")
    q.stop()
    println("STREAM accepted=" + spark.table("gp.db.sd_clean").count())
    spark.stop()
  }
}
