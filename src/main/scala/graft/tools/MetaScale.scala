package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{FileStats, LakeStorage, ManifestTable}

/** METADATA-PLANE scale probe: does the manifest log stay fast when a
  * table carries ~10⁵ live files? Measures exactly the operations whose
  * cost must NOT grow with live-file count (or may grow only linearly in
  * one cheap driver-side pass):
  *
  *   - `_head` resolution probes (must stay O(1));
  *   - snapshot `state()` resolution (nearest checkpoint + ≤interval
  *     delta markers — the log-read cost every query pays once);
  *   - checkpoint size on disk (the O(files) artifact, written once per
  *     interval, read once per resolution);
  *   - plan time of a selective query (log-served file index + stats
  *     skip evaluation over every live entry — zero FS listing);
  *   - one more 1-file APPEND commit at full size (must be O(delta)).
  *
  * The data plane is deliberately fake-cheap: one real 1000-row parquet
  * file hardlinked N times (inode-cheap), with SYNTHETIC disjoint id
  * ranges in the log stats so the selective query prunes to one file.
  * File CONTENTS therefore do not match the claimed ranges — this probe
  * measures metadata costs only; do not assert on query results beyond
  * the pruned-file count. Usage:
  * `sbt "runMain graft.tools.MetaScale [nFiles] [filesPerCommit]"`. */
object MetaScale {
  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toInt).getOrElse(100000)
    val perCommit = args.drop(1).headOption.map(_.toInt).getOrElse(1000)
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("meta-scale")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    val rootPath = java.nio.file.Files.createTempDirectory("graft_metascale_")
    val root = "file://" + rootPath.toString
    graft.catalog.GraftCatalog.register(spark, "gm", root)
    spark.sql("CREATE NAMESPACE gm.db")
    spark.sql("CREATE TABLE gm.db.meta (id BIGINT, v STRING) USING manifest")
    val dir = s"$root/db/meta"

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def med3[T](f: => T): Double = (1 to 3).map(_ => time(f)._2).sorted.apply(1)

    // one REAL parquet file; every log entry hardlinks it
    spark.range(1000).select(col("id"), sha1(col("id").cast("string")).as("v"))
      .coalesce(1).write.parquet(s"$root/db/meta/base")
    val baseFile = java.nio.file.Files.list(rootPath.resolve("db/meta/base"))
      .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
    val sizeBytes = java.nio.file.Files.size(baseFile)
    val pool = rootPath.resolve("db/meta/d-meta-links")
    java.nio.file.Files.createDirectories(pool)

    val rowsPer = 1000L
    var committed = 0
    // ext4 caps ~65k hardlinks per inode: rotate a fresh copy of the base
    // file every 50k links
    var linkTarget = baseFile
    var linksOnTarget = 0
    val (_, tBuild) = time {
      while (committed < nFiles) {
        val batch = (committed until math.min(committed + perCommit, nFiles)).map { i =>
          val name = f"f$i%07d.parquet"
          if (linksOnTarget >= 50000) {
            linkTarget = java.nio.file.Files.copy(baseFile,
              pool.resolve(s"base-copy-$i.parquet.bak"))
            linksOnTarget = 0
          }
          java.nio.file.Files.createLink(pool.resolve(name), linkTarget)
          linksOnTarget += 1
          val lo = i * rowsPer
          s"d-meta-links/$name" -> FileStats.Stats(rowsPer,
            Map("id" -> FileStats.ColStats(
              Some(FileStats.LongVal(lo)), Some(FileStats.LongVal(lo + rowsPer - 1)),
              Some(0L))),
            Some(sizeBytes))
        }
        ManifestTable.commitStagedAppend(dir, batch.map(_._1),
          stats = Some(batch.toMap))
        committed += batch.length
      }
    }

    val head = ManifestTable.currentVersion(dir).get
    val (resolved, _) = time(ManifestTable.state(dir, head))
    require(resolved.files.length == nFiles, s"log lost files: ${resolved.files.length}")

    // _head pointer: O(1) probes however deep the log
    val (probedHead, probes) = ManifestTable.currentVersionProbed(dir)
    require(probedHead.contains(head))

    // snapshot resolution: cold = checkpoint + ≤interval marker replay
    // (head-1 was neither checkpointed nor touched since build), cached =
    // the validated state-LRU hit every later query plan pays
    val (_, tStateCold) = time(ManifestTable.state(dir, head - 1))
    val tState = med3(ManifestTable.state(dir, head))

    // checkpoint bytes (largest = the full-file-list one)
    val fs = LakeStorage.openFor(dir)
    val ckptBytes = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(_.getPath.getName.startsWith("_ckpt_")).map(_.getLen)
      .sorted.lastOption.getOrElse(0L)

    // plan time of a selective query over the log-served index: builds
    // the file index from the log and evaluates the skip predicate on
    // every live entry; prunes to ~2 files of the 10⁵
    val lo = (nFiles / 2) * rowsPer
    def freshQuery = spark.table("gm.db.meta")
      .filter(col("id") >= lo && col("id") < lo + rowsPer)
    // a FRESH Dataset per run — executedPlan is a lazy val, so re-reading
    // it on one Dataset would time a cache hit
    val tPlan = med3(freshQuery.queryExecution.executedPlan.toString)
    val q = freshQuery
    val planned = q.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.relation.location.inputFiles.length
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.inputPartitions.length
    }.getOrElse(-1)

    // one more append at full table size: must be O(delta)
    val extra = {
      val name = "fextra.parquet"
      java.nio.file.Files.createLink(pool.resolve(name), baseFile)
      Seq(s"d-meta-links/$name" -> FileStats.Stats(rowsPer,
        Map("id" -> FileStats.ColStats(
          Some(FileStats.LongVal(nFiles * rowsPer)),
          Some(FileStats.LongVal(nFiles * rowsPer + rowsPer - 1)), Some(0L))),
        Some(sizeBytes)))
    }
    val (_, tCommit) = time(ManifestTable.commitStagedAppend(dir,
      extra.map(_._1), stats = Some(extra.toMap)))

    // metadata-only COUNT(*): the driver folds every live file's
    // LOG-recorded row count into one local row — end-to-end latency must
    // stay in the planning-cost class however many files the table holds
    // (no file/footer opens; value per the log's claimed counts, since
    // this probe's data plane is fake — see the scaladoc)
    def freshCount = spark.table("gm.db.meta")
    val expected = (nFiles + 1).toLong * rowsPer
    val tCount = med3 {
      val c = freshCount.count()
      require(c == expected, s"metadata count $c != log total $expected")
    }
    require(freshCount.groupBy().count().queryExecution.executedPlan
      .toString.contains("LocalTableScan"), "count must serve from the log")

    // runtime (join-driven) file pruning: a dynamic-pruning IN carrying
    // 10k build-side keys against the 10⁵-file scan — the driver-side
    // prune must run in O(files · log keys) (compiled sorted-key range
    // check), and keep exactly the 10 files the keys span
    val scan = spark.table("gm.db.meta").queryExecution.optimizedPlan
      .collectFirst {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          r.scan
      }.get.asInstanceOf[graft.catalog.ManifestStreamScan]
    val keyLo = (nFiles / 2).toLong * rowsPer
    val keys: Array[Any] =
      Array.tabulate(10000)(i => java.lang.Long.valueOf(keyLo + i))
    val tPrune = med3(scan.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("id", keys))))
    val prunedTo = scan.runtimeScan.fileIndex.inputFiles.length
    require(prunedTo == 10, s"expected 10 surviving files, got $prunedTo")

    // zero-copy CLONE of the full table: cost must be ONE fork-snapshot
    // marker write (~100 B/file), never data; reads through the clone
    // plan from its branch log with the same log-served machinery
    val (_, tClone) = time(
      spark.sql("CALL gm.system.clone('db.meta', 'db.metacl')").collect())
    val tCloneCount = med3 {
      val c = spark.table("gm.db.metacl").count()
      require(c == expected, s"clone count $c != $expected")
    }
    val (_, tDropClone) = time(spark.sql("DROP TABLE gm.db.metacl").collect())

    println(s"""{"metric":"meta_scale","n_files":$nFiles,"files_per_commit":$perCommit,""" +
      s""""versions":$head,"build_sec":${f"$tBuild%.2f"},""" +
      s""""head_probes":$probes,"state_cold_sec":${f"$tStateCold%.3f"},""" +
      s""""state_cached_sec":${f"$tState%.3f"},""" +
      s""""ckpt_bytes":$ckptBytes,"plan_sec":${f"$tPlan%.3f"},""" +
      s""""planned_partitions":$planned,"append_commit_sec":${f"$tCommit%.3f"},""" +
      s""""metadata_count_sec":${f"$tCount%.3f"},""" +
      s""""runtime_prune_10k_keys_sec":${f"$tPrune%.3f"},""" +
      s""""runtime_pruned_to":$prunedTo,""" +
      s""""clone_sec":${f"$tClone%.3f"},""" +
      s""""clone_count_sec":${f"$tCloneCount%.3f"},""" +
      s""""clone_drop_sec":${f"$tDropClone%.3f"}}""")
    spark.stop()
  }
}
