package graft.catalog

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.{KeyedLogConf, KeyedLogPartition, KeyedLogReaderFactory, KeyedLogSource, KeyedLogVersionLog}

/** `t.changes` for KEYEDLOG tables — the commit-journal CDC feed, rows
  * tagged `_change_type`, window/error contract matching
  * [[ManifestChangesTable]]:
  *
  * {{{
  *   spark.read.option("start_version", 0)          -- required; -1 = from the beginning
  *        .option("end_version", 5)                 -- default: journal head
  *        .table("cat.db.t.changes")
  * }}}
  *
  * The journal is insert-only except compaction, so the feed has two row
  * kinds: rows of files a normal commit added are `insert` (post-image);
  * a compaction journals the WHOLE post-compaction file set marked as a
  * rewrite, and its rows are tagged `rewrite` — the refresh/upsert event
  * manifest tables express as delete+insert pairs. (A keyedlog compaction
  * swaps the old files away, so their pre-images cannot be served; every
  * surviving row is inside the rewrite's post-image.) Versions BEFORE the
  * last rewrite in the window are superseded by it — their content is a
  * subset of the rewrite rows — so the feed serves the last rewrite plus
  * every later insert, applying the same upsert semantics incremental
  * consumers already get from the windowed scan.
  *
  * Reading ships each served file as one [[KeyedLogPartition]] through the
  * connector's own reader, wrapped with the same literal-append
  * [[ChangeTagReaderFactory]] the manifest feed uses — no data is copied
  * or shuffled to produce the feed. */
class KeyedLogChangesTable(dir: String) extends Table with SupportsRead {

  override def name(): String = s"changes($dir)"
  override def schema(): StructType =
    StructType(KeyedLogSource.schema.fields :+
      StructField(ManifestChangesTable.ChangeCol, StringType, nullable = false))
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val start = Option(options.get("start_version")).map(_.toLong).getOrElse(
      throw new IllegalArgumentException(
        s"${name()}: t.changes needs .option(\"start_version\", v)"))
    val end = Option(options.get("end_version")).map(_.toLong)
    () => KeyedLogChangesScan(dir, start, end)
  }
}

case class KeyedLogChangesScan(dir: String, startVersion: Long,
                               endVersion: Option[Long]) extends Scan with Batch {

  private val conf = KeyedLogConf.capture()

  override def readSchema(): StructType =
    StructType(KeyedLogSource.schema.fields :+
      StructField(ManifestChangesTable.ChangeCol, StringType, nullable = false))
  override def toBatch: Batch = this
  override def description(): String =
    s"KeyedLogChangesScan($dir, $startVersion..${endVersion.getOrElse("head")})"

  /** (version, tag, file names) per served version — the last rewrite in
    * the window (if any) plus every later insert commit. */
  private lazy val served: Seq[(Long, String, Seq[String])] = {
    val committed = KeyedLogVersionLog.versions(dir, conf)
    require(startVersion == -1L || committed.contains(startVersion),
      s"start_version $startVersion is not journaled under $dir " +
        s"(journaled: ${committed.mkString(",")}) — compacted past the cursor?")
    val end = endVersion.getOrElse(committed.lastOption.getOrElse(-1L))
    require(end == -1L || committed.contains(end),
      s"end_version $end is not journaled under $dir")
    require(end >= startVersion,
      s"end_version $end precedes start_version $startVersion")
    val window = committed.filter(v => v > startVersion && v <= end)
    val tagged = window.map { v =>
      val rw = KeyedLogVersionLog.isRewrite(dir, conf, v)
      (v, if (rw) "rewrite" else "insert", KeyedLogVersionLog.read(dir, conf, v))
    }
    val lastRw = tagged.lastIndexWhere(_._2 == "rewrite")
    if (lastRw < 0) tagged else tagged.drop(lastRw)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    // journal window resolved first (in `served`), listing second — same
    // writer-race ordering as the windowed scan; a miss after one re-list
    // means a compaction passed the cursor and fails loudly
    def listing(): Map[String, String] = KeyedLogSource
      .listDataFiles(dir, conf).map(f => new Path(f).getName -> f).toMap
    var listed = listing()
    var relisted = false
    served.flatMap { case (_, tag, names) =>
      names.map { n =>
        if (!listed.contains(n) && !relisted) { listed = listing(); relisted = true }
        val f = listed.getOrElse(n, throw new IllegalStateException(
          s"keyed_log t.changes: journaled file $n is gone (compacted past " +
            "your cursor?) — restart from a full scan"))
        ChangeTaggedPartition(KeyedLogPartition(Seq(f)), tag): InputPartition
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    ChangeTagReaderFactory(
      KeyedLogReaderFactory(KeyedLogSource.schema, Array.empty, conf))
}
