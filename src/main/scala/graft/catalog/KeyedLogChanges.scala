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

  /** (version, tag, file names) per served change group.
    *
    * Entry kinds in the window:
    *  - plain commit → its fresh names tagged `insert` (post-images);
    *  - FULL rewrite (compaction / metadata delete journaled without an
    *    rm set by an older revision) → the whole post-rewrite set tagged
    *    `rewrite`, superseding every earlier version in the window;
    *  - ROW-LEVEL rewrite (rm/ad recorded — UPDATE, MERGE, CoW or
    *    metadata DELETE) → the replaced files' pre-images tagged
    *    `delete` (served from their `.rm-v<version>-` tombstones) plus
    *    the replacement files tagged `insert` — the manifest feed's
    *    delete/insert pair contract at file granularity (survivor rows
    *    of a rewritten file appear in both images; applying delete-then-
    *    insert reproduces the exact post-state). Row-level rewrites do
    *    NOT supersede earlier entries — they touched only their rm set. */
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
    val entries = window.map(v => v -> KeyedLogVersionLog.entry(dir, conf, v))
    val tagged = entries.flatMap { case (v, e) =>
      if (!e.rewrite) Seq((v, "insert", e.fresh))
      // rm/ad key PRESENCE marks a row-level rewrite — a rebased no-op
      // (rm=[] ad=[]) serves nothing rather than a phantom whole-table
      // refresh; compaction/pre-field entries (keys absent) supersede
      else if (e.rm.isEmpty && e.ad.isEmpty) Seq((v, "rewrite", e.fresh))
      else Seq((v, "delete", e.rm.getOrElse(Nil)),
        (v, "insert", e.ad.getOrElse(Nil))).filter(_._3.nonEmpty)
    }
    val lastRw = tagged.lastIndexWhere(_._2 == "rewrite")
    if (lastRw < 0) tagged else tagged.drop(lastRw)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    // journal window resolved first (in `served`), listing second — same
    // writer-race ordering as the windowed scan. A name missing from the
    // listing is served from its `.rm-` tombstone when a row-level swap
    // kept the pre-image (delete groups resolve there by construction);
    // re-list once (compactor racing the first listing), then fail loudly.
    def listing(): Map[String, String] = KeyedLogSource
      .listDataFiles(dir, conf).map(f => new Path(f).getName -> f).toMap
    var listed = listing()
    var relisted = false
    // ONE tombstone listing for the whole plan, taken lazily on the
    // first miss — per-missing-name listings would make feed planning
    // O(names × LIST) on an object store
    lazy val tombstones: Map[String, String] =
      KeyedLogSource.tombstonesOf(dir, conf)
    served.flatMap { case (v, tag, names) =>
      names.map { n =>
        if (!listed.contains(n) && tag != "delete" && !relisted) {
          listed = listing(); relisted = true
        }
        val f =
          if (tag == "delete")
            // the exact tombstone this swap hid the pre-image under; a
            // reveal-rename leftover (tombstone failed, original still
            // visible) serves from the visible name
            tombstones.get(n).filter(_ == KeyedLogSource.tombstoneName(v, n))
              .orElse(listed.get(n).map(f => new Path(f).getName))
              .map(t => new Path(dir, t).toString)
              .getOrElse(throw new IllegalStateException(
                s"keyed_log t.changes: pre-image of $n (v$v) is gone — its " +
                  "tombstone aged out (vacuum); restart from a full scan"))
          else listed.get(n)
            .orElse(tombstones.get(n).map(t => new Path(dir, t).toString))
            .getOrElse(throw new IllegalStateException(
              s"keyed_log t.changes: journaled file $n is gone (compacted or " +
                "vacuumed past your cursor?) — restart from a full scan"))
        ChangeTaggedPartition(KeyedLogPartition(Seq(f)), tag): InputPartition
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    ChangeTagReaderFactory(
      KeyedLogReaderFactory(KeyedLogSource.schema, Array.empty, conf))
}
