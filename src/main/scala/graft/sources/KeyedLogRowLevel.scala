package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns, SupportsRuntimeFiltering}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.RowLevelOperation.Command
import org.apache.spark.sql.sources.{Filter, In}
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}

/** Row-level DML (UPDATE / MERGE / arbitrary-predicate DELETE) for the
  * keyed-log connector — group-based COPY-ON-WRITE at FILE granularity,
  * the same DSv2 contract the manifest format implements
  * ([[graft.catalog.ManifestRowLevelOperation]]), re-expressed for a
  * listing-visible text format:
  *
  *  - the SCAN pins the live file set at operation start, plans one
  *    split per file, and tags every row with its source file name
  *    (`_klfile`, the group identity). Spark's runtime group filtering
  *    ([[SupportsRuntimeFiltering]] on `_klfile`) first runs the
  *    command's condition to find MATCHED files, then re-plans the scan
  *    over only those — unmatched files are never read twice and never
  *    rewritten. The scan deliberately pushes NO data filters: a
  *    group-based rewrite must re-emit EVERY row of an affected file
  *    (survivors included), so row filtering would silently drop them.
  *  - the WRITE stages replacement files under dot-prefixed (hidden)
  *    names via the normal task-commit rename protocol — bucket-declared
  *    tables stage through the CLUSTERED writer so rewritten files keep
  *    their `-K=` tags and storage-partitioned reads survive DML — then
  *    the job commit swaps: delete the replaced files, reveal the staged
  *    ones, journal the surviving set as ONE rewrite entry (the same
  *    version-line contract as compaction and the qk07 metadata DELETE).
  *
  * Crash/visibility contract (documented, same family as
  * [[KeyedLogTable.deleteWhere]]'s): the keyed log is a LISTING-visible
  * format — there is no manifest to make the swap atomic, so a reader
  * racing the commit window (or a crash inside it) can observe the
  * affected files' rows missing; rows are never DUPLICATED and never
  * resurrected (deletes happen before reveals). Orphaned `.rl-` staged
  * files from a crashed driver are invisible to readers and harmless.
  * Snapshot-isolated DML is the manifest format's rung of the ladder.
  */
class KeyedLogRowLevelOperation(path: String, bucketN: Option[Int],
                                cmd: Command) extends RowLevelOperation {
  import KeyedLogRowLevelOperation._

  private[sources] val conf = KeyedLogConf.capture()

  /** Live file NAMES pinned when the DML statement starts analysis —
    * scan and commit agree on this base. */
  private[sources] val snapshot: Seq[String] =
    KeyedLogSource.listDataFiles(path, conf).map(f => new Path(f).getName).sorted

  /** What the commit replaces: narrowed by the scan's runtime group
    * filter, defaulting to the full snapshot (driver-side only). */
  @volatile private[sources] var scannedFiles: Seq[String] = snapshot

  override def command(): Command = cmd

  override def newScanBuilder(options: org.apache.spark.sql.util.CaseInsensitiveStringMap): ScanBuilder =
    new KeyedLogRowLevelScan(this, path)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = {
        require(info.schema().fieldNames.sameElements(KeyedLogSource.schema.fieldNames),
          s"keyed_log rewrite schema must be (key, seq, metric); got " +
            info.schema().simpleString)
        // rewrites keep the layout they found: bucket-declared tables and
        // fully key-clustered dirs re-cluster (storage-partitioned reads
        // survive DML); plain dirs rewrite plain
        val clustered = bucketN.isDefined || (snapshot.nonEmpty &&
          snapshot.forall(n => KeyedLogSource.keyOfFile(n).isDefined))
        new KeyedLogReplaceWrite(KeyedLogRowLevelOperation.this, path,
          info.queryId(), clustered)
      }
    }

  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(Expressions.column(FileCol))

  override def description(): String = s"KeyedLogRowLevelOperation($cmd, $path)"
}

object KeyedLogRowLevelOperation {
  /** Metadata column carrying each row's source file NAME (keyed-log
    * dirs are flat, so the name is the identity). */
  val FileCol = "_klfile"

  /** Hidden-name prefix for staged rewrite output (dot = reader-invisible). */
  private[sources] def stagePrefix(queryId: String): String = s".rl-$queryId-"
}

/** The row-level read: one split per pinned snapshot file, rows tagged
  * with `_klfile`. No data-filter pushdown BY DESIGN (see the class doc
  * above); runtime group filtering narrows both the planned splits and
  * the operation's replace set. */
class KeyedLogRowLevelScan(op: KeyedLogRowLevelOperation, path: String)
    extends ScanBuilder with Scan with Batch
    with SupportsPushDownRequiredColumns with SupportsRuntimeFiltering {
  import KeyedLogRowLevelOperation._

  private val fullSchema = StructType(KeyedLogSource.schema.fields :+
    StructField(FileCol, StringType, nullable = false))
  private var required: StructType = fullSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = this

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"KeyedLogRowLevelScan path=$path files=${op.scannedFiles.length}"

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column(FileCol))

  /** Runtime GROUP filter: Spark runs the command's condition first and
    * hands back the matched `_klfile` set — narrow both the scan and the
    * files the commit will replace. Unsupported shapes leave the full
    * snapshot in place (correct, just a broader rewrite). */
  override def filter(filters: Array[Filter]): Unit =
    filters.foreach {
      case In(FileCol, values) =>
        val keep = values.collect { case s: String => s }.toSet
        op.scannedFiles = op.scannedFiles.filter(keep.contains)
      case _ => ()
    }

  override def planInputPartitions(): Array[InputPartition] =
    op.scannedFiles.map(n =>
      KeyedLogPartition(Seq(new Path(path, n).toString)): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    // pushed = empty: every row of a planned file must reach the rewrite
    KeyedLogReaderFactory(required, Array.empty, op.conf)
}

/** The replace-data write: tasks stage hidden `.rl-` files through the
  * normal replace-on-retry rename protocol; the job commit swaps them in
  * (delete replaced → reveal staged → journal one rewrite entry). A
  * zero-matched-rows command (nothing scanned, nothing staged) commits
  * NOTHING — no journal entry, so incremental cursors never see a
  * phantom full-table rewrite for a no-op; an inserts-only MERGE (rows
  * staged, no file replaced) journals a PLAIN append entry. */
class KeyedLogReplaceWrite(op: KeyedLogRowLevelOperation, path: String,
                           queryId: String, clustered: Boolean)
    extends Write with BatchWrite
    with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
  import KeyedLogRowLevelOperation.stagePrefix

  override def requiredDistribution: org.apache.spark.sql.connector.distributions.Distribution =
    if (clustered) KeyedLogSource.clusteredDistribution
    else org.apache.spark.sql.connector.distributions.Distributions.unspecified()
  override def requiredOrdering: Array[org.apache.spark.sql.connector.expressions.SortOrder] =
    if (clustered) KeyedLogSource.clusteredOrdering else Array.empty

  override def toBatch: BatchWrite = this
  override def description(): String = s"KeyedLogReplaceWrite($path)"

  /** True once [[commit]] started deleting replaced files: from that
    * moment the staged `.rl-` files may hold the ONLY copy of surviving
    * rows, so [[abort]] must leave them on disk as the recovery copy
    * (they stay reader-invisible either way). */
  @volatile private var destructivePhase = false

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    if (clustered)
      KeyedLogClusteredWriterFactory(path, queryId, op.conf, stagePrefix(queryId))
    else KeyedLogWriterFactory(path, queryId, op.conf, stagePrefix(queryId))

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(op.conf.value)
    val staged = messages.toSeq
      .collect { case KeyedLogCommit(names) => names }.flatten.sorted
    val prefix = stagePrefix(queryId)
    // zero matched rows AND zero output: a true no-op — journaling a
    // rewrite here would make every incremental cursor re-deliver the
    // whole table for nothing
    if (op.scannedFiles.isEmpty && staged.isEmpty) return
    // 1. drop the replaced files FIRST (rows gone, never duplicated —
    //    the deleteWhere ordering); 2. reveal the staged replacements;
    // 3. journal: the post-swap surviving set as ONE rewrite entry when
    //    files were replaced (fresh listing, so concurrent appends carry
    //    over like compaction), or a PLAIN append entry of just the new
    //    files for an inserts-only MERGE
    destructivePhase = op.scannedFiles.nonEmpty
    op.scannedFiles.foreach { n =>
      val p = new Path(path, n)
      // a false delete on an ABSENT file is not a failure — a concurrent
      // maintenance pass already removed it (the journal rebase below is
      // what arbitrates); a false delete on a PRESENT file is
      if (!fs.delete(p, false) && fs.exists(p))
        throw new java.io.IOException(
          s"keyed_log($path): rewrite could not delete replaced file $n")
    }
    val revealed = staged.map { sn =>
      val dest = new Path(path, sn.stripPrefix(prefix))
      if (fs.exists(dest) && !fs.delete(dest, false))
        throw new java.io.IOException(
          s"keyed_log($path): rewrite could not replace ${dest.getName}")
      if (!fs.rename(new Path(path, sn), dest))
        throw new java.io.IOException(
          s"keyed_log($path): rewrite reveal rename failed for $sn")
      dest.getName
    }
    if (op.scannedFiles.nonEmpty) {
      val survivors = KeyedLogSource.listDataFiles(path, op.conf)
        .map(f => new Path(f).getName)
      KeyedLogVersionLog.commit(path, op.conf, survivors, rewrite = true)
    } else KeyedLogVersionLog.commit(path, op.conf, revealed)
    ()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    // once the destructive phase began, the staged files may be the only
    // copy of already-deleted originals' rows — keep them (hidden) for
    // manual recovery instead of destroying the last copy
    if (destructivePhase) return
    val fs = new Path(path).getFileSystem(op.conf.value)
    messages.toSeq.collect { case KeyedLogCommit(names) => names }.flatten
      .foreach(n => fs.delete(new Path(path, n), false))
  }
}
