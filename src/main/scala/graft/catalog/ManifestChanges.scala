package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.core.ManifestTable

/** `t.changes` — FULL change-data-capture over a manifest table's version
  * window, rows tagged `_change_type`:
  *
  * {{{
  *   spark.read.option("start_version", 2)          -- required
  *        .option("end_version", 5)                 -- default: current
  *        .table("cat.db.t.changes")
  * }}}
  *
  * The manifest diff gives the feed at FILE granularity with no side
  * journal: rows of files ADDED in the window are `insert` (post-image),
  * rows of files REMOVED are `delete` (pre-image — the file content is
  * still on disk until vacuum, which is exactly why vacuum keeps a grace
  * version). A copy-on-write DML rewrite therefore emits the affected
  * files' pre-image as deletes and the rewritten files as inserts — the
  * delete+insert pairing downstream MERGE consumers expect from a CDC
  * feed (Delta CDF semantics at file granularity); pure appends emit only
  * inserts. Unchanged files (present in both manifests) emit nothing.
  *
  * Reading is two delegated parquet scans (one per side) whose partitions
  * are tagged and whose rows get the literal column appended — the same
  * JoinedRow wrap the DML `_file` column uses; no data is copied or
  * shuffled to produce the feed. */
class ManifestChangesTable(dir: String, declared: StructType) extends Table with SupportsRead {

  override def name(): String = s"changes($dir)"
  override def schema(): StructType =
    StructType(declared.fields :+
      StructField(ManifestChangesTable.ChangeCol, StringType, nullable = false))
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    GraftCatalog.requireFieldIdReads(declared, name())
    val start = Option(options.get("start_version")).map(_.toLong).getOrElse(
      throw new IllegalArgumentException(
        s"${name()}: t.changes needs .option(\"start_version\", v)"))
    val end = Option(options.get("end_version")).map(_.toLong)
    () => ManifestChangesScan(dir, declared, start, end)
  }
}

object ManifestChangesTable {
  val ChangeCol = "_change_type"
}

case class ManifestChangesScan(dir: String, declared: StructType,
                               startVersion: Long, endVersion: Option[Long])
    extends Scan with Batch {

  override def readSchema(): StructType =
    StructType(declared.fields :+
      StructField(ManifestChangesTable.ChangeCol, StringType, nullable = false))
  override def toBatch: Batch = this
  override def description(): String =
    s"ManifestChangesScan($dir, $startVersion..${endVersion.getOrElse("current")})"

  /** (added, removed) dir-relative file sets of the window. */
  private lazy val diff: (Seq[String], Seq[String]) = {
    val committed = ManifestTable.allVersions(dir)
    require(committed.contains(startVersion),
      s"start_version $startVersion is not committed under $dir " +
        s"(committed: ${committed.mkString(",")}) — vacuumed past the cursor?")
    val end = endVersion.getOrElse(committed.max)
    require(committed.contains(end), s"end_version $end is not committed under $dir")
    require(end >= startVersion,
      s"end_version $end precedes start_version $startVersion")
    // O(window delta) marker replay — neither endpoint snapshot resolves
    // on an all-delta window (ManifestTable.diff)
    ManifestTable.diff(dir, startVersion, end)
  }

  // added files are live at the window end, so its manifest carries
  // their lengths; removed files fall back to individual stats inside
  // the index construction (cost ∝ the delete-side, not the table)
  private lazy val endStats: Map[String, graft.core.FileStats.Stats] = {
    val committed = ManifestTable.allVersions(dir)
    if (committed.isEmpty) Map.empty
    else ManifestTable.manifestEntries(dir,
      endVersion.getOrElse(committed.max))._2
  }

  private def parquetScan(paths: Seq[String]): Scan =
    ManifestFileIndex.scanBuilder(SparkSession.active, declared, dir, paths,
      endStats, CaseInsensitiveStringMap.empty()).build()

  override def planInputPartitions(): Array[InputPartition] = {
    val (added, removed) = diff
    def tagged(paths: Seq[String], tag: String): Array[InputPartition] =
      if (paths.isEmpty) Array.empty
      else parquetScan(paths).toBatch.planInputPartitions()
        .map(p => ChangeTaggedPartition(p, tag): InputPartition)
    tagged(added, "insert") ++ tagged(removed, "delete")
  }

  /** The parquet reader factory is file-agnostic — one built over an
    * empty list serves both sides' partitions. */
  override def createReaderFactory(): PartitionReaderFactory =
    ChangeTagReaderFactory(parquetScan(Seq.empty).toBatch.createReaderFactory())
}

case class ChangeTaggedPartition(inner: InputPartition, change: String)
    extends InputPartition {
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

case class ChangeTagReaderFactory(inner: PartitionReaderFactory)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ChangeTaggedPartition]
    val reader = inner.createReader(p.inner)
    val tag = new GenericInternalRow(Array[Any](UTF8String.fromString(p.change)))
    val joined = new JoinedRow
    new PartitionReader[InternalRow] {
      override def next(): Boolean = reader.next()
      override def get(): InternalRow = joined(reader.get(), tag)
      override def close(): Unit = reader.close()
    }
  }
}
