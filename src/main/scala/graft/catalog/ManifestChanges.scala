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

  // endpoint states: the end side carries added files' lengths/vectors,
  // the start side the pre-window vectors (what was already dead before
  // the window — never re-emitted); removed files fall back to
  // individual stats inside the index construction (cost ∝ delete-side)
  private lazy val endpoints: (ManifestTable.TableState, ManifestTable.TableState) = {
    val committed = ManifestTable.allVersions(dir)
    if (committed.isEmpty)
      (ManifestTable.TableState(Seq.empty, Map.empty, Map.empty),
        ManifestTable.TableState(Seq.empty, Map.empty, Map.empty))
    else (ManifestTable.state(dir, startVersion),
      ManifestTable.state(dir, endVersion.getOrElse(committed.max)))
  }

  private def parquetScan(paths: Seq[String], withRowIndex: Boolean): Scan =
    ManifestFileIndex.scanBuilder(SparkSession.active, declared, dir, paths,
      endpoints._2.stats, CaseInsensitiveStringMap.empty(),
      withRowIndex = withRowIndex).build()

  /** Per-file row-address partitions (the vector-aware sides of the
    * feed): `filters(rel)` supplies each file's position filter. */
  private def addressed(paths: Seq[String], tag: String,
      filters: String => RowAddressPartition => RowAddressPartition): Seq[InputPartition] = {
    if (paths.isEmpty) return Seq.empty
    var i = -1
    parquetScan(paths, withRowIndex = true).toBatch.planInputPartitions().toSeq.flatMap {
      case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
        fp.files.map { pf =>
          i += 1
          val rel = ManifestRowLevelOperation.relName(pf.filePath.toString)
          val base = RowAddressPartition(
            org.apache.spark.sql.execution.datasources.FilePartition(i, Array(pf)), rel)
          ChangeTaggedPartition(filters(rel)(base), tag): InputPartition
        }
      case other => throw new IllegalStateException(
        s"parquet planned a non-file partition: $other")
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val (added, removed) = diff
    val (startState, endState) = endpoints
    def tagged(paths: Seq[String], tag: String): Seq[InputPartition] =
      if (paths.isEmpty) Seq.empty
      else parquetScan(paths, withRowIndex = false).toBatch.planInputPartitions().toSeq
        .map(p => ChangeTaggedPartition(p, tag): InputPartition)
    // inserts: window-added files, minus rows a vector killed by `end`
    // (added-then-deleted nets out, matching the endpoint row sets)
    val (addedDv, addedPlain) = added.partition(endState.dvs.contains)
    val inserts = tagged(addedPlain, "insert") ++
      addressed(addedDv, "insert", rel => _.copy(drop = endState.dvs.get(rel).map(_.path)))
    // deletes: window-removed files' pre-images, minus rows already dead
    // at `start` (they were never alive in this window)
    val (removedDv, removedPlain) = removed.partition(startState.dvs.contains)
    val deletes = tagged(removedPlain, "delete") ++
      addressed(removedDv, "delete", rel => _.copy(drop = startState.dvs.get(rel).map(_.path)))
    // vector deletes: files live at BOTH endpoints whose vector grew —
    // pre-images of exactly the newly-killed positions
    val survivors = endState.files.toSet -- added
    val vectorKilled = endState.dvs.keys.toSeq.filter { f =>
      survivors.contains(f) &&
        startState.dvs.get(f).map(_.path) != endState.dvs.get(f).map(_.path)
    }.sorted
    val dvDeletes = addressed(vectorKilled, "delete", rel => _.copy(
      keepOnly = endState.dvs.get(rel).map(_.path),
      keepExclude = startState.dvs.get(rel).map(_.path)))
    (inserts ++ deletes ++ dvDeletes).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // two delegate factories: plain parquet rows, and row-address rows
    // (position-filtered, row-index column hidden); both file-agnostic
    val addressedScan = parquetScan(Seq.empty, withRowIndex = true)
    ChangeTagReaderFactory(
      parquetScan(Seq.empty, withRowIndex = false).toBatch.createReaderFactory(),
      RowAddressReaderFactory(addressedScan.toBatch.createReaderFactory(), dir,
        addressedScan.readSchema(), emitPos = false, emitFile = false))
  }
}

case class ChangeTaggedPartition(inner: InputPartition, change: String)
    extends InputPartition {
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

case class ChangeTagReaderFactory(inner: PartitionReaderFactory,
                                  addressed: RowAddressReaderFactory = null)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ChangeTaggedPartition]
    val reader = p.inner match {
      case ra: RowAddressPartition => addressed.createReader(ra)
      case plain                   => inner.createReader(plain)
    }
    val tag = new GenericInternalRow(Array[Any](UTF8String.fromString(p.change)))
    val joined = new JoinedRow
    new PartitionReader[InternalRow] {
      override def next(): Boolean = reader.next()
      override def get(): InternalRow = joined(reader.get(), tag)
      override def close(): Unit = reader.close()
    }
  }
}
