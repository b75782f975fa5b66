package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.core.ManifestTable

/** DSv2 table over a [[graft.core.ManifestTable]] root — what
  * [[GraftCatalog]] returns for `USING manifest` tables.
  *
  * Read path: the snapshot (current, or `asOf` for `VERSION AS OF`) is a
  * manifest-listed set of parquet files; the scan DELEGATES to Spark's own
  * parquet DSv2 table over exactly that file list, so predicate pushdown,
  * column pruning, vectorized reading, and file-split parallelism are the
  * built-in ones — the catalog adds naming and snapshot resolution, not a
  * bespoke reader. An empty table (no committed version) scans as zero
  * rows with the declared schema.
  *
  * Write path: `INSERT INTO` appends (delta files + manifest union, no
  * rewrite of existing data), `INSERT OVERWRITE` replaces the snapshot —
  * both through the manifest's optimistic commit loop, so concurrent SQL
  * writers rebase instead of clobbering. The write is a V1 fallback
  * (`V1Write`): the driver hands the resolved DataFrame to
  * [[ManifestTable.append]]/[[ManifestTable.write]], which distribute the
  * actual file writes through the normal parquet writer — the fallback
  * shims the COMMIT protocol, not the data path.
  */
class ManifestSparkTable(dir: String, declared: StructType,
                         asOf: Option[Long]) extends Table
    with SupportsRead with SupportsWrite {

  override def name(): String =
    s"manifest($dir${asOf.map(v => s"@v$v").getOrElse("")})"
  override def schema(): StructType = declared
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)

  private def snapshotPaths: Seq[String] = {
    val committed = ManifestTable.allVersions(dir)
    val v = asOf match {
      case Some(req) =>
        if (!committed.contains(req)) throw new IllegalStateException(
          s"version $req is not committed under $dir " +
            s"(committed: ${committed.mkString(",")})")
        req
      case None => if (committed.isEmpty) return Seq.empty else committed.max
    }
    ManifestTable.manifest(dir, v).map(f => s"$dir/$f")
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    ParquetTable(name(), SparkSession.active, options, snapshotPaths,
      userSpecifiedSchema = Some(declared),
      fallbackFileFormat = classOf[ParquetFileFormat])
      .newScanBuilder(options)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(asOf.isEmpty, s"cannot write to the time-travel view ${name()}")
    new WriteBuilder with SupportsTruncate {
      private var overwrite = false
      override def truncate(): WriteBuilder = { overwrite = true; this }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwriteFlag: Boolean): Unit = {
              if (overwrite || overwriteFlag) ManifestTable.write(data, dir)
              else ManifestTable.append(data, dir)
              ()
            }
          }
      }
    }
  }
}
