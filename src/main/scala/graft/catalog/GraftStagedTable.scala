package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.connector.catalog.{Identifier, StagedTable, SupportsWrite, TableCapability}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.StructType

import graft.core.ManifestTable

/** The in-flight table of an atomic CTAS/RTAS ([[GraftCatalog.stageCreate]]
  * family): the query result is STAGED as uncommitted manifest pools while
  * the table stays invisible (no descriptor, no committed manifest).
  * `commitStagedChanges` publishes descriptor + snapshot; a failure
  * anywhere before that leaves nothing a reader can see, and
  * `abortStagedChanges` removes the staged pools. */
class GraftStagedTable(catalog: GraftCatalog, ident: Identifier, dir: String,
                       meta: GraftCatalog.TableMeta, replace: Boolean)
    extends StagedTable with SupportsWrite {

  private val staged = scala.collection.mutable.ArrayBuffer.empty[String]

  override def name(): String = s"staged(${ident.toString})"
  override def schema(): StructType = meta.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      override def truncate(): WriteBuilder = this // staging IS a fresh snapshot
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwrite: Boolean): Unit = {
              val dataDir = meta.location.getOrElse(dir)
              // declared CHECK constraints apply to the CTAS output too
              val checked = Constraints.guard(data,
                meta.checks.map(c => Constraints.Check(c._1, c._2)))
              // the staged descriptor owns the new table's field-id space;
              // stamp it onto the CTAS output (column mapping)
              val stamped = GraftCatalog.stampFieldIds(checked, meta.schema)
              staged ++= (meta.bucket match {
                case Some(b) => ManifestTable.stagePoolBucketed(stamped, dataDir, b.n, b.col)
                case None if meta.cluster.nonEmpty =>
                  ManifestTable.stagePoolClustered(stamped, dataDir,
                    meta.cluster.map(_.col))
                case None => ManifestTable.stagePool(stamped, dataDir)
              })
              ()
            }
          }
      }
    }

  override def commitStagedChanges(): Unit =
    catalog.commitStaged(ident, dir, meta, staged.toSeq, replace)

  override def abortStagedChanges(): Unit =
    catalog.abortStaged(dir, meta, staged.toSeq)
}
