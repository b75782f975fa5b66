package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** `GENERATED ALWAYS AS (expr)` — EXPRESSION-generated columns for
  * manifest tables (Delta's generated columns), completing the generated
  * DDL family next to DEFAULTs (qc49) and identity (qc53).
  *
  * The analyzer's side is Spark's own: declaring
  * `SUPPORTS_CREATE_TABLE_WITH_GENERATED_COLUMNS` admits the DDL and the
  * parser carries the expression SQL on the v2 Column; the catalog
  * re-attaches it as catalyst's `GENERATION_EXPRESSION` metadata key
  * (the identity lesson: `v2ColumnsToStructType` drops Column-carried
  * specs), where it rides the descriptor's schema JSON round-trip.
  *
  * WRITE contract (compute-or-validate, one codegen'd branch per row, no
  * extra passes):
  *  - batch INSERT with the column NULL/omitted -> the value is COMPUTED
  *    from the expression over the same row (pure row-local work inside
  *    the write projection — map-only, no shuffle);
  *  - batch INSERT with an explicit value -> VALIDATED: the value must
  *    equal the expression's result (`<=>`), else the write fails loudly
  *    before any version commits (a silently-divergent generated column
  *    would poison every downstream pruning decision);
  *  - UPDATE / MERGE / streaming epochs -> the same invariant rides the
  *    existing CHECK machinery as an implicit `col <=> (expr)` check
  *    ([[implicitChecks]]): an UPDATE that changes a source column
  *    without re-supplying the matching generated value fails loudly
  *    (validate-not-recompute — the row-level writers see full-width
  *    rows and cannot tell a stale generated value from an intended
  *    one); DELETE never writes new values and is unaffected.
  *
  * 100 TB payoff — PARTITION PRUNING THROUGH THE EXPRESSION: declare
  * `PARTITIONED BY (o_year)` where o_year is generated from a timestamp
  * and every write range-clusters by the MATERIALIZED column, so the
  * log's per-file min/max bounds are tight along it and a filter on the
  * generated column prunes files at plan time — the query never pays for
  * the expression over raw data, which is exactly Delta's
  * generated-column-partitioning trick.
  *
  * Same documented NULL divergence as identity BY DEFAULT: by the time
  * the batch reaches the connector an explicit NULL is indistinguishable
  * from an omitted column, so NULL always means "compute".
  */
object GeneratedColumns {

  /** Catalyst's own metadata key (`GeneratedColumn.GENERATION_EXPRESSION_
    * METADATA_KEY`). */
  val ExprKey: String = org.apache.spark.sql.catalyst.util.GeneratedColumn
    .GENERATION_EXPRESSION_METADATA_KEY

  final case class Spec(col: String, sql: String)

  def specs(schema: StructType): Seq[Spec] = schema.fields.toSeq.flatMap { f =>
    if (f.metadata.contains(ExprKey))
      Some(Spec(f.name, f.metadata.getString(ExprKey)))
    else None
  }

  def hasGenerated(schema: StructType): Boolean = specs(schema).nonEmpty

  /** Reserved CHECK-name prefix for the implicit generated-column
    * invariants (user CHECKs may not claim it — DDL rejects — so a
    * violation under it is always attributable to the generated-column
    * contract). */
  val CheckPrefix = "__generated_"

  /** Reserved TBLPROPERTIES namespace for the ALTER surface:
    * `SET TBLPROPERTIES ('graft.generated.<col>' = '<expr sql>')` ADOPTS
    * the expression onto an existing column (existing rows are validated
    * against it first — the ADD CONSTRAINT contract), `UNSET` drops it
    * and the column becomes plain (its values are already materialized,
    * so nothing else changes). See [[GraftCatalog.alterTable]]. */
  val PropPrefix = "graft.generated."

  private def checkName(col: String) = s"$CheckPrefix${col}__"

  /** The stored invariant of one generated column as a CHECK:
    * `col <=> (expr)` (never NULL, so SQL CHECK null-passing cannot
    * soften it). */
  def invariant(sp: Spec): Constraints.Check =
    Constraints.Check(checkName(sp.col),
      s"`${sp.col.replace("`", "``")}` <=> (${sp.sql})")

  /** The invariants as CHECKs for the row-level DML and streaming write
    * paths. Zero cost on tables without generated columns. */
  def implicitChecks(schema: StructType): Seq[Constraints.Check] =
    specs(schema).map(invariant)

  /** DDL-time validation (CREATE TABLE): each expression must parse,
    * resolve against the OTHER columns, be deterministic and
    * subquery/aggregate-free, not reference generated or identity
    * columns (evaluation-order dependence), and produce exactly the
    * declared type (add a CAST inside the expression otherwise). Loud at
    * declaration, never at first-write. */
  def validate(spark: org.apache.spark.sql.SparkSession,
               schema: StructType, owner: String): Unit = {
    val generated = specs(schema).map(_.col.toLowerCase(java.util.Locale.ROOT)).toSet
    val identity = IdentityColumns.specs(schema)
      .map(_.col.toLowerCase(java.util.Locale.ROOT)).toSet
    specs(schema).foreach { sp =>
      val what = s"$owner: generated column ${sp.col}"
      val refs = Constraints.referencedColumns(spark, sp.sql)
      require(!refs.contains(sp.col.toLowerCase(java.util.Locale.ROOT)),
        s"$what cannot reference itself (${sp.sql})")
      require(refs.intersect(generated).isEmpty,
        s"$what cannot reference another generated column " +
          s"(${refs.intersect(generated).mkString(", ")}) — evaluation order " +
          "would be ambiguous")
      require(refs.intersect(identity).isEmpty,
        s"$what cannot reference an identity column " +
          s"(${refs.intersect(identity).mkString(", ")})")
      // resolve against the non-generated columns only (self/other
      // generated refs are already rejected above with a better message)
      val visible = StructType(schema.filterNot(f =>
        generated.contains(f.name.toLowerCase(java.util.Locale.ROOT))))
      val declared = schema.find(_.name.equalsIgnoreCase(sp.col)).get.dataType
      val got = Constraints.resolvedType(spark, visible, what, sp.sql)
      require(got == declared,
        s"$what: expression '${sp.sql}' produces ${got.simpleString} but the " +
          s"column is declared ${declared.simpleString} — add an explicit " +
          "CAST inside the expression")
    }
  }

  /** Compute-or-validate every generated column of `declared` on an
    * incoming batch (the batch INSERT path; see the class doc for the
    * row-level/streaming contract). No-op for tables without generated
    * columns. */
  def fill(df: DataFrame, declared: StructType): DataFrame = {
    val sps = specs(declared)
    if (sps.isEmpty) return df
    val q = Constraints.qcol _
    sps.foldLeft(df) { (acc, sp) =>
      val dt = declared.find(_.name.equalsIgnoreCase(sp.col)).get.dataType
      val gen = expr(sp.sql).cast(dt)
      val c = q(sp.col)
      acc.withColumn(sp.col,
        when(c.isNull, gen)
          .otherwise(when(c <=> gen, c)
            .otherwise(raise_error(concat(
              lit(s"generated column ${sp.col} = (${sp.sql}): explicit value "),
              c.cast("string"),
              lit(" does not match the computed value "),
              coalesce(gen.cast("string"), lit("NULL"))))
              .cast(dt))))
    }
  }
}
