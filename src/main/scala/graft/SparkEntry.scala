package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every query module's (name -> query) and (name -> oracle SQL)
  * maps. Each query is one operator from SURVEY.md §2; the driver verifies
  * each against DuckDB on sf0.01 and benches the set on sf0.1.
  */
object SparkEntry {

  private val modules: Seq[QueryModule] = Seq(
    RelationalQueries,
    LakeQueries,
    TextQueries,
    VectorQueries,
    JoinQueries,
    MultimodalQueries,
    StreamingQueries,
    CoverageQueries,
    AdvancedQueries,
    PhysicalQueries
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys (hash-seeded approximate ops)
    * get the driver's rows-only check. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracle).toMap
}
