package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of oracle-checked queries.
  *
  * Each entry in [[queries]] is one operator from SURVEY.md §2; each entry in
  * [[oracle]] is the equivalent ANSI SQL the driver runs in DuckDB over the
  * same parquet tables. Queries absent from [[oracle]] get the driver's weaker
  * rows-only check (used only for hash-seeded approximate operators whose
  * exact output is not portable across engines).
  *
  * Contract (driver compare): column NAMES must match between the Spark result
  * and the oracle result (the driver sorts columns by name before hashing);
  * every float column is rounded identically on both sides; every query output
  * is deterministically ordered with a total-order tie-break.
  */
trait QueryModule {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]
  def oracle: Map[String, String]
}
