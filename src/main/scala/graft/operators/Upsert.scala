package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Keyed upsert (MERGE INTO: WHEN MATCHED update, WHEN NOT MATCHED insert)
  * on plain DataFrames — the CDC/merge pattern table formats provide,
  * expressed with built-ins since this deployment ships no Delta/Iceberg
  * jars (README "table format note").
  *
  * updates win on key collision; the anti join keeps untouched rows. Both
  * sides shuffle once on the key (or broadcast when the update batch is
  * small — the common CDC case, left to Catalyst's size estimate).
  *
  * Scale pattern: partition the lake by a key-derived column, semi-join the
  * partition list against the update keys, and rewrite ONLY partitions
  * containing updated keys — the merge itself stays this exact plan per
  * rewritten partition.
  */
object Upsert {

  def upsert(existing: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    updates.unionByName(
      existing.join(updates.select(keys.map(col): _*), keys, "left_anti"))
  }
}
