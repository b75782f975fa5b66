package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2: every change closes the key's open
  * version (valid_to = change ts) and appends a new open version — the
  * standard warehouse history-tracking merge, expressed with built-ins
  * (unionByName + one equi/anti join pair on the key, no table format
  * needed).
  *
  * Contract: `current` carries `valid_from`/`valid_to` (open rows have
  * NULL valid_to); `changes` carries the same key+attribute columns plus
  * `tsCol`, with AT MOST ONE change per key per batch (pre-aggregate a
  * multi-change batch to last-per-key with a window first). All four row
  * classes shuffle once on the key; at scale, partition the dimension by
  * key bucket so the rewrite is per-bucket.
  */
object Scd2 {

  def applyChanges(current: DataFrame, changes: DataFrame,
                   keys: Seq[String], tsCol: String): DataFrame = {
    require(keys.nonEmpty, "scd2 needs at least one key column")
    val validToType = current.schema("valid_to").dataType
    val chg = changes.withColumnRenamed(tsCol, "_chg_ts")
    val chgKeys = chg.select(keys.map(col): _*)
    val open = current.filter(col("valid_to").isNull)

    val history = current.filter(col("valid_to").isNotNull)
    val closedNow = open.drop("valid_to")
      .join(chg.select((keys.map(col) :+ col("_chg_ts")): _*), keys)
      .withColumn("valid_to", col("_chg_ts").cast(validToType))
      .drop("_chg_ts")
    val untouchedOpen = open.join(chgKeys, keys, "left_anti")
    val newOpen = chg
      .withColumn("valid_from", col("_chg_ts"))
      .withColumn("valid_to", lit(null).cast(validToType))
      .drop("_chg_ts")

    history.unionByName(closedNow).unionByName(untouchedOpen).unionByName(newOpen)
  }
}
