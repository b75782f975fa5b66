package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the most recent right row with
  * rightTime <= leftTime, per key (SURVEY.md §2 Part B "as-of join" — one of
  * the two Part B operators with no single Spark built-in).
  *
  * Implementation: union both sides tagged, sort within each key by
  * (time, side), and carry the last-seen right row forward with
  * `last(_, ignoreNulls = true)` over an unbounded-preceding window. This is
  * a single shuffle on the key (the same partitioning a sort-merge join
  * would need) and never materializes the O(left x right) range join —
  * the standard scalable formulation.
  *
  * Right-side ties on (key, time) resolve to the largest tie-break id,
  * matching "latest row wins".
  */
object AsOfJoin {

  /** left:  (key, ltime, left cols...)
    * right: (key, rtime, valueCols...)
    * Output: left row + valueCols of the as-of match (null when no right row
    * precedes the left row).
    *
    * `toleranceSeconds` (pandas merge_asof semantics): when set, a match
    * older than the tolerance is discarded — the row survives with null
    * values, exactly as if no right row preceded it. For TimestampType time
    * columns the age comparison is FULL timestamp precision (microseconds):
    * a match 600.000001 s old fails a 600 s tolerance; any SQL replay must
    * compare epoch microseconds (e.g. DuckDB `epoch_us(lt) - epoch_us(rt)`).
    * Integral (Long/Int) time columns are treated as epoch SECONDS and
    * compared with plain long arithmetic. Other time column types reject
    * with an analysis-time error when a tolerance is set.
    */
  def asOf(left: DataFrame, right: DataFrame, key: String,
           leftTime: String, rightTime: String,
           valueCols: Seq[String],
           rightTieBreak: Option[String] = None,
           toleranceSeconds: Option[Long] = None): DataFrame = {
    val l = left.withColumn("_t", col(leftTime)).withColumn("_side", lit(1))
      .withColumn("_tid", lit(null).cast("long"))
    val r = right.withColumn("_t", col(rightTime)).withColumn("_side", lit(0))
      .withColumn("_tid", rightTieBreak.map(col(_).cast("long")).getOrElse(lit(0L)))
    val unioned = l.unionByName(
      r.select((Seq(col(key), col("_t"), col("_side"), col("_tid")) ++ valueCols.map(col)): _*),
      allowMissingColumns = true)
    // right rows sort before left rows at equal _t, so an exactly-equal
    // timestamp matches (as-of <= semantics); equal-time right rows are
    // ordered by the tie-break id so "latest wins" is deterministic
    val w = Window.partitionBy(col(key))
      .orderBy(col("_t"), col("_side"), col("_tid").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Carry the whole right ROW as one struct (null for left rows): carrying
    // each value column independently with last(ignoreNulls) would stitch
    // fields from DIFFERENT right rows whenever the most recent right row
    // holds a null in one column — the as-of match must be atomic.
    // the match's own time rides along as _rt so a tolerance can age it
    val packed = unioned.withColumn("_vals",
      when(col("_side") === 0,
        struct((col("_t").as("_rt") +: valueCols.map(col)): _*)))
    val carried = packed
      .withColumn("_asof", last(col("_vals"), ignoreNulls = true).over(w))
    val inTolerance = toleranceSeconds match {
      case Some(tol) =>
        import org.apache.spark.sql.types.{IntegerType, LongType, TimestampType}
        val age = unioned.schema("_t").dataType match {
          case TimestampType =>
            (unix_micros(col("_t")) - unix_micros(col("_asof._rt"))) <= tol * 1000000L
          case LongType | IntegerType => // epoch seconds, plain arithmetic
            (col("_t").cast("long") - col("_asof._rt").cast("long")) <= tol
          case other => throw new IllegalArgumentException(
            s"asOf toleranceSeconds requires TimestampType or integral epoch-second " +
              s"time columns; got $other for '$leftTime'/'$rightTime'")
        }
        col("_asof").isNotNull && age
      case None => col("_asof").isNotNull
    }
    valueCols.foldLeft(carried.filter(col("_side") === 1)) { (df, c) =>
        df.withColumn(s"asof_$c", when(inTolerance, col(s"_asof.$c")))
      }
      .drop((Seq("_t", "_side", "_tid", "_vals", "_asof") ++ valueCols): _*)
  }
}
