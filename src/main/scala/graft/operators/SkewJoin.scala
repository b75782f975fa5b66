package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY.md §7.5: `fhir_tenant_id` is the
  * hot key at 100 TB — one tenant can dominate a partition).
  *
  * Left rows get a random salt in [0, saltFactor); right rows are replicated
  * once per salt value. The join key becomes (key, salt), spreading a hot
  * key over `saltFactor` reducers. Semantically identical to the plain join
  * (asserted in SkewJoinSpec); cost: right side x saltFactor — use for
  * fact-x-dimension shapes where the dimension is small but too big (or too
  * skewed) to broadcast.
  *
  * AQE's skew-join splitting handles sort-merge skew automatically; this
  * explicit form covers aggregations-after-join and engines/paths AQE
  * doesn't reach, and makes the technique testable.
  */
object SkewJoin {

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltFactor: Int): DataFrame = {
    require(saltFactor > 0)
    // deterministic salt: hash of the full row spread over saltFactor —
    // avoids rand() (non-reproducible across retries, breaks speculative
    // execution at scale)
    val salted = left.withColumn("_salt",
      pmod(xxhash64(struct(left.columns.map(col): _*)), lit(saltFactor)))
    val replicated = right.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1)).cast("array<long>")))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
