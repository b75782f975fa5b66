package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
import org.scalatest.funsuite.AnyFunSuite

/** Scale lint: a window with an EMPTY partition spec funnels every row
  * through a single task — the classic silent scale killer. Walk every
  * batch query's optimized plan and require global windows only where the
  * semantics genuinely demand a global order (documented allowlist).
  */
class ScaleLintSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  /** Queries whose global window is semantically required and documented:
    * ntile/percent_rank/cume_dist are global-rank statistics by definition,
    * and the packing queries' offsets window (qt08 tokens, qm05 media
    * batches) runs over one row PER PARTITION — the tiny phase-2 frame of
    * the distributed prefix sum. */
  private val allowedGlobal = Set(
    "q27_ntile_window", "q47_rank_distribution", "qt08_token_packing",
    "qm05_media_batching")

  /** Batch queries that build lazily (or with cheap side effects) at
    * sf0.001; lake/streaming modules execute real jobs in their builders
    * and are covered by their own plan specs. */
  private def lintable(name: String): Boolean =
    !name.startsWith("qc") && !name.startsWith("qs")

  test("no undeclared single-task (unpartitioned) windows in batch plans") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filter(lintable)
      .flatMap { name =>
        val plan = SparkEntry.queries(name)(spark, sf).queryExecution.optimizedPlan
        val globals = plan.collect {
          case w: LWindow if w.partitionSpec.isEmpty => w
        }
        if (globals.nonEmpty && !allowedGlobal.contains(name)) Some(name) else None
      }
    assert(offenders.isEmpty,
      s"queries with undeclared global windows: ${offenders.mkString(", ")}")
  }
}
