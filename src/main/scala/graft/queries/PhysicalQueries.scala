package graft.queries

import graft.core.Tables
import graft.plans.TopKPerGroup
import org.apache.spark.sql.functions._

/** Queries exercising whole-operator physical extensions
  * ([[graft.plans.TopKPerGroupExec]]) — the SparkStrategy/SparkPlan layer
  * of the extension ladder (SURVEY §4.3), used only where composing
  * built-in operators leaves avoidable per-row cost (here: the window
  * group-limit path full-sorts every input partition to keep k per group;
  * the custom exec replaces both sorts + Window with O(log k) heaps).
  */
object PhysicalQueries extends QueryModule {

  override val queries: Map[String, Q] = Map(
    // --- custom physical operator: bounded-heap top-k per group ---
    // row_number-equivalent result, but the plan is partial-heap ->
    // exchange(group) -> final-heap: no Window, no Sort anywhere; shuffle
    // carries at most k rows per (group, input partition). TopKPerGroupSpec
    // asserts the plan shape; the oracle pins the semantics.
    "q59_topk_physical" -> { (s, d) =>
      val top = TopKPerGroup(
        Tables.orders(s, d).select("o_custkey", "o_orderkey", "o_totalprice"),
        groupCols = Seq("o_custkey"),
        orderKeys = Seq(("o_totalprice", false), ("o_orderkey", true)),
        k = 3)
      top.select(col("o_custkey"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // --- deterministic per-group eval sampling: k docs per language in
    //     md5(doc_id) order — reproducible across runs/engines/cluster
    //     sizes (unlike rand()), and served by the same heap operator, so
    //     the "sample k per stratum" pipeline step never sorts a stratum ---
    "qt12_eval_sample" -> { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("lang"), col("doc_id"),
          md5(col("doc_id").cast("string")).as("h"))
      TopKPerGroup(docs, groupCols = Seq("lang"),
          orderKeys = Seq(("h", true), ("doc_id", true)), k = 5)
        .select("lang", "doc_id")
        .orderBy("lang", "doc_id")
    }
  )

  override val oracle: Map[String, String] = Map(
    "q59_topk_physical" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice
         FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
               FROM orders)
         WHERE rn <= 3
         ORDER BY o_custkey, o_orderkey""",

    "qt12_eval_sample" ->
      """SELECT lang, doc_id
         FROM (SELECT lang, doc_id,
                 row_number() OVER (PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
               FROM documents)
         WHERE rn <= 5
         ORDER BY lang, doc_id"""
  )
}
