package graft.queries

import graft.core.Tables
import org.apache.spark.sql.functions._

/** Round-2 coverage closure: the subquery family (scalar, IN/NOT IN,
  * correlated scalar, LATERAL top-k per key), unpivot/melt, bucketed-table
  * co-located joins, and the automatic range-join rewrite rule
  * ([[graft.plans.RangeJoinRewrite]]) exercised through the SQL front door.
  *
  * Scale notes:
  *  - subqueries decorrelate into joins (Catalyst RewriteCorrelatedScalarSubquery
  *    / RewritePredicateSubquery) — asserted in PlanShapeSpec, so EXISTS/IN
  *    run as semi/anti hash joins, not per-row probes;
  *  - the bucketed join pre-shuffles both fact tables once at write time;
  *    every subsequent join on the bucket key is exchange-free (the pattern
  *    that amortizes the big shuffle across repeated queries at 100 TB);
  *  - q45's BETWEEN join would plan as BroadcastNestedLoopJoin; the
  *    installed optimizer rule turns it into a bucketed equi-join.
  */
object AdvancedQueries extends QueryModule {

  override val queries: Map[String, Q] = Map(
    // --- uncorrelated scalar subquery (exact max: portable across engines) ---
    "q39_scalar_subquery" -> { (s, d) =>
      Tables.orders(s, d).createOrReplaceTempView("q39_orders")
      s.sql("""
        SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
        FROM q39_orders
        WHERE o_totalprice > 0.9 * (SELECT max(o_totalprice) FROM q39_orders)
        ORDER BY o_orderkey""")
    },

    // --- IN + NOT IN predicate subqueries (semi/anti join decorrelation) ---
    "q40_in_subquery" -> { (s, d) =>
      Tables.customer(s, d).createOrReplaceTempView("q40_customer")
      Tables.orders(s, d).createOrReplaceTempView("q40_orders")
      s.sql("""
        SELECT c_custkey, c_name
        FROM q40_customer
        WHERE c_custkey IN (SELECT o_custkey FROM q40_orders WHERE o_totalprice > 300000)
          AND c_custkey NOT IN (SELECT o_custkey FROM q40_orders WHERE o_totalprice < 2000)
        ORDER BY c_custkey""")
    },

    // --- correlated scalar subquery (per-row count -> decorrelated join) ---
    "q41_correlated_count" -> { (s, d) =>
      Tables.orders(s, d).createOrReplaceTempView("q41_orders")
      Tables.lineitem(s, d).createOrReplaceTempView("q41_lineitem")
      s.sql("""
        SELECT o_orderkey,
               (SELECT count(*) FROM q41_lineitem l
                WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 30) AS n_big_items
        FROM q41_orders o
        WHERE o_orderkey < 2000
        ORDER BY o_orderkey""")
    },

    // --- LATERAL correlated subquery: top-2 orders per customer ---
    "q42_lateral_topk" -> { (s, d) =>
      Tables.customer(s, d).createOrReplaceTempView("q42_customer")
      Tables.orders(s, d).createOrReplaceTempView("q42_orders")
      s.sql("""
        SELECT c.c_custkey, o.o_orderkey, round(o.o_totalprice, 2) AS o_totalprice
        FROM q42_customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM q42_orders
                 WHERE o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        WHERE c.c_custkey < 100
        ORDER BY c_custkey, o_orderkey""")
    },

    // --- unpivot / melt (wide -> long) ---
    "q43_unpivot" -> { (s, d) =>
      Tables.part(s, d)
        .filter(col("p_partkey") <= 200)
        .select(col("p_partkey"),
          col("p_size").cast("double").as("size"),
          round(col("p_retailprice"), 2).as("retailprice"))
        .unpivot(Array(col("p_partkey")), Array(col("size"), col("retailprice")),
          "metric", "val")
        .orderBy("p_partkey", "metric")
    },

    // --- bucketed-table co-located join: both facts bucketed+sorted by the
    //     join key at write time; the merge join then needs no exchange
    //     (plan asserted in BucketingSpec) ---
    "q44_bucketed_join" -> { (s, d) =>
      val liPath = graft.core.TempDirs.create("graft_bk_li_")
      val ordPath = graft.core.TempDirs.create("graft_bk_ord_")
      Tables.lineitem(s, d).select("l_orderkey", "l_extendedprice", "l_discount")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", liPath).mode("overwrite").saveAsTable("q44_li_bucketed")
      Tables.orders(s, d).select("o_orderkey", "o_orderpriority")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", ordPath).mode("overwrite").saveAsTable("q44_ord_bucketed")
      // MERGE hint pins sort-merge (vs broadcast) so the exchange-free
      // bucketed path is what actually runs, independent of size estimates
      s.table("q44_li_bucketed").hint("merge")
        .join(s.table("q44_ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_lines"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
        .orderBy("o_orderpriority")
    },

    // --- interval join through the SQL front door, auto-rewritten by the
    //     RangeJoinRewrite optimizer rule into a bucketed equi-join ---
    "q45_range_join_rule" -> { (s, d) =>
      graft.plans.RangeJoinRewrite.install(s, binSize = 600L)
      Tables.events(s, d)
        .select(col("user_id"), unix_timestamp(col("ts")).as("sec"))
        .createOrReplaceTempView("q45_ev")
      s.sql("""
        WITH w AS (SELECT user_id AS wuser, min(sec) AS lo, min(sec) + 600 AS hi
                   FROM q45_ev GROUP BY user_id)
        SELECT w.wuser AS user_id, count(*) AS n_in_window
        FROM q45_ev e JOIN w ON e.sec >= w.lo AND e.sec < w.hi
        GROUP BY w.wuser
        ORDER BY user_id""")
    }
  )

  override val oracle: Map[String, String] = Map(
    "q39_scalar_subquery" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
         FROM orders
         WHERE o_totalprice > 0.9 * (SELECT max(o_totalprice) FROM orders)
         ORDER BY o_orderkey""",

    "q40_in_subquery" ->
      """SELECT c_custkey, c_name
         FROM customer
         WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
           AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice < 2000)
         ORDER BY c_custkey""",

    "q41_correlated_count" ->
      """SELECT o_orderkey,
           (SELECT count(*) FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 30) AS n_big_items
         FROM orders o
         WHERE o_orderkey < 2000
         ORDER BY o_orderkey""",

    "q42_lateral_topk" ->
      """SELECT c.c_custkey, o.o_orderkey, round(o.o_totalprice, 2) AS o_totalprice
         FROM customer c,
         LATERAL (SELECT o_orderkey, o_totalprice FROM orders
                  WHERE o_custkey = c.c_custkey
                  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
         WHERE c.c_custkey < 100
         ORDER BY c_custkey, o_orderkey""",

    "q43_unpivot" ->
      """SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS val
         FROM part WHERE p_partkey <= 200
         UNION ALL
         SELECT p_partkey, 'retailprice', round(p_retailprice, 2)
         FROM part WHERE p_partkey <= 200
         ORDER BY p_partkey, metric""",

    "q44_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n_lines,
           round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q45_range_join_rule" ->
      """WITH e AS (SELECT user_id,
             CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec
           FROM events),
         w AS (SELECT user_id AS wuser, min(sec) AS lo, min(sec) + 600 AS hi
               FROM e GROUP BY user_id)
         SELECT w.wuser AS user_id, count(*) AS n_in_window
         FROM e JOIN w ON e.sec >= w.lo AND e.sec < w.hi
         GROUP BY w.wuser
         ORDER BY user_id"""
  )
}
