package graft.queries

import graft.core.Tables
import graft.operators.{AsOfJoin, RangeJoin}
import org.apache.spark.sql.functions._

/** Composite join operators over the `events` stream table: as-of join and
  * bucketed range join — the two SURVEY.md §2 Part B operators with no
  * single Spark built-in (§7.5). Oracles replay the semantics with
  * correlated subqueries / a plain interval join, which DuckDB executes
  * natively (IEJoin).
  */
object JoinQueries extends QueryModule {

  override val queries: Map[String, Q] = Map(
    // --- as-of join: for each purchase, the latest same-user error at or
    //     before it (union + carry-forward window: one shuffle, no O(n*m)) ---
    "q23_asof_join" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts").as("rts"),
          col("event_id").as("rid"), col("value").as("rvalue"))
      AsOfJoin.asOf(purchases, errors, key = "user_id",
          leftTime = "ts", rightTime = "rts",
          valueCols = Seq("rts", "rvalue"), rightTieBreak = Some("rid"))
        .select(col("event_id"), col("user_id"),
          col("asof_rts").as("last_error_ts"),
          round(col("asof_rvalue"), 2).as("last_error_value"))
        .orderBy("event_id")
    },

    // --- as-of with tolerance (pandas merge_asof semantics): matches older
    //     than 10 minutes are discarded, the left row survives with nulls ---
    "q56_asof_tolerance" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("rts"),
          col("event_id").as("rid"), col("value").as("rvalue"))
      AsOfJoin.asOf(purchases, clicks, key = "user_id",
          leftTime = "ts", rightTime = "rts",
          valueCols = Seq("rvalue"), rightTieBreak = Some("rid"),
          toleranceSeconds = Some(600L))
        .select(col("event_id"),
          round(col("asof_rvalue"), 2).as("recent_click_value"))
        .orderBy("event_id")
    },

    // --- range join: all (signup, purchase) pairs with the purchase in
    //     [signup_ts, signup_ts + 10 min) — bucketed equi-join, not BNLJ ---
    "q24_range_join" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("event_id").as("l_event_id"), col("ts").as("l_ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("r_event_id"), col("ts").as("r_ts"))
      RangeJoin.timeWindowJoin(signups, purchases, "l_ts", "r_ts", winSeconds = 600L)
        .select("l_event_id", "r_event_id")
        .orderBy("l_event_id", "r_event_id")
    }
  )

  override val oracle: Map[String, String] = Map(
    "q23_asof_join" ->
      """WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
                    FROM events WHERE event_type = 'purchase'),
         e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
               FROM events WHERE event_type = 'error')
         SELECT p.event_id, p.user_id,
           (SELECT e.ts FROM e WHERE e.user_id = p.user_id AND e.ts <= p.ts
            ORDER BY e.ts DESC, e.event_id DESC LIMIT 1) AS last_error_ts,
           (SELECT round(e.value, 2) FROM e WHERE e.user_id = p.user_id AND e.ts <= p.ts
            ORDER BY e.ts DESC, e.event_id DESC LIMIT 1) AS last_error_value
         FROM p ORDER BY p.event_id""",

    "q56_asof_tolerance" ->
      """WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
                    FROM events WHERE event_type = 'purchase'),
         c AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
               FROM events WHERE event_type = 'click')
         SELECT p.event_id,
           (SELECT round(c.value, 2) FROM c
            WHERE c.user_id = p.user_id AND c.ts <= p.ts
              AND epoch_us(p.ts) - epoch_us(c.ts) <= 600000000
            ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS recent_click_value
         FROM p ORDER BY p.event_id""",

    "q24_range_join" ->
      """SELECT l.event_id AS l_event_id, r.event_id AS r_event_id
         FROM events l JOIN events r
           ON l.event_type = 'signup' AND r.event_type = 'purchase'
          AND CAST(r.ts AS TIMESTAMP) >= CAST(l.ts AS TIMESTAMP)
          AND CAST(r.ts AS TIMESTAMP) < CAST(l.ts AS TIMESTAMP) + INTERVAL 600 SECONDS
         ORDER BY l_event_id, r_event_id"""
  )
}
