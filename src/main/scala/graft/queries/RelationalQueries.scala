package graft.queries

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational operator surface (SURVEY.md §2 Part B: scans, filters, joins,
  * aggregations, windows, sorts, set ops, scalar function families).
  *
  * Design notes for 100 TB scale, per query:
  *  - selective filters are expressed before joins/aggs so Catalyst pushes
  *    them into the parquet scan (partition/row-group pruning);
  *  - dimension sides of star joins are `broadcast()`-hinted (region, nation,
  *    customer, supplier are tiny relative to the fact tables);
  *  - aggregations use Spark's partial (map-side) + final hash aggregation —
  *    no `collect`, no driver-side loops;
  *  - all money/ratio outputs are rounded identically to the DuckDB oracle,
  *    and every result has a deterministic total order.
  */
object RelationalQueries extends QueryModule {

  private val shipCutoff = "1998-09-01 00:00:00"

  override val queries: Map[String, Q] = Map(
    // --- aggregation: filter + groupBy + multi-agg + sort (TPC-H Q1 shape) ---
    "q01_pricing_summary" -> { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= to_timestamp(lit(shipCutoff)))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_extendedprice"), 4).as("avg_price"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // --- selective filter + scalar agg (TPC-H Q6 shape; pushdown showcase) ---
    "q02_revenue_forecast" -> { (s, d) =>
      Tables.lineitem(s, d)
        .filter(
          col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1997-01-01 00:00:00")) &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))
    },

    // --- 3-way join + agg + top-k (TPC-H Q3 shape) ---
    "q03_top_orders" -> { (s, d) =>
      val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val ord = Tables.orders(s, d)
      val li = Tables.lineitem(s, d)
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // --- left-semi join (EXISTS semantics; A17/A18 batch-exists) ---
    "q04_semi_join" -> { (s, d) =>
      val ord = Tables.orders(s, d)
      val bigLines = Tables.lineitem(s, d).filter(col("l_quantity") >= 49)
      ord.join(bigLines, ord("o_orderkey") === bigLines("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("o_totalprice"))
        .orderBy("o_orderkey")
    },

    // --- left-anti join (NOT EXISTS) ---
    "q05_anti_join" -> { (s, d) =>
      val cust = Tables.customer(s, d)
      val jumbo = Tables.orders(s, d).filter(col("o_totalprice") > 350000)
      cust.join(jumbo, cust("c_custkey") === jumbo("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // --- left outer join + agg incl. empty groups (TPC-H Q13 shape) ---
    "q06_orders_per_customer" -> { (s, d) =>
      val cust = Tables.customer(s, d)
      val ord = Tables.orders(s, d)
      cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("order_count"))
        .groupBy("order_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("order_count").desc)
    },

    // --- 6-way star join with broadcast dims (TPC-H Q5 shape) ---
    "q07_regional_revenue" -> { (s, d) =>
      val region = Tables.region(s, d).filter(col("r_name") === "ASIA")
      val nation = Tables.nation(s, d)
      val cust = Tables.customer(s, d)
      val supp = Tables.supplier(s, d)
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
                col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
      val li = Tables.lineitem(s, d)
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(broadcast(supp), li("l_suppkey") === supp("s_suppkey"))
        .join(broadcast(cust), ord("o_custkey") === cust("c_custkey") &&
                                cust("c_nationkey") === supp("s_nationkey"))
        .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
        .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
        .groupBy("n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // --- ranking window: row_number / rank / dense_rank, top-k per group ---
    "q08_top_customers_per_nation" -> { (s, d) =>
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables.customer(s, d)
        .withColumn("rn", row_number().over(w))
        .withColumn("rk", rank().over(w))
        .withColumn("drk", dense_rank().over(w))
        .filter(col("rn") <= 3)
        .select(col("c_nationkey"), col("c_custkey"),
          round(col("c_acctbal"), 2).as("c_acctbal"), col("rn"), col("rk"), col("drk"))
        .orderBy("c_nationkey", "rn")
    },

    // --- analytic window: running sum + lag over a frame ---
    "q09_running_totals" -> { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("running_spend",
          round(sum(col("o_totalprice")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2))
        .withColumn("prev_price", round(lag(col("o_totalprice"), 1).over(w), 2))
        .filter(col("o_custkey") < 100)
        .select(col("o_custkey"), col("o_orderkey"), col("running_spend"), col("prev_price"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // --- rollup (hierarchical grouping sets) ---
    // Expressed through the SQL front door: the DataFrame rollup-after-join
    // trips Spark 4.1's DetectAmbiguousSelfJoin false positive (rollup's
    // Expand duplicates grouping attributes carrying dataset-id tags);
    // SQL-resolved plans carry no dataset-id metadata, so no unsafe
    // session-wide conf override is needed.
    "q10_rollup_region_nation" -> { (s, d) =>
      Tables.customer(s, d).createOrReplaceTempView("q10_customer")
      Tables.nation(s, d).createOrReplaceTempView("q10_nation")
      Tables.region(s, d).createOrReplaceTempView("q10_region")
      s.sql("""
        SELECT coalesce(r_name, 'ALL') AS r_name, coalesce(n_name, 'ALL') AS n_name,
               count(*) AS n_customers, round(sum(c_acctbal), 2) AS total_bal
        FROM q10_customer
        JOIN q10_nation ON c_nationkey = n_nationkey
        JOIN q10_region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
        ORDER BY coalesce(r_name, 'ALL'), coalesce(n_name, 'ALL')""")
    },

    // --- cube (all grouping sets) ---
    "q11_cube_flag_status" -> { (s, d) =>
      Tables.lineitem(s, d)
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
          col("n"), col("qty"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // --- count distinct (exact) ---
    "q12_distinct_parts" -> { (s, d) =>
      // fanOut: the multi-distinct Expand (x3 rows) otherwise grinds on a
      // single task over a 1-split local input; no-op at cluster widths
      graft.core.Parallelism.fanOut(Tables.lineitem(s, d))
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    },

    // --- set operations: union / intersect / except (DISTINCT semantics) ---
    "q13_set_ops" -> { (s, d) =>
      val cust = Tables.customer(s, d)
      val ord = Tables.orders(s, d)
      val building = cust.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val bigSpenders = ord.filter(col("o_totalprice") > 250000).select(col("o_custkey").as("c_custkey")).distinct()
      val u = building.union(bigSpenders).distinct().withColumn("op", lit("union"))
      val i = building.intersect(bigSpenders).withColumn("op", lit("intersect"))
      val e = building.except(bigSpenders).withColumn("op", lit("except"))
      u.unionByName(i).unionByName(e).orderBy("op", "c_custkey")
    },

    // --- global sort + limit ---
    "q14_priciest_orders" -> { (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("o_totalprice"), col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(25)
    },

    // --- LIMIT ... OFFSET pagination through the SQL front door: Spark 4
    //     folds the offset into TakeOrderedAndProject (top-(k+offset)
    //     per partition, one driver-side trim — no global Sort, no
    //     second pass), the plan shape PlanShapeSpec asserts ---
    "q64_offset_pagination" -> { (s, d) =>
      Tables.orders(s, d).createOrReplaceTempView("q64_orders")
      s.sql("""
        SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
        FROM q64_orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10 OFFSET 20""")
    },

    // --- string function family (A6/A14/A23 decomposed) ---
    "q15_string_funcs" -> { (s, d) =>
      Tables.part(s, d)
        .filter(col("p_partkey") <= 500)
        .select(
          col("p_partkey"),
          lower(col("p_name")).as("lname"),
          upper(col("p_brand")).as("ubrand"),
          substring(col("p_type"), 1, 5).as("type5"),
          length(col("p_name")).as("name_len"),
          concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
          element_at(split(col("p_type"), " "), 1).as("type_head"),
          regexp_replace(col("p_name"), "[aeiou]", "").as("consonants"),
          locate("a", col("p_name")).as("first_a"),
          trim(col("p_name")).as("trimmed"))
        .orderBy("p_partkey")
    },

    // --- date/time function family (A1 _date, A3 time decomposed) ---
    "q16_date_funcs" -> { (s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderkey") <= 2000)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dom"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("iso_date"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          datediff(col("o_orderdate"), to_date(lit("1995-01-01"))).as("days_since_95"))
        .orderBy("o_orderkey")
    },

    // --- conditional expressions: CASE WHEN bucketing ---
    "q17_price_buckets" -> { (s, d) =>
      Tables.orders(s, d)
        .withColumn("bucket",
          when(col("o_totalprice") < 50000, "low")
            .when(col("o_totalprice") < 150000, "mid")
            .when(col("o_totalprice") < 300000, "high")
            .otherwise("jumbo"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          round(avg("o_totalprice"), 2).as("avg_price"))
        .orderBy("bucket")
    },

    // --- pivot (wide aggregation) ---
    "q18_pivot_returnflag" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_linestatus")
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(round(sum("l_quantity"), 2))
        .orderBy("l_linestatus")
    },

    // --- exact percentiles (continuous interpolation) ---
    "q19_price_percentiles" -> { (s, d) =>
      // ONE percentile aggregate with an array of fractions: the exact
      // Percentile agg buffers a value->count map per (group, agg-expr),
      // so three scalar calls build and merge three 200k-entry maps where
      // one array call builds one (measured 3.7 s -> 1.5 s at sf0.1)
      // fanOut parallelizes the partial value->count buffers; the exact
      // Percentile merge is a count-map union — order-independent
      graft.core.Parallelism.fanOut(Tables.lineitem(s, d))
        .groupBy("l_returnflag")
        .agg(expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D))").as("_ps"))
        .select(col("l_returnflag"),
          round(element_at(col("_ps"), 1), 4).as("p25"),
          round(element_at(col("_ps"), 2), 4).as("p50"),
          round(element_at(col("_ps"), 3), 4).as("p75"))
        .orderBy("l_returnflag")
    },

    // --- JSON functions over events.props (A5/A7/A8 surface) ---
    "q20_json_extract" -> { (s, d) =>
      Tables.events(s, d)
        .filter(col("event_id") < 500)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("bigint").as("k"),
          col("event_type"))
        .orderBy("event_id")
    },

    // --- cross join (small dims) ---
    "q21_region_pairs" -> { (s, d) =>
      val r1 = Tables.region(s, d).select(col("r_name").as("r1"))
      val r2 = Tables.region(s, d).select(col("r_name").as("r2"))
      r1.crossJoin(r2).filter(col("r1") < col("r2")).orderBy("r1", "r2")
    },

    // --- full outer join ---
    "q22_full_outer" -> { (s, d) =>
      val suppNations = Tables.supplier(s, d).groupBy("s_nationkey")
        .agg(count(lit(1)).as("n_supp"))
      val custNations = Tables.customer(s, d).groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_cust"))
      suppNations.join(custNations,
          suppNations("s_nationkey") === custNations("c_nationkey"), "full")
        .select(
          coalesce(col("s_nationkey"), col("c_nationkey")).as("nationkey"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"))
        .orderBy("nationkey")
    }
  )

  override val oracle: Map[String, String] = Map(
    "q64_offset_pagination" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
         FROM orders
         ORDER BY o_totalprice DESC, o_orderkey
         LIMIT 10 OFFSET 20""",

    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity),2) AS sum_qty,
         round(sum(l_extendedprice),2) AS sum_base_price,
         round(sum(l_extendedprice*(1.0-l_discount)),2) AS sum_disc_price,
         round(avg(l_quantity),4) AS avg_qty,
         round(avg(l_extendedprice),4) AS avg_price,
         round(avg(l_discount),4) AS avg_disc,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '$shipCutoff'
         GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",

    "q02_revenue_forecast" ->
      """SELECT round(sum(l_extendedprice*l_discount),2) AS revenue FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
           AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",

    "q03_top_orders" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
         round(sum(l_extendedprice*(1.0-l_discount)),2) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
         GROUP BY l_orderkey, o_orderdate, o_orderpriority
         ORDER BY revenue DESC, l_orderkey LIMIT 10""",

    "q04_semi_join" ->
      """SELECT o_orderkey, round(o_totalprice,2) AS o_totalprice FROM orders
         WHERE EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
         ORDER BY o_orderkey""",

    "q05_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_totalprice > 350000)
         ORDER BY c_custkey""",

    "q06_orders_per_customer" ->
      """SELECT order_count, count(*) AS custdist FROM (
           SELECT c_custkey, count(o_orderkey) AS order_count
           FROM customer LEFT JOIN orders ON c_custkey = o_custkey
           GROUP BY c_custkey)
         GROUP BY order_count ORDER BY custdist DESC, order_count DESC""",

    "q07_regional_revenue" ->
      """SELECT n_name, round(sum(l_extendedprice*(1.0-l_discount)),2) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         GROUP BY n_name ORDER BY revenue DESC, n_name""",

    "q08_top_customers_per_nation" ->
      """SELECT c_nationkey, c_custkey, round(c_acctbal,2) AS c_acctbal, rn, rk, drk FROM (
           SELECT c_nationkey, c_custkey, c_acctbal,
             row_number() OVER w AS rn, rank() OVER w AS rk, dense_rank() OVER w AS drk
           FROM customer
           WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey))
         WHERE rn <= 3 ORDER BY c_nationkey, rn""",

    "q09_running_totals" ->
      """SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS running_spend,
           round(lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),2) AS prev_price
         FROM orders QUALIFY o_custkey < 100 ORDER BY o_custkey, o_orderkey""",

    "q10_rollup_region_nation" ->
      """SELECT coalesce(r_name,'ALL') AS r_name, coalesce(n_name,'ALL') AS n_name,
           count(*) AS n_customers, round(sum(c_acctbal),2) AS total_bal
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP (r_name, n_name)
         ORDER BY coalesce(r_name,'ALL'), coalesce(n_name,'ALL')""",

    "q11_cube_flag_status" ->
      """SELECT coalesce(l_returnflag,'ALL') AS l_returnflag,
           coalesce(l_linestatus,'ALL') AS l_linestatus,
           count(*) AS n, round(sum(l_quantity),2) AS qty
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         ORDER BY coalesce(l_returnflag,'ALL'), coalesce(l_linestatus,'ALL')""",

    "q12_distinct_parts" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q13_set_ops" ->
      """WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
         big AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 250000)
         SELECT c_custkey, op FROM (
           SELECT c_custkey, 'union' AS op FROM (SELECT * FROM building UNION SELECT * FROM big)
           UNION ALL
           SELECT c_custkey, 'intersect' AS op FROM (SELECT * FROM building INTERSECT SELECT * FROM big)
           UNION ALL
           SELECT c_custkey, 'except' AS op FROM (SELECT * FROM building EXCEPT SELECT * FROM big))
         ORDER BY op, c_custkey""",

    "q14_priciest_orders" ->
      """SELECT o_orderkey, round(o_totalprice,2) AS o_totalprice, o_orderpriority
         FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""",

    "q15_string_funcs" ->
      """SELECT p_partkey, lower(p_name) AS lname, upper(p_brand) AS ubrand,
           substring(p_type, 1, 5) AS type5, CAST(length(p_name) AS INTEGER) AS name_len,
           p_brand || '/' || p_type AS brand_type,
           string_split(p_type, ' ')[1] AS type_head,
           regexp_replace(p_name, '[aeiou]', '', 'g') AS consonants,
           CAST(coalesce(position('a' IN p_name), 0) AS INTEGER) AS first_a,
           trim(p_name) AS trimmed
         FROM part WHERE p_partkey <= 500 ORDER BY p_partkey""",

    "q16_date_funcs" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS yr,
           CAST(month(o_orderdate) AS INTEGER) AS mo,
           CAST(day(o_orderdate) AS INTEGER) AS dom,
           strftime(o_orderdate, '%Y-%m-%d') AS iso_date,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INTEGER) AS days_since_95
         FROM orders WHERE o_orderkey <= 2000 ORDER BY o_orderkey""",

    "q17_price_buckets" ->
      """SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
                WHEN o_totalprice < 150000 THEN 'mid'
                WHEN o_totalprice < 300000 THEN 'high'
                ELSE 'jumbo' END AS bucket,
           count(*) AS n, round(avg(o_totalprice),2) AS avg_price
         FROM orders GROUP BY 1 ORDER BY bucket""",

    "q18_pivot_returnflag" ->
      """SELECT l_linestatus,
           round(sum(CASE WHEN l_returnflag='A' THEN l_quantity END),2) AS "A",
           round(sum(CASE WHEN l_returnflag='N' THEN l_quantity END),2) AS "N",
           round(sum(CASE WHEN l_returnflag='R' THEN l_quantity END),2) AS "R"
         FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""",

    "q19_price_percentiles" ->
      """SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.25),4) AS p25,
           round(quantile_cont(l_extendedprice, 0.5),4) AS p50,
           round(quantile_cont(l_extendedprice, 0.75),4) AS p75
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q20_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, event_type
         FROM events WHERE event_id < 500 ORDER BY event_id""",

    "q21_region_pairs" ->
      """SELECT a.r_name AS r1, b.r_name AS r2 FROM region a CROSS JOIN region b
         WHERE a.r_name < b.r_name ORDER BY r1, r2""",

    "q22_full_outer" ->
      """WITH sn AS (SELECT s_nationkey, count(*) AS n_supp FROM supplier GROUP BY s_nationkey),
         cn AS (SELECT c_nationkey, count(*) AS n_cust FROM customer GROUP BY c_nationkey)
         SELECT coalesce(s_nationkey, c_nationkey) AS nationkey,
           coalesce(n_supp, 0) AS n_supp, coalesce(n_cust, 0) AS n_cust
         FROM sn FULL OUTER JOIN cn ON s_nationkey = c_nationkey ORDER BY nationkey"""
  )
}
