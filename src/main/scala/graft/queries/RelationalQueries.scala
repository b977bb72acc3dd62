package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Sources.table

/** Relational operators at scale, beyond the reference's single-table
  * surface (SURVEY.md §2.2 notes joins/windows/set-ops are absent there).
  * These are the shapes a 100 TB pipeline lives on, formulated so Catalyst
  * produces the plan we'd want on a 1000-executor cluster:
  *
  *  - dimension tables (`customer`, `nation`, `region`) are explicitly
  *    `broadcast()` — no shuffle of the fact side for those joins;
  *  - fact-fact joins (lineitem⋈orders) shuffle on the join key once, with
  *    AQE free to re-plan skew;
  *  - aggregations are partial+final two-phase (HashAggregateExec) by
  *    construction — no driver-side loops anywhere;
  *  - top-k is orderBy+limit, planned as TakeOrderedAndProject (no global
  *    sort materialization);
  *  - double-valued aggregates are rounded identically on the Spark and
  *    oracle sides so floating summation order can't flip the hash compare.
  *
  * Every window/top-k query carries a unique tie-break key so results are
  * deterministic under any partitioning.
  */
object RelationalQueries extends QueryPack {

  private val shipCutoff = "1999-06-01 00:00:00"

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-style pricing summary: the canonical partial+final agg.
    "q1_pricing_summary" -> ((s: SparkSession, d: String) => {
      table(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf(shipCutoff)))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          count(lit(1)).as("count_order"))
    }),

    // Global top-k: TakeOrderedAndProject, deterministic via orderkey tie-break.
    "q2_topk_orders" -> ((s: SparkSession, d: String) => {
      table(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    }),

    // Broadcast dim join + agg: revenue by market segment.
    "q3_join_revenue" -> ((s: SparkSession, d: String) => {
      val orders = table(s, d, "orders")
      val cust = table(s, d, "customer")
      orders.join(broadcast(cust), orders("o_custkey") === cust("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(round(sum(col("o_totalprice")), 2).as("revenue"),
             count(lit(1)).as("n_orders"))
    }),

    // Per-key window top-N: row_number partitioned by customer.
    "q4_window_rank" -> ((s: SparkSession, d: String) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      table(s, d, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
    }),

    // Selective scan: every predicate here reaches the parquet reader
    // (PushedFilters) — verified in PlanShapeSpec.
    "q5_filter_pushdown" -> ((s: SparkSession, d: String) => {
      table(s, d, "lineitem")
        .filter(col("l_returnflag").isin("A", "R") &&
                col("l_quantity") < 10 &&
                col("l_discount").between(0.02, 0.08))
        .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"),
                col("l_discount"), col("l_returnflag"))
    }),

    // TPC-H Q5-shaped multi-join: fact⋈fact shuffle join + broadcast dims.
    "q6_multi_join_revenue" -> ((s: SparkSession, d: String) => {
      val li = table(s, d, "lineitem")
      val orders = table(s, d, "orders")
      val cust = table(s, d, "customer")
      val nation = table(s, d, "nation")
      val region = table(s, d, "region")
      li.join(orders, li("l_orderkey") === orders("o_orderkey"))
        .join(broadcast(cust), orders("o_custkey") === cust("c_custkey"))
        .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
        .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
               .as("revenue"),
             count(lit(1)).as("n_lineitems"))
    }),

    // Distinct aggregate: distinct customers + order count per status.
    "q7_distinct_agg" -> ((s: SparkSession, d: String) => {
      table(s, d, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(countDistinct(col("o_custkey")).as("n_customers"),
             count(lit(1)).as("n_orders"))
    }),

    // Anti join: customers with no high-value order (left_anti — no
    // NOT-IN null hazard, stays a broadcast/shuffled hash anti join).
    "q8_customers_without_orders" -> ((s: SparkSession, d: String) => {
      val cust = table(s, d, "customer")
      val bigOrders = table(s, d, "orders")
        .filter(col("o_totalprice") > 300000).select(col("o_custkey"))
      cust.join(bigOrders, cust("c_custkey") === bigOrders("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),

    // Semi join: parts that appear in any lineitem.
    "q9_parts_with_sales" -> ((s: SparkSession, d: String) => {
      val part = table(s, d, "part")
      val li = table(s, d, "lineitem").select(col("l_partkey"))
      part.join(li, part("p_partkey") === li("l_partkey"), "left_semi")
        .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
    }),

    // Salted skew join: identical semantics to the plain inner join (the
    // oracle), with each key spread over auto-derived buckets — the
    // count comes from the observed hottest key (SkewJoin.deriveBuckets),
    // not a fixed constant, so a 100×-skewed key spreads wider without a
    // code change.
    "q11_skew_salted_join" -> ((s: SparkSession, d: String) => {
      val orders = table(s, d, "orders")
      val cust = table(s, d, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      graft.operators.SkewJoin
        .saltedInnerJoin(orders, cust, "o_custkey", "c_custkey",
                         uniquifier = "o_orderkey")
        .groupBy(col("c_mktsegment"))
        .agg(round(sum(col("o_totalprice")), 2).as("revenue"),
             count(lit(1)).as("n_orders"))
    }),

    // Bloom-pruned semi-join: the fact side is filtered by a Bloom
    // filter of the (filtered) dim keys BEFORE the join's exchange —
    // exact result (false positives removed by the join, false negatives
    // impossible), so the plain semi-join oracle applies.
    "x48_bloom_semi_join" -> ((s: SparkSession, d: String) => {
      val li = table(s, d, "lineitem")
      val urgent = table(s, d, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      graft.operators.BloomJoin
        .bloomSemiJoin(li, urgent, "l_orderkey", "o_orderkey")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    }),

    // Z-order layout key: the Morton interleave the write path sorts by
    // ([[graft.operators.Layout]]); the head of the curve is checked
    // value-exactly (unique total order ⇒ deterministic LIMIT).
    "x52_zorder_layout" -> ((s: SparkSession, d: String) => {
      import graft.functions.ZOrderFunctions.zvalue
      table(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
                col("l_partkey"), col("l_suppkey"),
                zvalue(col("l_partkey"), col("l_suppkey")).as("zvalue"))
        .orderBy(col("zvalue"), col("l_orderkey"), col("l_linenumber"))
        .limit(100)
    }),

    // Quantile bucketing via ntile — the window-family gap q4/q14/q16
    // left open. Deterministic: the order key ends in the unique
    // o_orderkey, so tile boundaries cannot float between engines.
    "q20_ntile_quartiles" -> ((s: SparkSession, d: String) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      table(s, d, "orders")
        .select(col("o_orderpriority"), col("o_totalprice"),
                ntile(4).over(w).cast("long").as("quartile"))
        .groupBy(col("o_orderpriority"), col("quartile"))
        .agg(count(lit(1)).as("n"),
             round(sum(col("o_totalprice")), 2).as("revenue"))
    }),

    // Column-profile histogram: 20 equi-width bins of o_totalprice per
    // priority — mergeable by bin-sum (the distinct-count analogue is
    // x49), exact, one (group, bin) shuffle.
    "x53_histogram_profile" -> ((s: SparkSession, d: String) =>
      graft.operators.Profiling.histogram(
        table(s, d, "orders"), "o_totalprice", "o_orderpriority",
        lo = 0.0, hi = 600000.0, bins = 20)),

    // Hierarchical rollup (grouping sets — absent from the reference,
    // §2.2 notes the gap): revenue at (region, nation), per-region, and
    // grand-total levels in one pass.
    "q13_rollup_revenue" -> ((s: SparkSession, d: String) => {
      val cust = table(s, d, "customer")
      val nation = table(s, d, "nation")
      val region = table(s, d, "region")
      val orders = table(s, d, "orders")
      orders.join(broadcast(cust), orders("o_custkey") === cust("c_custkey"))
        .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
        .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(round(sum(col("o_totalprice")), 2).as("revenue"),
             count(lit(1)).as("n_orders"))
    }),

    // Full cube over (status, priority): all four grouping sets at once.
    "q15_cube_orders" -> ((s: SparkSession, d: String) => {
      table(s, d, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
             round(sum(col("o_totalprice")), 2).as("revenue"))
    }),

    // RANGE frame: trailing 30-day revenue per customer — the value-based
    // frame (vs q14's row-based one).
    "q16_trailing_revenue" -> ((s: SparkSession, d: String) => {
      val dayMs = 86400000L
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("order_ms"))
        .rangeBetween(-30L * dayMs, 0L)
      table(s, d, "orders")
        .withColumn("order_ms", unix_millis(col("o_orderdate").cast("timestamp")))
        .select(col("o_custkey"), col("o_orderkey"), col("order_ms"),
                round(sum(col("o_totalprice")).over(w), 2).as("trailing_30d_revenue"))
    }),

    // Running total per customer over order time — window frame surface.
    "q14_running_revenue" -> ((s: SparkSession, d: String) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // o_orderdate is TIMESTAMP_NTZ (naive parquet); under the UTC
      // session the cast to TIMESTAMP is the identity mapping DuckDB's
      // epoch_ms applies to the same naive value.
      table(s, d, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("order_ms"),
        round(sum(col("o_totalprice")).over(w), 2).as("running_revenue"))
    }),

    // Pivot: order counts per priority, statuses as columns (explicit
    // value list — at scale never let pivot scan for distinct values).
    "q17_pivot_status" -> ((s: SparkSession, d: String) => {
      table(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
    }),

    // Unpivot (melt): the inverse reshape, long-form (priority, status, n).
    "q18_unpivot_status" -> ((s: SparkSession, d: String) => {
      table(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .unpivot(Array(col("o_orderpriority")),
                 Array(col("F"), col("O"), col("P")),
                 "o_orderstatus", "n_orders")
    }),

    // Date-part extraction: monthly order aggregates.
    "q19_orders_by_month" -> ((s: SparkSession, d: String) => {
      table(s, d, "orders")
        .groupBy(year(col("o_orderdate")).cast("long").as("order_year"),
                 month(col("o_orderdate")).cast("long").as("order_month"))
        .agg(count(lit(1)).as("n_orders"),
             round(sum(col("o_totalprice")), 2).as("revenue"))
    }),

    // Sketch aggregates: the sublinear-memory statistics a 100 TB scan
    // relies on (HLL distinct counts, t-digest-style percentiles). No
    // portable oracle (sketch internals differ per engine) — accuracy vs
    // exact is asserted in ApproxStatsSpec.
    // Sketch-based stats (HLL distinct count, KLL-style quantiles). The
    // sketches themselves are engine-specific, so the verified output is
    // the exact columns plus within-5% booleans over the approximations:
    // the oracle emits TRUE literals, and a hash match therefore PROVES
    // each approximation landed inside its error bound — a value-level
    // gate an approximate answer can actually carry.
    "q12_approx_stats" -> ((s: SparkSession, d: String) => {
      table(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
             countDistinct(col("l_partkey")).as("n_parts"),
             percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000))
               .as("ap50"),
             percentile_approx(col("l_extendedprice"), lit(0.95), lit(1000))
               .as("ap95"),
             expr("percentile(l_extendedprice, 0.5)").as("ep50"),
             expr("percentile(l_extendedprice, 0.95)").as("ep95"),
             count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("n"), col("n_parts"),
          (abs(col("approx_parts") - col("n_parts"))
            <= col("n_parts") * 0.05).as("parts_within_5pct"),
          (abs(col("ap50") - col("ep50"))
            <= abs(col("ep50")) * 0.05).as("p50_within_5pct"),
          (abs(col("ap95") - col("ep95"))
            <= abs(col("ep95")) * 0.05).as("p95_within_5pct"))
    }),

    // Set ops: union/except over projections (absent from the reference;
    // part of a complete relational surface).
    "q10_setops" -> ((s: SparkSession, d: String) => {
      val cust = table(s, d, "customer")
      val building = cust.filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"), col("c_name"))
      val richAuto = cust.filter(col("c_mktsegment") === "AUTOMOBILE" &&
                                 col("c_acctbal") > 5000)
        .select(col("c_custkey"), col("c_name"))
      val negBal = cust.filter(col("c_acctbal") < 0)
        .select(col("c_custkey"), col("c_name"))
      building.union(richAuto).except(negBal)
    }))

  override val oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  round(sum(l_quantity), 2) AS sum_qty,
         |  round(sum(l_extendedprice), 2) AS sum_base_price,
         |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
         |  round(avg(l_quantity), 4) AS avg_qty,
         |  round(avg(l_extendedprice), 4) AS avg_price,
         |  count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '$shipCutoff'
         |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q2_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q3_join_revenue" ->
      """SELECT c_mktsegment, round(sum(o_totalprice), 2) AS revenue,
        |  count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q4_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin,
    "q5_filter_pushdown" ->
      """SELECT l_orderkey, l_partkey, l_quantity, l_discount, l_returnflag
        |FROM lineitem
        |WHERE l_returnflag IN ('A', 'R') AND l_quantity < 10
        |  AND l_discount BETWEEN 0.02 AND 0.08""".stripMargin,
    "q6_multi_join_revenue" ->
      """SELECT r_name, n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_lineitems
        |FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "q7_distinct_agg" ->
      """SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_customers,
        |  count(*) AS n_orders
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "q8_customers_without_orders" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)""".stripMargin,
    "q9_parts_with_sales" ->
      """SELECT p_partkey, p_name, p_retailprice FROM part
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)""".stripMargin,
    "q13_rollup_revenue" ->
      """SELECT r_name, n_name, round(sum(o_totalprice), 2) AS revenue,
        |  count(*) AS n_orders
        |FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)""".stripMargin,
    "q17_pivot_status" ->
      """SELECT o_orderpriority,
        |  count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
        |  count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
        |  count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q18_unpivot_status" ->
      """WITH p AS (
        |  SELECT o_orderpriority,
        |    count(*) FILTER (WHERE o_orderstatus = 'F') AS f,
        |    count(*) FILTER (WHERE o_orderstatus = 'O') AS o,
        |    count(*) FILTER (WHERE o_orderstatus = 'P') AS p
        |  FROM orders GROUP BY o_orderpriority)
        |SELECT o_orderpriority, 'F' AS o_orderstatus, f AS n_orders FROM p
        |UNION ALL SELECT o_orderpriority, 'O', o FROM p
        |UNION ALL SELECT o_orderpriority, 'P', p FROM p""".stripMargin,
    "q19_orders_by_month" ->
      """SELECT date_part('year', o_orderdate)::BIGINT AS order_year,
        |  date_part('month', o_orderdate)::BIGINT AS order_month,
        |  count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
        |FROM orders GROUP BY 1, 2""".stripMargin,
    "q15_cube_orders" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS revenue
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,
    "q16_trailing_revenue" ->
      """SELECT o_custkey, o_orderkey, epoch_ms(o_orderdate) AS order_ms,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY epoch_ms(o_orderdate)
        |    RANGE BETWEEN 2592000000 PRECEDING AND CURRENT ROW), 2)
        |    AS trailing_30d_revenue
        |FROM orders""".stripMargin,
    "q14_running_revenue" ->
      """SELECT o_custkey, o_orderkey, epoch_ms(o_orderdate) AS order_ms,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey ROWS UNBOUNDED PRECEDING), 2)
        |    AS running_revenue
        |FROM orders""".stripMargin,
    "q11_skew_salted_join" ->
      """SELECT c_mktsegment, round(sum(o_totalprice), 2) AS revenue,
        |  count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q20_ntile_quartiles" ->
      """SELECT o_orderpriority, quartile, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS revenue
        |FROM (SELECT o_orderpriority, o_totalprice,
        |        ntile(4) OVER (PARTITION BY o_orderpriority
        |          ORDER BY o_totalprice, o_orderkey) AS quartile
        |      FROM orders)
        |GROUP BY o_orderpriority, quartile""".stripMargin,

    "x53_histogram_profile" ->
      """SELECT o_orderpriority, bin, bin * 30000.0 AS bin_lo, count(*) AS n
        |FROM (SELECT o_orderpriority,
        |        least(greatest(floor(o_totalprice / 30000.0)::BIGINT, 0), 19) AS bin
        |      FROM orders)
        |GROUP BY o_orderpriority, bin""".stripMargin,

    "x52_zorder_layout" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, zvalue FROM (
        |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |    list_sum(list_transform(range(0, 31),
        |      i -> ((l_partkey // (1::BIGINT << i)) % 2) * (1::BIGINT << (2*i))
        |         + ((l_suppkey // (1::BIGINT << i)) % 2) * (1::BIGINT << (2*i + 1))
        |    ))::BIGINT AS zvalue
        |  FROM lineitem)
        |ORDER BY zvalue, l_orderkey, l_linenumber LIMIT 100""".stripMargin,

    "x48_bloom_semi_join" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
        |                     WHERE o_orderpriority = '1-URGENT')""".stripMargin,
    "q10_setops" ->
      """SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING'
        |UNION ALL
        |SELECT c_custkey, c_name FROM customer
        |  WHERE c_mktsegment = 'AUTOMOBILE' AND c_acctbal > 5000
        |EXCEPT
        |SELECT c_custkey, c_name FROM customer WHERE c_acctbal < 0""".stripMargin,
    // Exact columns recomputed exactly; the TRUE literals assert the
    // Spark-side approximations landed within their 5% bounds.
    "q12_approx_stats" ->
      """SELECT l_returnflag, count(*) AS n,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  TRUE AS parts_within_5pct,
        |  TRUE AS p50_within_5pct,
        |  TRUE AS p95_within_5pct
        |FROM lineitem GROUP BY l_returnflag""".stripMargin)
}
