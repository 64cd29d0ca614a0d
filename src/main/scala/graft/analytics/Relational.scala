package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational analytic operator layer (SURVEY.md §2.10) over the
  * TESTDATA star schema: filter/project aggregations, multi-way joins,
  * semi/anti joins, rollup, windows, top-k, set ops, JSON extraction.
  *
  * Scale notes (the 100 TB story, tested at local[32]):
  *  - FIXED-size dimension tables (region 5, nation 25 — constant at
  *    any scale factor) are explicitly `broadcast()` so the fact scans
  *    never shuffle for the dim side. Dimensions that GROW with the
  *    scale factor (customer, part, supplier) carry no hint: AQE
  *    promotes those joins to broadcast at runtime while they fit and
  *    falls back to a shuffle join when they no longer do — a forced
  *    broadcast of a linearly-growing table is a driver OOM at 100 TB.
  *  - Fact-fact joins (lineitem ⋈ orders) shuffle on the join key only
  *    after the pushed-down filters have cut the input; at cluster
  *    scale the same plan holds with AQE picking partition counts.
  *  - All aggregations are partial (map-side combine) by construction:
  *    `groupBy().agg()` of algebraic aggregates.
  *  - Every query ends in a deterministic global sort purely so the
  *    driver's oracle hash compare sees a stable row order; the sort
  *    runs on the (small) aggregated result, not the fact table.
  *
  * Determinism for the DuckDB oracle: doubles are rounded, group keys
  * are cast to strings/bigints, timestamps are formatted as strings,
  * and each query carries a total ORDER BY with unique tiebreak.
  */
object Relational {

  /** TPC-H Q1 shape: scan-heavy single-table aggregation.
    * Pushed filter + 8 partial aggregates in one pass. */
  def q01PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Det.sumDecR(col("l_quantity"), 2).as("sum_qty"),
        Det.sumDecR(col("l_extendedprice"), 2).as("sum_base_price"),
        Det.sumDecR(col("l_extendedprice") * (lit(1) - col("l_discount")), 2).as("sum_disc_price"),
        Det.sumDecR(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 2).as("sum_charge"),
        Det.avgDecR(col("l_quantity"), 2).as("avg_qty"),
        Det.avgDecR(col("l_extendedprice"), 2).as("avg_price"),
        Det.avgDecR(col("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** TPC-H Q5 shape: 5-way star join; fixed-size dims broadcast,
    * customer joined AQE-adaptively (see scale notes) so the plan
    * survives any scale factor. */
  def q02RevenueByNation(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o  = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1999-01-01").cast("timestamp"))
    val c  = Tables.customer(spark, dir)
    val n  = Tables.nation(spark, dir)
    val r  = Tables.region(spark, dir)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(Det.sumDecR(col("l_extendedprice") * (lit(1) - col("l_discount")), 2).as("revenue"),
           count(lit(1)).as("n_items"))
      .orderBy("r_name", "n_name")
  }

  /** TPC-H Q3 shape: join + aggregate + top-k. The top-k is a sort of
    * the aggregated (per-order) rows with a limit — Spark plans this as
    * TakeOrderedAndProject, no full global sort of the fact table. */
  def q03TopOrders(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o  = Tables.orders(spark, dir)
    val c  = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(Det.sumDecR(col("l_extendedprice") * (lit(1) - col("l_discount")), 2).as("revenue"))
      .select(col("o_orderkey"),
              date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
              col("o_orderpriority"), col("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey").asc)
      .limit(10)
  }

  /** Top-3 customers by account balance per nation — ranked via the
    * bounded top-k aggregate, not a `row_number` window: a window
    * partitioned by the 25 nation keys would shuffle EVERY customer
    * row into 25 reducers; [[graft.functions.BoundedTopK.top_k_with]]
    * reduces each scan partition to ≤ 3 entries per nation before the
    * exchange (same (acctbal desc, custkey asc) total order, so
    * output is bit-identical — TopKAggSpec pins the q12 analogue). */
  def q04CustomerRank(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.BoundedTopK.top_k_with
    val c = Tables.customer(spark, dir)
    c.groupBy(col("c_nationkey"))
      .agg(top_k_with(col("c_acctbal").cast("double"), col("c_custkey"),
        col("c_acctbal"), 3).as("top"))
      .select(col("c_nationkey").cast("bigint").as("nationkey"),
              posexplode(col("top")).as(Seq("p", "t")))
      .select(col("nationkey"), (col("p") + 1).cast("bigint").as("rnk"),
              col("t.id").as("c_custkey"),
              round(col("t.payload"), 2).as("acctbal"))
      .orderBy("nationkey", "rnk")
  }

  /** Grouping sets via rollup; null grouping keys coalesced to 'ALL'
    * so the oracle compare is collation-stable. */
  def q05RollupSales(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(Det.sumDecR(col("l_quantity"), 2).as("sum_qty"),
           Det.sumDecR(col("l_extendedprice") * (lit(1) - col("l_discount")), 2).as("revenue"),
           count(lit(1)).as("n_rows"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
              coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
              col("sum_qty"), col("revenue"), col("n_rows"))
      .orderBy("returnflag", "linestatus")
  }

  /** TPC-H Q6 shape: fully-pushed-down selective filter + scalar agg.
    * All three predicates reach the parquet scan (PushedFilters). */
  def q06RevenueDelta(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1997-01-01").cast("timestamp") &&
              col("l_discount").between(0.05, 0.07) &&
              col("l_quantity") < 24)
      .agg(Det.sumDecR(col("l_extendedprice") * col("l_discount"), 2).as("revenue"),
           count(lit(1)).as("n_rows"))
  }

  /** Left-semi join (EXISTS): customers that have at least one order. */
  def q07SegmentSemi(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"),
           Det.sumDecR(col("c_acctbal"), 2).as("total_bal"))
      .orderBy("c_mktsegment")
  }

  /** Left-anti join (NOT EXISTS): customers with no orders, by nation. */
  def q08InactiveCustomers(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val n = Tables.nation(spark, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_inactive"))
      .orderBy("n_name")
  }

  /** Exact distinct aggregation (expand + two-phase shuffle in Spark). */
  def q09DistinctCounts(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_suppkey")).as("n_suppliers"),
           countDistinct(col("l_partkey")).as("n_parts"),
           count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")
  }

  /** Set operators: nations that have both customers and suppliers
    * (INTERSECT) vs customer-only nations (EXCEPT), tagged + unioned. */
  def q10NationSetOps(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables.nation(spark, dir)
    val custNations = Tables.customer(spark, dir)
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select("n_name")
    val suppNations = Tables.supplier(spark, dir)
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select("n_name")
    val both = custNations.intersect(suppNations).select(lit("both").as("tag"), col("n_name"))
    val custOnly = custNations.except(suppNations).select(lit("cust_only").as("tag"), col("n_name"))
    both.union(custOnly).orderBy("tag", "n_name")
  }

  /** Time-bucketed event aggregation (daily). */
  def q11EventsDaily(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    e.groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
              col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           Det.sumDecR(col("value"), 2).as("sum_value"),
           Det.avgDecR(col("value"), 4).as("avg_value"))
      .orderBy("day", "event_type")
  }

  /** Aggregate-then-rank top-k: top 5 users per event type by spend.
    *
    * NOT a window: `row_number() OVER (PARTITION BY event_type)` would
    * shuffle every (type, user) aggregate into |event_types| = 5
    * partitions — at scale that is billions of user rows crammed into
    * 5 reducers. [[graft.functions.BoundedTopK.top_k_with]] ranks with
    * map-side bounded state instead, carrying the exact decimal total
    * and the count as payload so output is bit-identical to the
    * window form (the double ranking key is exact for 2-decimal sums
    * up to 2^53/100, far beyond any realistic per-user total; ties
    * break on user_id exactly as the window did). */
  def q12TopUsersPerType(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.BoundedTopK.top_k_with
    val e = Tables.events(spark, dir)
    val perUser = e.groupBy(col("event_type"), col("user_id"))
      .agg(Det.sumDec(col("value")).as("total_value"), count(lit(1)).as("n"))
    perUser.groupBy("event_type")
      .agg(top_k_with(col("total_value").cast("double"), col("user_id"),
        struct(col("total_value"), col("n")), 5).as("top"))
      .select(col("event_type"), posexplode(col("top")).as(Seq("p", "t")))
      .select(col("event_type"), (col("p") + 1).cast("bigint").as("rnk"),
              col("t.id").as("user_id"),
              Det.dround(col("t.payload.total_value"), 2).as("total_value"),
              col("t.payload.n").as("n"))
      .orderBy("event_type", "rnk")
  }

  /** TPC-H Q4 shape: semi join with a non-equi conjunct (line shipped
    * after the order date), counted per priority. */
  def q13PriorityCounts(spark: SparkSession, dir: String): DataFrame = {
    val o  = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    o.join(li, o("o_orderkey") === li("l_orderkey") && li("l_shipdate") > o("o_orderdate"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q14 shape: conditional aggregation ratio over a dimension
    * join (promo revenue share per month); part grows with SF, so the
    * join is AQE-adaptive, not hint-broadcast. */
  def q14PromoShare(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val p  = Tables.part(spark, dir)
    val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
    li.join(p, col("l_partkey") === col("p_partkey"))
      .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("month"))
      .agg(Det.dround(Det.sumDec(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0)))
             / Det.sumDec(rev) * 100, 4).as("promo_share"),
           count(lit(1)).as("n_rows"))
      .orderBy("month")
  }

  /** JSON extraction from the event props payload (codegen'd
    * get_json_object; no UDF). */
  def q15EventsJson(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    e.select(
        (get_json_object(col("props"), "$.k").cast("bigint") % 10).as("k_bucket"),
        col("value"))
      .groupBy("k_bucket")
      .agg(count(lit(1)).as("n"), Det.sumDecR(col("value"), 2).as("sum_value"))
      .orderBy("k_bucket")
  }

  /** Statistical aggregates: correlation + sample stddev per flag. */
  def q16Stats(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.groupBy("l_returnflag")
      .agg(Det.dround(corr(col("l_quantity"), col("l_extendedprice")), 3).as("qty_price_corr"),
           Det.dround(stddev_samp(col("l_extendedprice")), 2).as("price_stddev"),
           Det.dround(min("l_extendedprice"), 2).as("min_price"),
           Det.dround(max("l_extendedprice"), 2).as("max_price"))
      .orderBy("l_returnflag")
  }

  /** Full grouping-sets cube over two dimensions. */
  def q17Cube(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), Det.sumDecR(col("o_totalprice"), 2).as("total"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
              coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
              col("n_orders"), col("total"))
      .orderBy("status", "priority")
  }

  /** Asymmetric GROUPING SETS — the form neither rollup (q05) nor cube
    * (q17) covers: the two single-dimension marginals plus the full
    * cross, WITHOUT the grand total. Same partial-agg expansion as
    * cube, so one pass over orders. The fixture has no NULL
    * status/priority, so the coalesce('ALL') sentinel is unambiguous
    * (q17's convention). */
  def q29GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.groupingSets(
        Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
            Seq(col("o_orderstatus")),
            Seq(col("o_orderpriority"))),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), Det.sumDecR(col("o_totalprice"), 2).as("total"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
              coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
              col("n_orders"), col("total"))
      .orderBy("status", "priority")
  }

  /** Wide→long UNPIVOT (q26's inverse): per-segment metric columns
    * melted into (segment, metric, value) rows — the Dataset `unpivot`
    * operator, planned as one Expand over the |segments|-row aggregate
    * (no shuffle beyond the aggregation). */
  def q30Unpivot(spark: SparkSession, dir: String): DataFrame = {
    val wide = Tables.customer(spark, dir)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).cast("double").as("n_customers"),
           Det.dround(sum(col("c_acctbal").cast("decimal(18,6)")).cast("double")
             / count(lit(1)), 2).as("avg_acctbal"))
    wide.unpivot(Array(col("c_mktsegment")),
        Array(col("n_customers"), col("avg_acctbal")), "metric", "value")
      .orderBy("c_mktsegment", "metric")
  }

  /** Sessionization via the BUILT-IN `session_window` aggregation —
    * the Spark-native twin of the hand-rolled gaps-and-islands batch
    * sessionizer (st02) and the flatMapGroupsWithState streaming path:
    * one groupBy, merged-on-overlap session windows, no window
    * functions. Window end is last-event-ts + gap by definition, which
    * the oracle reproduces as max(ts)+gap. Events exactly `gap` apart
    * merge (closed-interval semantics) in both engines. */
  def q31SessionWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), Det.sumDecR(col("value"), 2).as("total_value"))
      .select(col("user_id"),
        expr("unix_millis(session_window.start)").as("start_ms"),
        expr("unix_millis(session_window.end)").as("end_ms"),
        col("n_events"), col("total_value"))
      .orderBy("user_id", "start_ms")

  /** Recursive CTE (WITH RECURSIVE — new SQL surface in Spark 4):
    * walk every customer's ancestor chain under the id/10 hierarchy
    * (strictly shrinking, so UNION ALL recursion terminates in ≤7
    * rounds) and count chain rows per depth. Each round is one
    * self-join the engine plans like any other; DuckDB replays the
    * same recursion for the oracle. */
  def q32RecursiveCte(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("q32_customer")
    spark.sql(
      """WITH RECURSIVE chain(custkey, anc, depth) AS (
           SELECT c_custkey, c_custkey, 0 FROM q32_customer
           UNION ALL
           SELECT custkey, anc div 10, depth + 1 FROM chain WHERE anc > 0
         )
         SELECT depth, count(*) AS n_nodes, sum(anc) AS sum_anc
         FROM chain GROUP BY depth ORDER BY depth""")
  }

  /** TPC-H Q21-shaped double-correlated subqueries (EXISTS + NOT
    * EXISTS against the same growing table) — the decorrelation
    * torture test: suppliers who were the SOLE supplier with a
    * returned lineitem inside a multi-supplier finished order.
    * Catalyst rewrites both correlations into aggregate/semi/anti
    * joins on l_orderkey (PlanSpec pins: no nested-loop join
    * survives) — the only plan shape that works when lineitem is the
    * 100 TB fact table. Adapted to this schema's columns (no
    * commitdate/receiptdate): "late" := l_returnflag = 'R', order
    * cohort := o_orderstatus = 'F'. Oracle-checked (same SQL replays
    * in DuckDB). */
  def q33SoleFailedSupplier(spark: SparkSession, dir: String): DataFrame = {
    Tables.supplier(spark, dir).createOrReplaceTempView("q33_supplier")
    Tables.lineitem(spark, dir).createOrReplaceTempView("q33_lineitem")
    Tables.orders(spark, dir).createOrReplaceTempView("q33_orders")
    spark.sql(
      """SELECT s_name, count(*) AS numwait
        |FROM q33_supplier, q33_lineitem l1, q33_orders
        |WHERE s_suppkey = l1.l_suppkey
        |  AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F'
        |  AND l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM q33_lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM q33_lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 20""".stripMargin)
  }

  /** Window frames: running sum (rows unbounded-preceding), 7-row
    * moving average, lag delta — per supplier over ship dates. */
  def q18WindowFrames(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).filter(col("l_suppkey") <= 3)
    val w = Window.partitionBy("l_suppkey").orderBy(col("l_shipdate").asc, col("l_orderkey").asc,
      col("l_linenumber").asc)
    li.withColumn("running_qty", round(sum("l_quantity")
        .over(w.rowsBetween(Window.unboundedPreceding, 0)), 2))
      .withColumn("moving_avg", Det.dround(avg("l_quantity")
        .over(w.rowsBetween(-6, 0)), 4))
      .withColumn("qty_delta", round(col("l_quantity") -
        coalesce(lag(col("l_quantity"), 1).over(w), lit(0.0)), 2))
      .select(col("l_suppkey"), col("l_orderkey"),
        col("l_linenumber").cast("bigint").as("l_linenumber"),
        col("running_qty"), col("moving_avg"), col("qty_delta"))
      .orderBy("l_suppkey", "running_qty", "l_orderkey", "l_linenumber")
  }

  /** Exact interpolated percentiles per market segment. */
  def q19Percentiles(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    c.groupBy("c_mktsegment")
      .agg(Det.dround(expr("percentile(c_acctbal, 0.5)"), 2).as("median"),
           Det.dround(expr("percentile(c_acctbal, 0.25)"), 2).as("p25"),
           Det.dround(expr("percentile(c_acctbal, 0.95)"), 2).as("p95"),
           count(lit(1)).as("n"))
      .orderBy("c_mktsegment")
  }

  /** The SQL surface: the same engine through `spark.sql`, including a
    * correlated scalar subquery (Catalyst decorrelates it into a join). */
  def q20SqlInterface(spark: SparkSession, dir: String): DataFrame = {
    Tables.part(spark, dir).createOrReplaceTempView("part_v")
    spark.sql(
      """SELECT p_type, p_partkey, round(p_retailprice, 2) AS price
        |FROM part_v p
        |WHERE p_retailprice > 1.03 * (SELECT avg(p2.p_retailprice)
        |                             FROM part_v p2 WHERE p2.p_type = p.p_type)
        |ORDER BY p_type, p_partkey""".stripMargin)
  }

  /** Approximate distinct counting (HyperLogLog++) next to the exact
    * counts — the sketch path for cardinalities at 100 TB where exact
    * distinct's expand+shuffle is unaffordable. Rows-only check (HLL
    * implementations differ across engines); ApproxSpec bounds the
    * relative error against the exact values. */
  def q21ApproxDistinct(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
           countDistinct(col("l_partkey")).as("exact_parts"),
           approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"),
           countDistinct(col("l_orderkey")).as("exact_orders"))
      .orderBy("l_returnflag")
  }

  /** As-of join — each purchase event matched to the latest view event
    * at or before it by the same user. Spark lacks a batch as-of join;
    * per the preference ladder it composes from built-ins (union +
    * carry-forward window) rather than a custom Strategy: one shuffle
    * on user_id, one sorted pass — the same cost shape as a native
    * as-of merge. Oracle: DuckDB's native ASOF JOIN. */
  def q22AsOfJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    // dedup per (user, ts) so tie-breaks are engine-independent
    def byType(t: String, idName: String) =
      e.filter(col("event_type") === t)
        .groupBy("user_id", "ts").agg(min("event_id").as(idName))
    val views = byType("view", "view_id")
    val purchases = byType("purchase", "purchase_id")
    val tagged = views.select(col("user_id"), col("ts"), lit(0).as("kind"),
        col("view_id"), lit(null).cast("long").as("purchase_id"))
      .unionByName(purchases.select(col("user_id"), col("ts"), lit(1).as("kind"),
        lit(null).cast("long").as("view_id"), col("purchase_id")))
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("kind").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    tagged
      .withColumn("last_view", last(col("view_id"), ignoreNulls = true).over(w))
      .withColumn("last_view_ts", last(when(col("view_id").isNotNull, col("ts")), ignoreNulls = true).over(w))
      .filter(col("kind") === 1 && col("last_view").isNotNull)
      .select(col("purchase_id"), col("user_id"), col("last_view").as("view_id"),
        (unix_micros(col("ts")) - unix_micros(col("last_view_ts"))).as("gap_us"))
      .orderBy("purchase_id")
  }

  /** Text ⋈ embedding join: document language crossed with embedding
    * cluster label (doc_id = vec_id where both exist) — the multimodal
    * join shape (text table ⋈ vector table on the shared id). */
  def q23DocsEmbeddings(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("lang"))
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("doc_id"), col("label"))
    docs.join(emb, "doc_id")
      .groupBy("lang", "label")
      .agg(count(lit(1)).as("n"))
      .select(col("lang"), col("label").cast("bigint").as("label"), col("n"))
      .orderBy("lang", "label")
  }

  /** Quantile sketch (q19's exact percentiles are the oracle-checked
    * baseline; this is the 100 TB tier): `percentile_approx` is a
    * mergeable sketch — partials combine associatively across
    * partitions, one shuffle of sketch state instead of a global sort.
    * Exact values ride along so the ApproxSpec error bound is
    * self-checking; rows-only gate (sketch internals are
    * implementation-defined). */
  def q25ApproxPercentiles(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.groupBy("l_returnflag")
      .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("approx_p50"),
           expr("percentile(l_extendedprice, 0.5)").as("exact_p50"),
           percentile_approx(col("l_extendedprice"), lit(0.95), lit(1000)).as("approx_p95"),
           expr("percentile(l_extendedprice, 0.95)").as("exact_p95"))
      .orderBy("l_returnflag")
  }

  /** Salted two-phase hot-key aggregation over events: event_type has
    * a handful of values across the whole table — the shape that pins
    * one reducer at 100 TB. [[SkewUtils.saltedAggregate]] shuffles on
    * (event_type, salt) first so a hot key spreads over 8 reducers,
    * then recombines the tiny per-salt partials. Decimal partial sums
    * keep the two-phase total exact, so the result is bit-equal to the
    * plain one-shuffle aggregate — which is exactly what the DuckDB
    * oracle computes. */
  def q24SaltedAgg(spark: SparkSession, dir: String): DataFrame =
    SkewUtils.saltedAggregate(
      Tables.events(spark, dir).select(col("event_type"), col("value")),
      Seq("event_type"), buckets = 8,
      partialAggs = Seq(count(lit(1)).as("pc"),
        sum(col("value").cast("decimal(18,6)")).as("ps")),
      finalAggs = Seq(sum("pc").as("n_events"),
        Det.dround(sum("ps").cast("double"), 2).as("sum_value")))
      .orderBy("event_type")

  /** Pivot (long → wide): daily revenue matrix with one column per
    * event type. The pivot values are DECLARED, not discovered — the
    * two-job "collect distinct keys first" variant is a full extra
    * corpus pass, and an unbounded key set would OOM the driver
    * building the plan; with declared values this is ONE hash
    * aggregation with map-side partials, identical in cost to a plain
    * groupBy. Missing cells coalesce to 0 so the wide row is total. */
  def q26Pivot(spark: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    Tables.events(spark, dir)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"),
              col("event_type"), col("value"))
      .groupBy("day")
      .pivot("event_type", types)
      .agg(Det.dround(coalesce(Det.sumDec(col("value")), lit(0.0)), 2))
      .orderBy("day")
  }

  /** Time-series gap-fill (the resample step every monitoring/feature
    * pipeline needs): per event type, a dense daily spine from the
    * type's own [min, max] day — `sequence` + explode, built from the
    * aggregated per-type bounds, so the spine generator runs on
    * #types rows, never per event — left-joined to observed daily
    * aggregates; missing days emit explicit zeros. */
  def q27GapFill(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"), Det.sumDecR(col("value"), 2).as("sum_value"))
    val spine = daily.groupBy("event_type")
      .agg(min("day").as("d0"), max("day").as("d1"))
      .select(col("event_type"),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
    spine.join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
      .orderBy("event_type", "day")
  }

  /** All relational queries, keyed for SparkEntry. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary"   -> q01PricingSummary _,
    "q02_revenue_by_nation" -> q02RevenueByNation _,
    "q03_top_orders"        -> q03TopOrders _,
    "q04_customer_rank"     -> q04CustomerRank _,
    "q05_rollup_sales"      -> q05RollupSales _,
    "q06_revenue_delta"     -> q06RevenueDelta _,
    "q07_segment_semi"      -> q07SegmentSemi _,
    "q08_inactive_customers"-> q08InactiveCustomers _,
    "q09_distinct_counts"   -> q09DistinctCounts _,
    "q10_nation_setops"     -> q10NationSetOps _,
    "q11_events_daily"      -> q11EventsDaily _,
    "q12_top_users_per_type"-> q12TopUsersPerType _,
    "q13_priority_counts"   -> q13PriorityCounts _,
    "q14_promo_share"       -> q14PromoShare _,
    "q15_events_json"       -> q15EventsJson _,
    "q16_stats"             -> q16Stats _,
    "q17_cube"              -> q17Cube _,
    "q18_window_frames"     -> q18WindowFrames _,
    "q19_percentiles"       -> q19Percentiles _,
    "q20_sql_interface"     -> q20SqlInterface _,
    "q21_approx_distinct"   -> q21ApproxDistinct _,
    "q22_asof_join"         -> q22AsOfJoin _,
    "q23_docs_embeddings"   -> q23DocsEmbeddings _,
    "q24_salted_agg"        -> q24SaltedAgg _,
    "q25_approx_percentiles"-> q25ApproxPercentiles _,
    "q26_pivot"             -> q26Pivot _,
    "q27_gapfill"           -> q27GapFill _,
    "q29_grouping_sets"     -> q29GroupingSets _,
    "q30_unpivot"           -> q30Unpivot _,
    "q31_session_window"    -> q31SessionWindow _,
    "q32_recursive_cte"     -> q32RecursiveCte _,
    "q33_sole_failed_supplier" -> q33SoleFailedSupplier _,
  )

  /** DuckDB oracle SQL, column-name- and order-aligned with the Spark
    * plans above (driver sorts columns by name before hashing). */
  val oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         floor((CAST(sum(CAST((l_quantity) AS DECIMAL(18,6))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS sum_qty,
         floor((CAST(sum(CAST((l_extendedprice) AS DECIMAL(18,6))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS sum_base_price,
         floor((CAST(sum(CAST((l_extendedprice*(1-l_discount)) AS DECIMAL(18,6))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS sum_disc_price,
         floor((CAST(sum(CAST((l_extendedprice*(1-l_discount)*(1+l_tax)) AS DECIMAL(18,6))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS sum_charge,
         floor((CAST(sum(CAST((l_quantity) AS DECIMAL(18,6))) AS DOUBLE) / count(*)) * 100.0 + 0.5) / 100.0 AS avg_qty,
         floor((CAST(sum(CAST((l_extendedprice) AS DECIMAL(18,6))) AS DOUBLE) / count(*)) * 100.0 + 0.5) / 100.0 AS avg_price,
         floor((CAST(sum(CAST((l_discount) AS DECIMAL(18,6))) AS DOUBLE) / count(*)) * 10000.0 + 0.5) / 10000.0 AS avg_disc,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q02_revenue_by_nation" ->
      """SELECT r_name, n_name,
         floor((CAST(sum(CAST((l_extendedprice*(1-l_discount)) AS DECIMAL(18,6))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS revenue,
         count(*) AS n_items
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name ORDER BY r_name, n_name""",
    "q03_top_orders" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
         o_orderpriority,
         floor((CAST(sum(CAST((l_extendedprice*(1-l_discount)) AS DECIMAL(18,6))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey AND c_mktsegment = 'BUILDING'
         GROUP BY o_orderkey, o_orderdate, o_orderpriority
         ORDER BY revenue DESC, o_orderkey ASC LIMIT 10""",
    "q04_customer_rank" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
         CAST(rnk AS BIGINT) AS rnk, c_custkey,
         round(c_acctbal,2) AS acctbal
         FROM (SELECT c_nationkey, c_custkey, c_acctbal,
                row_number() OVER (PARTITION BY c_nationkey
                  ORDER BY c_acctbal DESC, c_custkey ASC) AS rnk
               FROM customer)
         WHERE rnk <= 3 ORDER BY nationkey, rnk""",
    "q05_rollup_sales" ->
      """SELECT coalesce(l_returnflag,'ALL') AS returnflag,
         coalesce(l_linestatus,'ALL') AS linestatus,
         floor((CAST(sum(CAST((l_quantity) AS DECIMAL(18,6))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS sum_qty,
         floor((CAST(sum(CAST((l_extendedprice*(1-l_discount)) AS DECIMAL(18,6))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS revenue,
         count(*) AS n_rows
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         ORDER BY returnflag, linestatus""",
    "q06_revenue_delta" ->
      """SELECT floor((CAST(sum(CAST((l_extendedprice*l_discount) AS DECIMAL(18,6))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS revenue,
         count(*) AS n_rows
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
           AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",
    "q07_segment_semi" ->
      """SELECT c_mktsegment, count(*) AS n_customers,
         floor((CAST(sum(CAST((c_acctbal) AS DECIMAL(18,6))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS total_bal
         FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q08_inactive_customers" ->
      """SELECT n_name, count(*) AS n_inactive
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         GROUP BY n_name ORDER BY n_name""",
    "q09_distinct_counts" ->
      """SELECT l_returnflag,
         count(DISTINCT l_suppkey) AS n_suppliers,
         count(DISTINCT l_partkey) AS n_parts,
         count(*) AS n_rows
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q10_nation_setops" ->
      """WITH custn AS (SELECT n_name FROM customer JOIN nation ON c_nationkey=n_nationkey),
            suppn AS (SELECT n_name FROM supplier JOIN nation ON s_nationkey=n_nationkey)
         SELECT 'both' AS tag, n_name FROM (SELECT n_name FROM custn INTERSECT SELECT n_name FROM suppn)
         UNION ALL
         SELECT 'cust_only' AS tag, n_name FROM (SELECT n_name FROM custn EXCEPT SELECT n_name FROM suppn)
         ORDER BY tag, n_name""",
    "q11_events_daily" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
         count(*) AS n_events, floor((CAST(sum(CAST((value) AS DECIMAL(18,6))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS sum_value,
         floor((CAST(sum(CAST((value) AS DECIMAL(18,6))) AS DOUBLE) / count(*)) * 10000.0 + 0.5) / 10000.0 AS avg_value
         FROM events GROUP BY 1, 2 ORDER BY day, event_type""",
    "q12_top_users_per_type" ->
      """SELECT event_type, CAST(rnk AS BIGINT) AS rnk, user_id,
         floor((total_value) * 100.0 + 0.5) / 100.0 AS total_value, n
         FROM (SELECT event_type, user_id,
                CAST(sum(CAST((value) AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
                count(*) AS n,
                row_number() OVER (PARTITION BY event_type
                  ORDER BY CAST(sum(CAST((value) AS DECIMAL(18,6))) AS DOUBLE) DESC, user_id ASC) AS rnk
               FROM events GROUP BY event_type, user_id)
         WHERE rnk <= 5 ORDER BY event_type, rnk""",
    "q13_priority_counts" ->
      """SELECT o_orderpriority, count(*) AS n_orders
         FROM orders
         WHERE EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q14_promo_share" ->
      """SELECT strftime(l_shipdate, '%Y-%m') AS month,
         floor((CAST(sum(CAST((CASE WHEN p_type = 'PROMO' THEN l_extendedprice*(1-l_discount) ELSE 0.0 END) AS DECIMAL(18,6))) AS DOUBLE) / CAST(sum(CAST((l_extendedprice*(1-l_discount)) AS DECIMAL(18,6))) AS DOUBLE) * 100) * 10000.0 + 0.5) / 10000.0 AS promo_share,
         count(*) AS n_rows
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY 1 ORDER BY month""",
    "q15_events_json" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
         count(*) AS n, floor((CAST(sum(CAST((value) AS DECIMAL(18,6))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS sum_value
         FROM events GROUP BY 1 ORDER BY k_bucket""",
    "q16_stats" ->
      """SELECT l_returnflag,
         floor((corr(l_quantity, l_extendedprice)) * 1000.0 + 0.5) / 1000.0 AS qty_price_corr,
         floor((stddev_samp(l_extendedprice)) * 100.0 + 0.5) / 100.0 AS price_stddev,
         floor((min(l_extendedprice)) * 100.0 + 0.5) / 100.0 AS min_price,
         floor((max(l_extendedprice)) * 100.0 + 0.5) / 100.0 AS max_price
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q17_cube" ->
      """SELECT coalesce(o_orderstatus,'ALL') AS status,
         coalesce(o_orderpriority,'ALL') AS priority,
         count(*) AS n_orders, floor((CAST(sum(CAST((o_totalprice) AS DECIMAL(18,6))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS total
         FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
         ORDER BY status, priority""",
    "q29_grouping_sets" ->
      """SELECT coalesce(o_orderstatus,'ALL') AS status,
         coalesce(o_orderpriority,'ALL') AS priority,
         count(*) AS n_orders, floor((CAST(sum(CAST((o_totalprice) AS DECIMAL(18,6))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS total
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), (o_orderpriority))
         ORDER BY status, priority""",
    "q30_unpivot" ->
      """WITH w AS (SELECT c_mktsegment, CAST(count(*) AS DOUBLE) n_customers,
           floor((CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / count(*)) * 100.0 + 0.5) / 100.0 avg_acctbal
          FROM customer GROUP BY c_mktsegment)
         SELECT c_mktsegment, 'avg_acctbal' AS metric, avg_acctbal AS value FROM w
         UNION ALL
         SELECT c_mktsegment, 'n_customers' AS metric, n_customers AS value FROM w
         ORDER BY c_mktsegment, metric""",
    "q31_session_window" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, value FROM events),
          l AS (SELECT *, lag(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) prev_ts FROM e),
          s AS (SELECT *, sum(CASE WHEN prev_ts IS NULL OR ts_ms - prev_ts > 1800000
                                   THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                        ROWS UNBOUNDED PRECEDING) AS session_id
                FROM l)
         SELECT user_id, min(ts_ms) AS start_ms, max(ts_ms) + 1800000 AS end_ms,
          count(*) AS n_events, floor((CAST(sum(CAST((value) AS DECIMAL(18,6))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS total_value
         FROM s GROUP BY user_id, session_id ORDER BY user_id, start_ms""",
    "q32_recursive_cte" ->
      """WITH RECURSIVE chain(custkey, anc, depth) AS (
           SELECT c_custkey, c_custkey, 0 FROM customer
           UNION ALL
           SELECT custkey, anc // 10, depth + 1 FROM chain WHERE anc > 0
         )
         SELECT CAST(depth AS INT) AS depth, count(*) AS n_nodes,
          CAST(sum(anc) AS BIGINT) AS sum_anc
         FROM chain GROUP BY depth ORDER BY depth""",
    "q33_sole_failed_supplier" ->
      """SELECT s_name, count(*) AS numwait
         FROM supplier, lineitem l1, orders
         WHERE s_suppkey = l1.l_suppkey
           AND o_orderkey = l1.l_orderkey
           AND o_orderstatus = 'F'
           AND l1.l_returnflag = 'R'
           AND EXISTS (SELECT 1 FROM lineitem l2
                       WHERE l2.l_orderkey = l1.l_orderkey
                         AND l2.l_suppkey <> l1.l_suppkey)
           AND NOT EXISTS (SELECT 1 FROM lineitem l3
                           WHERE l3.l_orderkey = l1.l_orderkey
                             AND l3.l_suppkey <> l1.l_suppkey
                             AND l3.l_returnflag = 'R')
         GROUP BY s_name
         ORDER BY numwait DESC, s_name
         LIMIT 20""",
    "q18_window_frames" ->
      """SELECT l_suppkey, l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
         round(sum(l_quantity) OVER (PARTITION BY l_suppkey
           ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC
           ROWS UNBOUNDED PRECEDING), 2) AS running_qty,
         floor((avg(l_quantity) OVER (PARTITION BY l_suppkey ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) * 10000.0 + 0.5) / 10000.0 AS moving_avg,
         round(l_quantity - coalesce(lag(l_quantity, 1) OVER (PARTITION BY l_suppkey
           ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC), 0.0), 2) AS qty_delta
         FROM lineitem WHERE l_suppkey <= 3
         ORDER BY l_suppkey, running_qty, l_orderkey, l_linenumber""",
    "q19_percentiles" ->
      """SELECT c_mktsegment,
         floor((quantile_cont(c_acctbal, 0.5)) * 100.0 + 0.5) / 100.0 AS median,
         floor((quantile_cont(c_acctbal, 0.25)) * 100.0 + 0.5) / 100.0 AS p25,
         floor((quantile_cont(c_acctbal, 0.95)) * 100.0 + 0.5) / 100.0 AS p95,
         count(*) AS n
         FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q20_sql_interface" ->
      """SELECT p_type, p_partkey, round(p_retailprice, 2) AS price
         FROM part p
         WHERE p_retailprice > 1.03 * (SELECT avg(p2.p_retailprice)
                                      FROM part p2 WHERE p2.p_type = p.p_type)
         ORDER BY p_type, p_partkey""",
    "q22_asof_join" ->
      """WITH base AS (SELECT user_id, ts, event_type, min(event_id) AS eid
                       FROM events GROUP BY 1, 2, 3),
          v AS (SELECT user_id, ts, eid AS view_id FROM base WHERE event_type = 'view'),
          p AS (SELECT user_id, ts, eid AS purchase_id FROM base WHERE event_type = 'purchase')
         SELECT p.purchase_id, p.user_id, v.view_id,
          epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
         FROM p ASOF JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
         ORDER BY purchase_id""",
    "q23_docs_embeddings" ->
      """SELECT d.lang, CAST(e.label AS BIGINT) AS label, count(*) AS n
         FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
         GROUP BY 1, 2 ORDER BY lang, label""",
    // the salted two-phase plan must equal the plain aggregate
    "q24_salted_agg" ->
      """SELECT event_type, count(*) AS n_events,
         floor((CAST(sum(CAST((value) AS DECIMAL(18,6))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS sum_value
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q26_pivot" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
          floor((coalesce(CAST(sum(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE), 0.0)) * 100.0 + 0.5) / 100.0 AS click,
          floor((coalesce(CAST(sum(CASE WHEN event_type = 'error' THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE), 0.0)) * 100.0 + 0.5) / 100.0 AS error,
          floor((coalesce(CAST(sum(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE), 0.0)) * 100.0 + 0.5) / 100.0 AS purchase,
          floor((coalesce(CAST(sum(CASE WHEN event_type = 'signup' THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE), 0.0)) * 100.0 + 0.5) / 100.0 AS signup,
          floor((coalesce(CAST(sum(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE), 0.0)) * 100.0 + 0.5) / 100.0 AS view
         FROM events GROUP BY 1 ORDER BY day""",
    "q27_gapfill" ->
      """WITH daily AS (SELECT event_type, date_trunc('day', ts) AS day,
                         count(*) AS n_events,
                         floor((CAST(sum(CAST((value) AS DECIMAL(18,6))) AS DOUBLE)) * 100.0 + 0.5) / 100.0 AS sum_value
                        FROM events GROUP BY 1, 2),
          bounds AS (SELECT event_type, min(day) d0, max(day) d1 FROM daily GROUP BY 1),
          spine AS (SELECT event_type, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
                    FROM bounds)
         SELECT s.event_type, strftime(s.day, '%Y-%m-%d') AS day,
          coalesce(d.n_events, 0) AS n_events,
          coalesce(d.sum_value, 0.0) AS sum_value
         FROM spine s LEFT JOIN daily d USING (event_type, day)
         ORDER BY event_type, day""",
  )
}
