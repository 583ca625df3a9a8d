package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Core relational query surface.
  *
  * The reference's entire batch-analytics surface is one grouped count with a
  * not-null/not-empty filter (reference: spark_jobs/count_by_district.py:22-36
  * plus the equivalent MapReduce pair batch_jobs/listing_count_by_district/).
  * That capability — scan → project → filter → hash-aggregate → sink — is
  * reproduced here (q02/q03) and widened to the full relational toolkit a
  * production analytics engine needs (multi-aggregate, joins, windows, cube,
  * distinct, sort/limit, time-bucketed and sessionized event analytics).
  *
  * Scale notes (100 TB posture):
  *  - Aggregations are plain `groupBy` → Catalyst plans partial+final
  *    HashAggregate (map-side combine), so shuffle volume is #groups, not #rows.
  *  - Dimension joins broadcast the small side explicitly (`broadcast(...)`);
  *    the mid-size sides are left to AQE, which auto-broadcasts under the
  *    threshold and falls back to shuffle join beyond it.
  *  - Windows partition by high-cardinality keys (custkey, user_id) so work
  *    spreads across executors; no global windows anywhere.
  *  - All floating-point outputs are rounded at the edge (only for
  *    oracle-compare stability; the plans aggregate at full precision).
  */
object Relational {

  /** q01: TPC-H Q1-style pricing summary: multi-aggregate grouped scan.
    * Filter reaches the parquet scan as a pushed predicate. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** q02: the reference's flagship query shape — grouped count with
    * not-null/not-empty filter (reference: spark_jobs/count_by_district.py:26-29,
    * batch_jobs/listing_count_by_district/{mapper,reducer}.py), applied to the
    * `documents` table's `lang` column. */
  def groupCount(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .select(col("lang"))
      .filter(col("lang").isNotNull && col("lang") =!= "")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"))

  /** q03: projection + predicate — both must push down to the parquet scan
    * (P1/P2 in SURVEY.md §2.2). */
  def filterProject(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .filter(col("n_chars") > 200 && col("lang") =!= "")

  /** q04: revenue by region/nation — star-schema join chain.
    * nation/region are tiny and broadcast explicitly; customer/orders are left
    * to AQE (broadcast at test SFs, shuffle-hash at warehouse scale). */
  def revenueByNation(spark: SparkSession, dir: String): DataFrame = {
    val li = lineitem(spark, dir)
    val o  = orders(spark, dir)
    val c  = customer(spark, dir)
    val n  = nation(spark, dir)
    val r  = region(spark, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** q05: top-3 orders per customer — partitioned window rank.
    * Partition key is the customer key (high cardinality at scale), order has a
    * unique tiebreaker (o_orderkey) so results are deterministic. */
  def topOrdersPerCustomer(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("totalprice"), col("rn"))
  }

  /** q06: CUBE over (mktsegment, nation) — grouping-sets aggregate. */
  def customerCube(spark: SparkSession, dir: String): DataFrame = {
    val c = customer(spark, dir)
    val n = nation(spark, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .cube(col("c_mktsegment"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        round(sum(col("c_acctbal")), 2).as("sum_acctbal"))
  }

  /** q07: exact distinct counts per group (expands to two-phase distinct
    * aggregate; the approximate HLL variant is `approxDistinct` below). */
  def distinctParts(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))

  /** q08: global top-N — TakeOrderedAndProject, not a full sort.
    * Unique tiebreaker keeps it deterministic. */
  def topOrders(spark: SparkSession, dir: String): DataFrame =
    orders(spark, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice"), 2).as("totalprice"), col("o_orderdate"))

  /** q09: tumbling one-hour event aggregation (batch form of the streaming
    * windowed agg in graft.streaming.EventStream). */
  def hourlyEvents(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"),
        round(avg(col("value")), 4).as("avg_value"))

  /** q10: customers with no orders — anti join (NOT EXISTS). */
  def customersWithoutOrders(spark: SparkSession, dir: String): DataFrame = {
    val c = customer(spark, dir)
    val o = orders(spark, dir).select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
  }

  /** q12: JSON field extraction from the events `props` payload
    * (the engine-side form of the reference's per-record json.loads —
    * reference: kafka_cc/consumer/kafka_to_hdfs_consumer.py:63). */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"),
        count(col("k")).as("n_with_k"),
        count(lit(1)).as("n"))

  /** q13: gap-based sessionization (30-min inactivity) as a batch window
    * computation: lag → new-session flag → running sum = session id.
    * Timestamps are floored to epoch seconds before the gap compare so the
    * result is precision-stable across parquet readers (the source column is
    * nanosecond-precision; engines truncate differently below seconds). */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_s").asc, col("event_id").asc)
    events(spark, dir)
      .withColumn("ts_s", unix_seconds(col("ts")))
      .withColumn("gap_s", col("ts_s") - lag(col("ts_s"), 1).over(byUser))
      .withColumn("new_sess", when(col("gap_s").isNull || col("gap_s") > 1800, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_sess")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_s")).as("sess_start"),
        max(col("ts_s")).as("sess_end"),
        round(sum(col("value")), 2).as("sum_value"))
  }

  /** q42: gap-based sessions via Spark's NATIVE session_window aggregate —
    * same 30-min-gap semantics as the hand-rolled q12 (lag + running sum),
    * so the two implementations cross-check each other against one oracle.
    * Timestamps floored to seconds at the edge for precision stability. */
  def sessionWindow(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .withColumn("tss", date_trunc("second", col("ts")))
      .groupBy(col("user_id"), session_window(col("tss"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"),
        unix_seconds(col("sw.start")).as("sess_start"),
        col("n_events"), col("sum_value"))

  /** q13: approximate distinct via HLL++ (rsd = 0.01) — the scale path for
    * q07 (mergeable constant-size sketch state vs q07's per-column row
    * expansion). Gated oracle-checkably since round 3: the exact twins are
    * the oracle columns and the booleans assert each sketch lands within 5
    * standard errors (±5%) of exact — the q50 pattern, extended to both key
    * columns. The sketch value itself can't be hash-compared (HLL internals
    * are engine-specific), but the bound claim can. */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame = {
    // Each key's exact distinct AND its HLL are computed over the
    // pre-deduplicated (flag, key) frame — HLL state is duplicate-
    // insensitive, so the estimate is bit-identical to one over raw rows.
    // NEVER put countDistinct and a sketch in the same agg: Spark's
    // distinct-rewrite (Expand + dedup aggregate) would then carry the
    // multi-KB HLL buffer in EVERY (group, key) dedup bucket of the first
    // aggregate — hundreds of MB of hash-map buffers and a measured ~10x
    // slowdown at sf0.1, growing with key cardinality.
    val li = lineitem(spark, dir)
    def leg(key: String, n: String, est: String) =
      li.select(col("l_returnflag"), col(key)).distinct()
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as(n), approx_count_distinct(col(key), 0.01).as(est))
    val rows = li.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n_rows"))
    leg("l_partkey", "n_parts", "ap")
      .join(leg("l_suppkey", "n_supps", "asup"), "l_returnflag")
      .join(rows, "l_returnflag")
      .select(col("l_returnflag"), col("n_parts"), col("n_supps"), col("n_rows"),
        (abs(col("ap") - col("n_parts")) <= col("n_parts") * 0.05).as("parts_ok"),
        (abs(col("asup") - col("n_supps")) <= col("n_supps") * 0.05).as("supps_ok"))
  }

  /** q33: as-of join — each purchase event attributed to the user's most
    * recent prior-or-equal click (point-in-time lookup). Spark has no asof
    * join; graft.plans.AsOfJoin supplies one with a single key-shuffle. */
  def purchaseAttribution(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir).withColumn("us", unix_micros(col("ts")))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("us"), col("event_id"),
        round(col("value"), 2).as("purchase_value"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("us"), col("event_id").as("click_id"),
        col("us").as("click_us"))
    graft.plans.AsOfJoin.asof(purchases, clicks, "user_id", "us",
        Seq("click_id", "click_us"), "click_id")
      .select(col("event_id"), col("user_id"), col("us").as("purchase_us"),
        col("purchase_value"), col("click_id"), col("click_us"))
  }

  /** q34: ROLLUP over (order year, status) — hierarchical subtotals. */
  def ordersRollup(spark: SparkSession, dir: String): DataFrame =
    orders(spark, dir)
      .rollup(year(col("o_orderdate")).cast("long").as("yr"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("sum_price"))

  /** q35: pivot — order counts by year × status as columns. Absent
    * combinations are null (pivot semantics), mirrored by SUM(CASE) in the
    * oracle. */
  def ordersPivot(spark: SparkSession, dir: String): DataFrame =
    orders(spark, dir)
      .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
      .pivot("o_orderstatus", Seq("O", "F", "P"))
      .agg(count(lit(1)))

  /** q36: set operations — EXCEPT / INTERSECT over customer key sets,
    * re-expressed as a single-aggregate classification: one scan of the
    * fact table, one hash(o_custkey) exchange, two boolean `max(when)`
    * flags, then the set label derived from the flags. The literal
    * `except`/`unionByName(intersect)` formulation (kept as the ORACLE's
    * statement of the semantics) plans as two distinct-aggregates + a
    * shuffle join — 4+ exchanges of the fact table and two scans, which is
    * exactly the shape that dies at 100× scale; this plan's cost is one
    * partial+final aggregate regardless of fact volume. */
  def customerSetOps(spark: SparkSession, dir: String): DataFrame =
    orders(spark, dir)
      .filter(col("o_orderstatus").isin("O", "F"))
      .groupBy(col("o_custkey"))
      .agg(max(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("has_open"),
        max(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("has_done"))
      .filter(col("has_open") === 1)
      .select(col("o_custkey"),
        when(col("has_done") === 1, lit("both")).otherwise(lit("only_open")).as("setop"))

  /** q14: approximate percentiles — single-pass quantile sketch per group
    * (accuracy = 10000), gated oracle-checkably since round 3 via the
    * sketch's RANK guarantee: percentile_approx returns an actual element
    * whose rank is within N/accuracy of the target rank, so the empirical
    * rank of the returned value (fraction of the group ≤ it) must sit within
    * eps of the target percentile. eps = 2/accuracy + 2/n covers the sketch
    * bound plus rank granularity and keeps the claim tie- and FP-safe while
    * still meaningful (±0.2% of rank at warehouse n). Exact p50
    * (`percentile` ≡ DuckDB quantile_cont) anchors the oracle columns.
    *
    * Shape: the 3-row sketch table broadcasts back onto the fact scan —
    * two partial+final aggregates, no extra fact shuffle, same plan family
    * as the q58/q59 broadcast-back normalizations. */
  def priceQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val o = orders(spark, dir).select(col("o_orderstatus"), col("o_totalprice"))
    val sk = o.groupBy(col("o_orderstatus")).agg(
      percentile_approx(col("o_totalprice"), lit(0.5), lit(10000)).as("a50"),
      percentile_approx(col("o_totalprice"), lit(0.9), lit(10000)).as("a90"),
      percentile_approx(col("o_totalprice"), lit(0.99), lit(10000)).as("a99"))
    def rankOf(a: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      sum(when(col("o_totalprice") <= a, 1L).otherwise(0L)).cast("double") / count(lit(1))
    val eps = lit(2.0 / 10000) + lit(2.0) / count(lit(1))
    o.join(broadcast(sk), "o_orderstatus")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        round(expr("percentile(o_totalprice, 0.5D)"), 4).as("p50_exact"),
        (abs(rankOf(col("a50")) - 0.5) <= eps).as("p50_rank_ok"),
        (abs(rankOf(col("a90")) - 0.9) <= eps).as("p90_rank_ok"),
        (abs(rankOf(col("a99")) - 0.99) <= eps).as("p99_rank_ok"))
  }

  /** q102: quantiles via the custom mergeable MRL sketch
    * (graft.functions.QuantileSketch, a native TypedImperativeAggregate) —
    * the third quantile tier next to q14's built-in approx_percentile and
    * q54's exact percentile, proving the engine can grow its own aggregate
    * state machines: partial sketches build on map tasks, kilobyte buffers
    * merge through the shuffle, and the deterministic worst-case rank
    * bound (L·n/2k, see the Scaladoc) holds under ANY merge order — so
    * the gated booleans are layout-stable by construction, not by luck.
    * Gate shape mirrors q14: exact p50 anchors the oracle columns; each
    * sketch estimate is rank-checked in-query against a generous 2% + 2/n
    * bound (theory says ≈0.15% at k=1024 and this n). */
  def mergeableQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val o = orders(spark, dir).select(col("o_orderstatus"), col("o_totalprice"))
    val sk = o.groupBy(col("o_orderstatus")).agg(
      graft.functions.QuantileSketch.quantileSketch(
        col("o_totalprice"), Seq(0.5, 0.9, 0.99)).as("qs"))
      .select(col("o_orderstatus"),
        col("qs")(0).as("s50"), col("qs")(1).as("s90"), col("qs")(2).as("s99"))
    def rankOf(a: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      sum(when(col("o_totalprice") <= a, 1L).otherwise(0L)).cast("double") / count(lit(1))
    val eps = lit(0.02) + lit(2.0) / count(lit(1))
    o.join(broadcast(sk), "o_orderstatus")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        round(expr("percentile(o_totalprice, 0.5D)"), 4).as("p50_exact"),
        (abs(rankOf(col("s50")) - 0.5) <= eps).as("s50_rank_ok"),
        (abs(rankOf(col("s90")) - 0.9) <= eps).as("s90_rank_ok"),
        (abs(rankOf(col("s99")) - 0.99) <= eps).as("s99_rank_ok"))
  }

  /** q103: robust outlier detection — per-stream median/MAD z-scores over
    * the event value column: the data-quality monitor that survives the
    * heavy tails that break mean/stddev (one corrupt 10^9 value moves a
    * mean arbitrarily; the median and MAD move by at most one rank). Flags
    * |x − med| > 3·1.4826·MAD (the normal-consistent MAD scale). Plan: two
    * tiny per-group EXACT percentile aggregates (group count is the
    * cardinality of event_type — the q54 buffering caveat does not bite on
    * low-cardinality keys) broadcast back over the fact scan; the final
    * pass is one partial+final aggregate. */
  def madOutliers(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir).select(col("event_type"), col("value"))
    val med = e.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5D)").as("med"))
    val mad = e.join(broadcast(med), "event_type")
      .groupBy(col("event_type"))
      .agg(expr("percentile(abs(value - med), 0.5D)").as("mad"))
    e.join(broadcast(med), "event_type").join(broadcast(mad), "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(min(col("med")), 4).as("med"),
        round(min(col("mad")), 4).as("mad"),
        sum(when(abs(col("value") - col("med")) > col("mad") * (3 * 1.4826), 1L)
          .otherwise(0L)).as("n_outliers"))
  }

  /** q105: argmax-per-group WITHOUT a window — the top-revenue part per
    * supplier nation, computed as max(struct(revenue, −partkey)) over the
    * per-(nation, part) aggregate: two partial+final hash aggregates and a
    * broadcast dim join, no rank window anywhere. On a 25-key group this
    * beats a window by a constant, but the shape matters at scale: the
    * struct-max is a partial aggregate (each map task emits one candidate
    * per nation), where a window must co-locate and sort EVERY
    * (nation, part) row per nation. Revenue is rounded before the argmax
    * in both engines, and ties break to the smallest partkey via the
    * negated key — fully deterministic. */
  def topPartPerNation(spark: SparkSession, dir: String): DataFrame = {
    val perPart = lineitem(spark, dir)
      .join(broadcast(supplier(spark, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey"), col("l_partkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
    perPart
      .groupBy(col("s_nationkey"))
      .agg(max(struct(col("revenue"), (-col("l_partkey")).as("negk"))).as("m"))
      .join(broadcast(nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"), (-col("m.negk")).as("p_partkey"),
        col("m.revenue").as("revenue"))
  }

  /** q106: shipping-priority top-10 (the TPC-H Q3 shape): unshipped-revenue
    * per order for one market segment — a selective broadcast dim filter
    * (customer segment), date predicates pushed to both fact scans, the
    * one genuinely big-big shuffle join (orders ⋈ lineitem on orderkey),
    * one aggregate, and a global top-10 that plans as TakeOrderedAndProject
    * (per-partition heaps, never a full sort). */
  def shippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val c = customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val o = orders(spark, dir)
      .filter(col("o_orderdate") < lit("1998-06-01"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    val l = lineitem(spark, dir)
      .filter(col("l_shipdate") > lit("1998-06-01"))
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(round(sum(col("rev")), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
      .select(col("l_orderkey"), col("o_orderdate").cast("date").as("o_orderdate"),
        col("revenue"))
  }

  /** q107: growth accounting — weekly active users split into new (first
    * week of activity) vs returning: the companion view to q93's cohort
    * triangle, collapsed to the top row every dashboard actually tracks.
    * Plan: distinct (user, week) activity (one shuffle), per-user first
    * week (reuses the user clustering), join back, one aggregate. */
  def newVsReturning(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir)
      .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
      .distinct()
    val firstWeek = e.groupBy(col("user_id")).agg(min(col("week")).as("first_week"))
    e.join(firstWeek, "user_id")
      .groupBy(col("week"))
      .agg(count(lit(1)).as("active_users"),
        sum(when(col("week") === col("first_week"), 1L).otherwise(0L)).as("new_users"))
      .select(col("week").cast("date").as("week"), col("active_users"),
        col("new_users"), (col("active_users") - col("new_users")).as("returning_users"))
  }

  /** q108: large-volume orders (the TPC-H Q18 shape) — orders whose total
    * quantity clears a threshold, rejoined to order/customer detail: the
    * group-HAVING-semi-join pattern. The aggregate runs partial+final over
    * the fact table; the surviving key set is tiny and data-dependent, so
    * the join back is left to AQE (which sees the post-filter size at
    * runtime and broadcasts it — exactly what static planning can't know);
    * the customer dim broadcasts statically. */
  def bigOrders(spark: SparkSession, dir: String, qtyCut: Double = 250.0): DataFrame = {
    val big = lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(round(sum(col("l_quantity")), 2).as("total_qty"))
      .filter(col("total_qty") > qtyCut)
    orders(spark, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("o_orderdate"),
        col("o_totalprice"), col("total_qty"))
  }

  /** q109: equi-DEPTH histogram build — the ANALYZE statistics primitive
    * behind selectivity estimation (equi-width histograms lie under skew;
    * equi-depth buckets hold equal row mass by construction). Boundaries
    * are the exact interior deciles computed in ONE percentile-array
    * aggregate (one row), broadcast back over the scan; bucket assignment
    * is nine codegen'd comparisons (no interpreted higher-order function
    * in the per-row path), then one partial+final aggregate per bucket. */
  def equiDepthHistogram(spark: SparkSession, dir: String, buckets: Int = 10): DataFrame = {
    val ps = (1 until buckets).map(i => i.toDouble / buckets)
    val bounds = orders(spark, dir).agg(
      expr(s"percentile(o_totalprice, array(${ps.mkString("D,")}D))").as("bs"))
    val bucket = (0 until buckets - 1)
      .map(i => when(col("bs").getItem(i) < col("o_totalprice"), 1).otherwise(0))
      .reduce(_ + _)
    orders(spark, dir).crossJoin(broadcast(bounds))
      .select(col("o_totalprice"), bucket.as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_orders"),
        round(min(col("o_totalprice")), 2).as("lo"),
        round(max(col("o_totalprice")), 2).as("hi"))
  }

  /** q110: order-insensitive table checksums — the data-integrity audit
    * every migration/compaction/replication pipeline runs: per table, an
    * exact row count plus a content checksum that is invariant to row
    * order, partitioning, and file layout (sum of a per-row digest-derived
    * integer — commutative, so no sort and no single-point collector; the
    * sum accumulates in decimal so it is exact, never a wrapped long).
    * Rewriting a table (q47's compaction, a repartition, a format
    * migration) must preserve the checksum; any dropped, duplicated, or
    * altered row moves it. */
  def tableChecksums(spark: SparkSession, dir: String): DataFrame = {
    def sumOf(df: DataFrame, name: String, rowStr: org.apache.spark.sql.Column): DataFrame =
      df.select(conv(substring(md5(rowStr.cast("binary")), 1, 12), 16, 10)
          .cast("decimal(38,0)").as("h"))
        .agg(count(lit(1)).as("n_rows"), sum(col("h")).as("checksum"))
        // the exact decimal sum exceeds 2^53, so the gate edge is a string
        // (float64 would silently round it on the oracle side)
        .select(lit(name).as("table_name"), col("n_rows"),
          col("checksum").cast("string").as("checksum"))
    val docs = sumOf(documents(spark, dir), "documents",
      concat_ws("|", col("doc_id"), col("text"), col("lang"), col("source")))
    val ord = sumOf(orders(spark, dir), "orders",
      concat_ws("|", col("o_orderkey"), col("o_custkey"), col("o_totalprice")))
    val li = sumOf(lineitem(spark, dir), "lineitem",
      concat_ws("|", col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice")))
    docs.unionByName(ord).unionByName(li)
  }

  /** q111: join-key skew profiler — the diagnostic that decides WHEN to
    * salt (q43) or rely on AQE skew splitting: per-key frequency stats
    * (max, top-10 mass share) plus the Shannon entropy of the key
    * distribution, in one pass over the per-key counts. A uniform key has
    * entropy ≈ ln(n_keys) and top10_share ≈ 10/n_keys; a hot key drags
    * entropy down and share up LONG before a shuffle partition OOMs —
    * profile first, then pick the mitigation. Plan: one partial+final
    * count aggregate on the key, then two tiny passes over the
    * O(n_keys) count table (a one-row global aggregate and a
    * TakeOrdered top-10), crossJoined back — the fact table is scanned
    * once. */
  def keySkewProfile(spark: SparkSession, dir: String): DataFrame = {
    val counts = events(spark, dir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("c"))
    val top10 = counts.orderBy(col("c").desc, col("user_id").asc).limit(10)
      .agg(sum(col("c")).as("top10_mass"))
    counts
      .agg(sum(col("c")).as("n_rows"), count(lit(1)).as("n_keys"),
        max(col("c")).as("max_freq"),
        sum(col("c").cast("double") * log(col("c").cast("double"))).as("clogc"))
      .crossJoin(top10)
      .select(col("n_rows"), col("n_keys"), col("max_freq"),
        round(col("top10_mass").cast("double") / col("n_rows"), 4).as("top10_share"),
        // H = ln(N) - (Σ c·ln c)/N — one pass, no per-key division
        round(log(col("n_rows").cast("double")) - col("clogc") / col("n_rows"), 4)
          .as("entropy"))
  }

  /** q112: degree distribution — "how many customers placed k orders": the
    * double aggregate (entity → count, count → frequency) behind every
    * power-law / engagement analysis. The second aggregate runs on the
    * O(entities) count table and groups on a tiny key domain. */
  def orderCountDistribution(spark: SparkSession, dir: String): DataFrame =
    orders(spark, dir)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
      .groupBy(col("n_orders")).agg(count(lit(1)).as("n_customers"))

  /** Core of q113 over explicit frames: classify every key as
    * added / removed / changed / unchanged between two snapshots by a
    * FULL OUTER join on the key comparing content fingerprints — the
    * CDC/table-diff audit that pairs with q110's checksums (the checksum
    * says "something moved"; the diff says what). One shuffle per side on
    * the key; fingerprints are computed in the scan so the join carries
    * (key, 16-byte digest), not row payloads. */
  def snapshotDiffOn(v1: DataFrame, v2: DataFrame,
      key: String, fingerprint: String): DataFrame = {
    val a = v1.select(col(key).as("k"), md5(col(fingerprint).cast("binary")).as("fp_a"))
    val b = v2.select(col(key).as("k"), md5(col(fingerprint).cast("binary")).as("fp_b"))
    a.join(b, Seq("k"), "full_outer")
      .select(col("k"),
        when(col("fp_a").isNull, "added")
          .when(col("fp_b").isNull, "removed")
          .when(col("fp_a") =!= col("fp_b"), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** q113: snapshot diff of the documents table against a deterministically
    * derived next version (every 7th doc edited, every 13th dropped, new
    * docs appended for content-bucket < 2 — the planted-change pattern the
    * rehearsal uses), reduced to per-status counts. */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val v1 = documents(spark, dir).select(col("doc_id"), col("text"))
    val v2 = v1.filter(col("doc_id") % 13 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"))
      .unionByName(
        v1.filter(Sampling.contentBucket(col("text")) < 2)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    snapshotDiffOn(v1, v2, "doc_id", "text")
      .groupBy(col("status")).agg(count(lit(1)).as("n_docs"))
  }

  /** q137: incremental materialized-view maintenance — a per-customer
    * (n_orders, total_spend) view kept current under a CDC delta WITHOUT
    * recomputing from the fact table. Deterministically derived scenario
    * (q113's planted-change pattern): orders with key % 10 == 0 arrive as
    * INSERTS after the base snapshot; base orders with key % 13 == 0 are
    * DELETED. Maintenance = aggregate the delta with SIGNED measures
    * (+1/+price for inserts, −1/−price for deletes), then one full-outer
    * merge join against the stored view, dropping keys whose count reaches
    * zero. The gate proves merged ≡ direct recompute over the updated
    * snapshot — exactly, because money sums run in DECIMAL (exact,
    * associative) rather than double, so incremental and one-pass
    * summation cannot diverge by FP order.
    *
    * Scale posture: cost is O(|delta|) + one join against the view —
    * never a fact-table rescan ([[graft.functions.Materialize]] stands in
    * for the stored view). On a cluster the view is bucketed by the view
    * key, making the merge join exchange-free on the big side; the delta
    * agg is partial+final and tiny. */
  def incrementalAgg(spark: SparkSession, dir: String): DataFrame = {
    val o = orders(spark, dir).select(col("o_orderkey"), col("o_custkey"),
      col("o_totalprice").cast("decimal(18,2)").as("price"))
    val base = o.filter(col("o_orderkey") % 10 =!= 0)
    val inserts = o.filter(col("o_orderkey") % 10 === 0)
    val deletes = base.filter(col("o_orderkey") % 13 === 0)
    val storedView = graft.functions.Materialize(base.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"), sum(col("price")).as("spend")))
    val delta = inserts
      .select(col("o_custkey"), lit(1L).as("dn"), col("price").as("dp"))
      .unionByName(deletes
        .select(col("o_custkey"), lit(-1L).as("dn"), (-col("price")).as("dp")))
      .groupBy(col("o_custkey"))
      .agg(sum(col("dn")).as("dn"), sum(col("dp")).as("dp"))
    storedView.join(delta, Seq("o_custkey"), "full_outer")
      .select(col("o_custkey"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n_orders"),
        // exact decimal arithmetic throughout; the gate edge casts to
        // double AFTER the exact sum (both engines round the same decimal
        // to the same nearest double — dtype-stable for the driver's hash)
        (coalesce(col("spend"), expr("cast(0 as decimal(28,2))")) +
          coalesce(col("dp"), expr("cast(0 as decimal(28,2))")))
          .cast("decimal(38,2)").cast("double").as("total_spend"))
      .filter(col("n_orders") > 0)
  }

  /** q114: rolling 7-day distinct active users per day. COUNT(DISTINCT)
    * cannot ride a sliding window frame (it doesn't decompose), so the
    * scale shape is bounded fan-out: the event log first reduces to
    * distinct (user, day) — corpus → O(users·days) — then each user-day
    * emits the ≤7 future days it keeps that user active for (a constant-
    * width Generate, no shuffle), distinct again collapses multi-source
    * credit, and one aggregate counts per day. Every stage is bounded by
    * users·days·7, never by raw event volume. Days beyond the log's last
    * day are clipped so trailing windows don't invent future dates. */
  def rollingActiveUsers(spark: SparkSession, dir: String): DataFrame = {
    val userDays = events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val maxDay = userDays.agg(max(col("day")).as("max_day"))
    userDays.crossJoin(broadcast(maxDay))
      .select(col("user_id"),
        explode(expr("sequence(day, least(date_add(day, 6), max_day))")).as("day"))
      .distinct()
      .groupBy(col("day"))
      .agg(count(lit(1)).as("active_7d"))
  }

  /** q115: referential-integrity audit — orphan counts for every foreign-
    * key edge in the star schema, one row per relationship: the
    * constraint checker a lakehouse runs because parquet doesn't enforce
    * FKs. Each edge is a left-anti join (no broadcast of the fact side,
    * no row payloads — keys only, distinct-reduced first so the anti join
    * probes O(distinct keys)). */
  def riAudit(spark: SparkSession, dir: String): DataFrame = {
    def orphans(edge: String, fact: DataFrame, fk: String,
        dim: DataFrame, pk: String): DataFrame = {
      val distinctFks = fact.select(col(fk).as("k")).distinct()
      distinctFks.join(dim.select(col(pk).as("k")), Seq("k"), "left_anti")
        .agg(count(lit(1)).as("n_orphan_keys"))
        .select(lit(edge).as("fk_edge"), col("n_orphan_keys"))
    }
    orphans("lineitem.l_orderkey->orders", lineitem(spark, dir), "l_orderkey",
        orders(spark, dir), "o_orderkey")
      .unionByName(orphans("orders.o_custkey->customer", orders(spark, dir), "o_custkey",
        customer(spark, dir), "c_custkey"))
      .unionByName(orphans("lineitem.l_partkey->part", lineitem(spark, dir), "l_partkey",
        part(spark, dir), "p_partkey"))
      .unionByName(orphans("lineitem.l_suppkey->supplier", lineitem(spark, dir), "l_suppkey",
        supplier(spark, dir), "s_suppkey"))
      .unionByName(orphans("customer.c_nationkey->nation", customer(spark, dir), "c_nationkey",
        nation(spark, dir), "n_nationkey"))
  }

  /** q56: batch event-time RANGE join via bin bucketing — every click in
    * the hour before each purchase (the batch twin of the streaming
    * `purchasesWithRecentClicks`, and the all-matches complement of the
    * q33 as-of join which keeps only the latest).
    *
    * Spark plans a bare inequality join as BroadcastNestedLoopJoin — O(n·m)
    * per key, the classic range-join trap. The scale shape: quantize time
    * into bins the width of the range bound; a purchase's window spans
    * exactly 2 bins, a click lives in 1, so pairs co-occur in a bin iff
    * they CAN match — the join becomes an equi-join on (user, bin) with the
    * exact range predicate verifying candidates. A pair matches at most
    * once (the click's single bin), so no dedup is needed. Asserted
    * nested-loop-free in PlanShapeSpec. */
  def clicksBeforePurchase(spark: SparkSession, dir: String): DataFrame = {
    val binUs = 3600L * 1000000L // bin width == range bound (1 h), in µs
    val e = events(spark, dir).withColumn("us", unix_micros(col("ts")))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("us").as("p_us"))
      .withColumn("bin", explode(sequence(
        floor((col("p_us") - binUs) / binUs).cast("long"),
        floor(col("p_us") / binUs).cast("long"))))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("us").as("c_us"))
      .withColumn("bin", floor(col("c_us") / binUs).cast("long"))
    purchases.join(clicks, Seq("user_id", "bin"))
      .filter(col("c_us") <= col("p_us") && col("c_us") >= col("p_us") - binUs)
      .select(col("purchase_id"), col("click_id"), col("user_id"),
        col("p_us"), col("c_us"))
  }

  /** q57: custom GROUPING SETS — per-status and per-year subtotals plus the
    * grand total in ONE pass ((status), (yr), ()): neither a ROLLUP prefix
    * chain (q34) nor a full CUBE (q06). The planner expands rows once per
    * set before the partial aggregate, so the shuffle carries ≤ 3× group
    * cardinality, not 3× input. */
  def ordersGroupingSets(spark: SparkSession, dir: String): DataFrame =
    orders(spark, dir)
      .withColumn("yr", year(col("o_orderdate")).cast("long"))
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("yr")), Seq.empty),
        col("o_orderstatus"), col("yr"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("sum_price"))

  /** q54: EXACT percentiles per group (linear interpolation at index
    * (n−1)·p — the same definition as DuckDB's quantile_cont, which makes
    * this the oracle-checkable twin of q14). Exact percentile buffers the
    * group's values — the documented cost; q14's sketch is the 100 TB
    * default and this is the audit tool, mirroring the q25/q26 pairing. */
  def priceQuantilesExact(spark: SparkSession, dir: String): DataFrame =
    orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        round(expr("percentile(o_totalprice, 0.25D)"), 4).as("p25"),
        round(expr("percentile(o_totalprice, 0.5D)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.75D)"), 4).as("p75"),
        round(expr("percentile(o_totalprice, 0.99D)"), 4).as("p99"))

  /** q80: revenue trend analytics — monthly revenue with a 3-month moving
    * average (frame window), month-over-month delta (lag), and cumulative
    * rank position (cume_dist): the frame/offset/rank window-function
    * triple q05/q08/q61 don't cover. The window is GLOBAL but runs over the
    * aggregate output (one row per month — dozens of rows at any corpus
    * size), not the fact table: aggregate first, window the summary. The
    * shuffle carries #months rows; a window over raw orders would be the
    * scale bug. */
  def revenueTrend(spark: SparkSession, dir: String): DataFrame = {
    val monthly = orders(spark, dir)
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
      .agg(round(sum(col("o_totalprice")), 2).as("revenue"),
        count(lit(1)).as("n_orders"))
    val w = Window.orderBy(col("month"))
    monthly.select(
      col("month"), col("revenue"), col("n_orders"),
      round(avg(col("revenue")).over(w.rowsBetween(-2, 0)), 2).as("mov_avg_3m"),
      round(col("revenue") - lag(col("revenue"), 1).over(w), 2).as("mom_delta"),
      round(cume_dist().over(w), 4).as("cum_pos"))
  }

  /** q81: small-quantity revenue (TPC-H Q17 shape) — the correlated-
    * aggregate pattern: lineitems below 20% of their PART's average
    * quantity. Expressed as aggregate-then-rejoin: the per-part average is
    * a partial+final hash aggregate, and the rejoin is an equi-join on
    * l_partkey — both sides shuffle on the SAME key, so at warehouse scale
    * this is two co-partitioned passes over lineitem, never a per-row
    * subquery. The per-part table is O(|part|) and deliberately NOT
    * broadcast: parts scale with the corpus, unlike nation/region. */
  def smallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = lineitem(spark, dir)
    val cut = li.groupBy(col("l_partkey"))
      .agg((avg(col("l_quantity")) * 0.2).as("qty_cut"))
    li.join(cut, "l_partkey")
      .filter(col("l_quantity") < col("qty_cut"))
      .agg(round(sum(col("l_extendedprice")) / 7.0, 2).as("avg_yearly"),
        count(lit(1)).as("n_small"))
  }

  /** q89: sole-blame supplier analysis — the TPC-H Q21 shape (multi-way
    * correlated EXISTS / NOT EXISTS against the same fact table) adapted to
    * this schema's columns: count, per supplier, the orders where that
    * supplier had a returned line (`l_returnflag = 'R'`), at least one
    * OTHER supplier also supplied the order (EXISTS → left-semi), and no
    * other supplier had a returned line in it (NOT EXISTS → left-anti).
    *
    * The point is the decorrelation: both correlated subqueries become
    * hash joins on `l_orderkey` with a non-equi supplier guard — no
    * per-row re-scan of lineitem (the naive correlated plan is O(n²)).
    * All three legs shuffle on the same orderkey key, so AQE can reuse the
    * exchange; the final per-supplier count is a partial+final aggregate.
    * Top-10 by blame count with supplier tie-break keeps output stable. */
  def blamedSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val li = lineitem(spark, dir)
    val returned = li.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_suppkey")).distinct()
    val others = li.select(col("l_orderkey").as("o_ok"), col("l_suppkey").as("o_sk"))
    val otherReturned = returned.select(col("l_orderkey").as("r_ok"), col("l_suppkey").as("r_sk"))
    returned
      .join(others,
        col("l_orderkey") === col("o_ok") && col("l_suppkey") =!= col("o_sk"),
        "left_semi")
      .join(otherReturned,
        col("l_orderkey") === col("r_ok") && col("l_suppkey") =!= col("r_sk"),
        "left_anti")
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("l_suppkey").asc)
      .limit(10)
      .select(col("l_suppkey"), col("numwait"))
  }

  /** q91: semi-structured map explode — the events `props` JSON parsed as a
    * dynamic MAP (schema unknown at write time, unlike q11's fixed-path
    * `get_json_object`) and exploded to one row per key. This is the
    * schema-on-read shape every telemetry pipeline needs: new payload keys
    * appear in the output with zero code change. Plan: from_json + Generate
    * are narrow (fused into the scan); the per-(event_type, key) rollup is
    * one partial+final aggregate. */
  def propsMapExplode(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(col("event_type"),
        explode(from_json(col("props"), org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.LongType))).as(Seq("prop_key", "prop_value")))
      .groupBy(col("event_type"), col("prop_key"))
      .agg(count(lit(1)).as("n"),
        sum(col("prop_value")).as("sum_value"),
        round(avg(col("prop_value")), 4).as("avg_value"))

  /** q92: conversion-funnel analysis — per user the ORDERED stage chain
    * first view → first click at-or-after that view → first purchase
    * at-or-after that click, reported as per-stage user counts and
    * conversion rates. The ordering constraint is what distinguishes a
    * funnel from three filters: each stage joins the previous stage's
    * per-user anchor timestamp (all three stage frames are per-user
    * aggregates — tiny relative to the event log — and the joins are
    * equi-joins on user_id; the event log itself is scanned once per
    * stage and never self-joined row-to-row). Epoch-second flooring keeps
    * sub-second timestamp precision out of the comparison (q12's rule). */
  def conversionFunnel(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir)
      .select(col("user_id"), col("event_type"),
        floor(unix_timestamp(col("ts"))).as("ts_s"))
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts_s")).as("v_ts"))
    val c = e.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("ts_s") >= col("v_ts"))
      .groupBy(col("user_id")).agg(min(col("ts_s")).as("c_ts"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("ts_s") >= col("c_ts"))
      .groupBy(col("user_id")).agg(min(col("ts_s")).as("p_ts"))
    v.agg(count(lit(1)).as("n_view")).crossJoin(
        c.agg(count(lit(1)).as("n_click_after_view")))
      .crossJoin(p.agg(count(lit(1)).as("n_purchase_after_click")))
      .select(col("n_view"), col("n_click_after_view"), col("n_purchase_after_click"),
        round(col("n_click_after_view").cast("double") / col("n_view"), 4)
          .as("view_to_click"),
        round(col("n_purchase_after_click").cast("double") / col("n_click_after_view"), 4)
          .as("click_to_purchase"))
  }

  /** q93: cohort retention — users grouped by first-activity week (the
    * cohort), counted in each subsequent week they were active: the
    * standard growth-analytics triangle. Plan: per-user first-event
    * aggregate (one shuffle on user_id), broadcast-able join back (the
    * per-user cohort table is small relative to the event log), then one
    * partial+final aggregate on (cohort_week, week_offset). Weeks are
    * ISO-Monday `date_trunc` in both engines; the offset is integer
    * day-diff arithmetic. */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir)
      .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
    val cohorts = e.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
    e.join(cohorts, "user_id")
      .groupBy(col("cohort_week"),
        (datediff(col("week"), col("cohort_week")) / 7).cast("int").as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .select(col("cohort_week").cast("date").as("cohort_week"),
        col("week_offset"), col("n_users"))
  }

  /** q94: column profiling — the ANALYZE-TABLE statistics pass every
    * warehouse runs before query planning and every data-quality monitor
    * runs on ingest: per column, row/null/distinct counts and min/max,
    * emitted long-form (one row per column). ONE scan computes every
    * column's aggregates in a single partial+final HashAggregate (the
    * multi-countDistinct expands internally, still one pass over the
    * data); the wide 1-row result is melted client-side via unpivot-style
    * unioned selects over a frame that is already tiny. Values are
    * stringified for the uniform schema; doubles/timestamps cast
    * identically in both engines. */
  def columnProfile(spark: SparkSession, dir: String): DataFrame = {
    val cols = Seq("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate")
    val agg = lineitem(spark, dir).agg(
      count(lit(1)).as("n_rows"),
      cols.flatMap(c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
        countDistinct(col(c)).as(s"${c}_distinct"),
        min(col(c)).cast("string").as(s"${c}_min"),
        max(col(c)).cast("string").as(s"${c}_max"))): _*)
    cols.map { c =>
      agg.select(lit(c).as("column"), col("n_rows"),
        col(s"${c}_nulls").as("n_null"),
        col(s"${c}_distinct").as("n_distinct"),
        col(s"${c}_min").as("min_val"), col(s"${c}_max").as("max_val"))
    }.reduce(_.unionByName(_))
  }

  /** q95: fuzzy record-linkage join — near-identical document pairs by
    * EDIT distance (levenshtein), the classic entity-resolution primitive
    * that set-similarity (q25) can't express: character-level edits don't
    * move Jaccard much on long texts, and vice versa. Exact all-pairs edit
    * distance is O(n²·len²) — the standard scale shape is BLOCKING: an
    * equi-join on a cheap deterministic key (here: first 16 chars) plus a
    * length band, then the expensive distance only on blocked candidates.
    * Blocking keys are content-derived, so the join is a plain hash join
    * that AQE can skew-split; candidate volume tracks true near-pair
    * density. Similarity = 1 − lev/max(len), threshold 0.7. Memoized per
    * (session, dir, threshold) — q95 and the ensemble family (q122/q134)
    * all consume this edge set; see [[graft.functions.SessionMemo]]. */
  def fuzzyNearDup(spark: SparkSession, dir: String, simThreshold: Double = 0.7): DataFrame =
    graft.functions.SessionMemo(spark, s"fuzzyedges:$dir:$simThreshold")(
      fuzzyCandidates(spark, dir)
        .withColumn("lev", levenshtein(col("ta"), col("tb")))
        .withColumn("edit_sim",
          round(lit(1.0) - col("lev").cast("double") / greatest(col("la"), col("lb")), 4))
        .filter(col("edit_sim") >= simThreshold)
        .select(col("doc_a"), col("doc_b"), col("lev").cast("long").as("lev"), col("edit_sim")))

  /** The blocked candidate stage of [[fuzzyNearDup]] (equi-join on a
    * COMPOSITE key: first-3-TOKENS block × width-30 length bucket, BEFORE
    * the edit distance) — also the scale instrumentation: blocked-pair
    * count is what must grow with true near-pair density, not the n² pair
    * space (ScaleRehearsal).
    *
    * The length bucket is part of the JOIN KEY, not a post-filter: a
    * prefix-only block is content-skew-exposed (boilerplate prefixes
    * collapse the corpus into one key, and one task gets the whole block's
    * cross product). Bucketing by ⌊len/30⌋ caps any (prefix, bucket) block
    * at the docs of one length class. The band |la−lb| ≤ 30 spans at most
    * adjacent buckets, so the probe side emits its bucket ±1 (3 keys) and
    * every band pair still meets on exactly one key — identical candidate
    * semantics, deterministically bounded worst block.
    *
    * The TOKEN prefix (round 9; replaces the round-4 16-char prefix) is
    * what keeps the block's discriminating power independent of token
    * width: a fixed char window covers FEWER distinguishing tokens the
    * moment content grows uniform decoration (markup, tags, boilerplate
    * IDs — ScaleRehearsal's tagged-copy corpus is the measured adversary:
    * 2-char tags cost the char-16 window a third of its selectivity and
    * tripled per-cohort candidates), while "the first three tokens" always
    * carries three content units and is whitespace-normalized for free.
    * Measured at 10× corpus: 3,854 candidates vs 12,098 under the char
    * key — 1.26× linear vs 3.9×. Recall posture unchanged in kind: edits
    * within the first three tokens drop the pair (the char window had the
    * same failure class in its first 16 chars); production ER would union
    * a second blocking pass. */
  private[graft] def fuzzyCandidates(spark: SparkSession, dir: String): DataFrame = {
    val d = documents(spark, dir)
      .select(col("doc_id"), col("text"),
        concat_ws(" ",
          slice(graft.analytics.TextStats.tokens(col("text")), 1, 3)).as("blk"),
        length(col("text")).as("l"),
        (col("l") / 30).cast("int").as("lbk0"))
    val a = d.select(col("doc_id").as("doc_a"), col("text").as("ta"),
      col("blk"), col("l").as("la"), col("lbk0").as("lbk"))
    val b = d.select(col("doc_id").as("doc_b"), col("text").as("tb"),
      col("blk"), col("l").as("lb"),
      explode(array(col("lbk0") - 1, col("lbk0"), col("lbk0") + 1)).as("lbk"))
    a.join(b, Seq("blk", "lbk"))
      .filter(col("doc_a") < col("doc_b") && abs(col("la") - col("lb")) <= 30)
      .drop("lbk")
  }

  /** q96: rolling 7-day revenue — a RANGE-frame window (value-based bounds,
    * not row counts: days with no orders still age out of the frame) over
    * the per-day aggregate. The event log reduces to O(distinct days)
    * BEFORE the window, so the ordered global window runs on a tiny frame —
    * the correct time-series shape at any scale (the window input is
    * bounded by the calendar, not the corpus). */
  def rollingRevenue(spark: SparkSession, dir: String): DataFrame = {
    val daily = orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(round(sum(col("o_totalprice")), 2).as("revenue"))
      .withColumn("day_num", datediff(col("day"), lit("1970-01-01")))
    val w = Window.orderBy(col("day_num")).rangeBetween(-6, 0)
    daily
      .withColumn("rolling_7d", round(sum(col("revenue")).over(w), 2))
      .select(col("day"), col("revenue"), col("rolling_7d"))
  }

  /** q99: session-scoped conversion funnel — q92's ordered funnel run
    * WITHIN each 30-min-gap session (q12's assignment) instead of over a
    * user's whole history: view → click at-or-after the session's first
    * view → purchase at-or-after that click, all inside one session. The
    * composition answers the product question q92 can't ("does a visit
    * convert?" vs "does a user ever convert?"). Plan: the sessionize
    * window shuffles once on user_id; every per-session stage is a
    * whole-partition window over (user_id, session_id) — hash(user_id)
    * already co-locates those rows, so Spark adds NO second exchange,
    * only a partition-local sort; the stage dependency (c_ts needs v_ts)
    * chains three Window nodes over the same distribution. The final
    * one-row reduce is a partial+final aggregate. */
  def sessionFunnel(spark: SparkSession, dir: String): DataFrame =
    sessionFunnelOn(events(spark, dir))

  /** Per-session funnel stage anchors: one row per (user, session) with the
    * session's first view, first in-session click at-or-after it, and first
    * purchase at-or-after that (nulls where a stage never fires). Shared by
    * q99 (stage counts) and q117 (conversion-latency stats). */
  private[graft] def sessionStagesOn(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_s").asc, col("event_id").asc)
    val bySess = Window.partitionBy(col("user_id"), col("session_id"))
    events
      .withColumn("ts_s", unix_seconds(col("ts")))
      .withColumn("gap_s", col("ts_s") - lag(col("ts_s"), 1).over(byUser))
      .withColumn("new_sess", when(col("gap_s").isNull || col("gap_s") > 1800, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_sess")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("v_ts", min(when(col("event_type") === "view", col("ts_s"))).over(bySess))
      .withColumn("c_ts", min(when(col("event_type") === "click" &&
        col("ts_s") >= col("v_ts"), col("ts_s"))).over(bySess))
      .withColumn("p_ts", min(when(col("event_type") === "purchase" &&
        col("ts_s") >= col("c_ts"), col("ts_s"))).over(bySess))
      .groupBy(col("user_id"), col("session_id"))
      .agg(max(col("v_ts")).as("v_ts"), max(col("c_ts")).as("c_ts"),
        max(col("p_ts")).as("p_ts"))
  }

  /** Core of q99 over an explicit (user_id, event_id, event_type, ts) frame
    * (unit-testable with hand-built sessions). */
  def sessionFunnelOn(events: DataFrame): DataFrame = {
    val sessions = sessionStagesOn(events)
    sessions.agg(
        count(lit(1)).as("n_sessions"),
        count(col("v_ts")).as("n_view_sessions"),
        count(col("c_ts")).as("n_click_sessions"),
        count(col("p_ts")).as("n_purchase_sessions"))
      .select(col("n_sessions"), col("n_view_sessions"), col("n_click_sessions"),
        col("n_purchase_sessions"),
        round(col("n_click_sessions").cast("double") / col("n_view_sessions"), 4)
          .as("view_to_click"),
        round(col("n_purchase_sessions").cast("double") / col("n_click_sessions"), 4)
          .as("click_to_purchase"))
  }

  /** q116: top session paths — the most frequent within-session event-type
    * trigrams, the sequence-mining view behind "what do users actually do":
    * each event row derives its forward path via two LEADs over the session
    * order (no per-session collect, no list state — path extraction is a
    * pure window over the same (user, session) clustering q99 rides, so it
    * reuses the single user_id exchange), then one partial+final count
    * aggregate and a global top-10 (TakeOrderedAndProject). */
  def topSessionPaths(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_s").asc, col("event_id").asc)
    val bySess = Window.partitionBy(col("user_id"), col("session_id"))
      .orderBy(col("ts_s").asc, col("event_id").asc)
    events(spark, dir)
      .withColumn("ts_s", unix_seconds(col("ts")))
      .withColumn("gap_s", col("ts_s") - lag(col("ts_s"), 1).over(byUser))
      .withColumn("new_sess", when(col("gap_s").isNull || col("gap_s") > 1800, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_sess")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("path", concat(col("event_type"), lit(">"),
        lead(col("event_type"), 1).over(bySess), lit(">"),
        lead(col("event_type"), 2).over(bySess)))
      .filter(col("path").isNotNull)
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path").asc)
      .limit(k)
  }

  /** q117: conversion latency — among fully-converting sessions (q99's
    * stage anchors all present), the distribution of seconds from first
    * view to purchase and from click to purchase: count, mean, exact
    * median/p90. Runs on the per-session stage frame (already tiny), so
    * the exact percentile buffering is bounded by session count. */
  def timeToConvert(spark: SparkSession, dir: String): DataFrame =
    sessionStagesOn(events(spark, dir))
      .filter(col("p_ts").isNotNull)
      .select((col("p_ts") - col("v_ts")).as("v2p"), (col("p_ts") - col("c_ts")).as("c2p"))
      .agg(count(lit(1)).as("n_converting"),
        round(avg(col("v2p")), 4).as("mean_v2p_s"),
        round(expr("percentile(v2p, 0.5D)"), 4).as("p50_v2p_s"),
        round(expr("percentile(v2p, 0.9D)"), 4).as("p90_v2p_s"),
        round(expr("percentile(c2p, 0.5D)"), 4).as("p50_c2p_s"))

  /** q100: per-stream freshness/lag monitor — the ingest-health view every
    * multi-source pipeline runs continuously: per event stream, volume,
    * last-seen timestamp, lag behind the corpus watermark (max ts anywhere
    * — explicit, replayable; wall-clock `now()` would make the result
    * non-deterministic), trailing-24h volume, and a staleness flag. Plan:
    * the watermark is a one-row global aggregate broadcast back over the
    * per-stream aggregate (never a window over the event log); the event
    * scan feeds ONE partial+final HashAggregate keyed by stream. */
  def sourceFreshness(spark: SparkSession, dir: String, staleAfterS: Long = 3600): DataFrame = {
    val e = events(spark, dir)
      .select(col("event_type"), unix_seconds(col("ts")).as("ts_s"))
    val wm = e.agg(max(col("ts_s")).as("watermark"))
    e.crossJoin(broadcast(wm))
      .groupBy(col("event_type"), col("watermark"))
      .agg(count(lit(1)).as("n_events"),
        max(col("ts_s")).as("last_ts"),
        sum(when(col("ts_s") >= col("watermark") - 86400L, 1L).otherwise(0L))
          .as("n_last_24h"))
      .select(col("event_type"), col("n_events"), col("last_ts"),
        (col("watermark") - col("last_ts")).as("lag_s"),
        col("n_last_24h"),
        (col("watermark") - col("last_ts") > staleAfterS).as("is_stale"))
  }

  /** q123: minimum-cost supplier (the TPC-H Q2 shape) — for each part in a
    * selective slice, every supplier quoting the MINIMUM unit price observed
    * for that part, with supplier/nation detail. The defining feature is the
    * correlated scalar subquery (`price = (SELECT min(price) … WHERE
    * part = outer.part)`), which the oracle states literally; the Spark side
    * is the decorrelated plan Catalyst would produce anyway — one
    * partial+final min-aggregate per part, joined back on (part, price) —
    * written explicitly so the shape is visible and plan-assertable. All
    * price arithmetic is rounded BEFORE the min and the equi-join, so the
    * argmin ties are exact in both engines; ties keep every tied supplier
    * (Q2 semantics), deduped to one row per (part, supplier, price).
    * Scale: the part slice broadcasts into the fact scan (filter first, so
    * the fact join is selective), the min-table is tiny (≤ |parts|) and
    * AQE-broadcast, supplier/nation broadcast statically. */
  def minCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val u = lineitem(spark, dir).select(col("l_partkey"), col("l_suppkey"),
      round(col("l_extendedprice") / col("l_quantity"), 4).as("unit_price"))
    val p = part(spark, dir)
      .filter(col("p_type") === "PROMO" && col("p_size") < 15)
      .select(col("p_partkey"), col("p_brand"))
    val priced = u.join(broadcast(p), col("l_partkey") === col("p_partkey"))
    val mins = priced.groupBy(col("l_partkey").as("mk"))
      .agg(min(col("unit_price")).as("min_price"))
    priced
      .join(mins, col("l_partkey") === col("mk") &&
        col("unit_price") === col("min_price"))
      .join(broadcast(supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .select(col("p_partkey"), col("p_brand"), col("s_name"),
        col("n_name").as("nation"), col("unit_price"))
      .distinct()
  }

  /** q124: co-purchase pairs — the market-basket edge list: distinct part
    * pairs appearing in the same order, counted across orders, global
    * top-20. Pair generation is a self-equi-join on l_orderkey over the
    * DISTINCT (order, part) projection, so fan-out per order is
    * C(basket, 2) with baskets bounded by order size (≤ 7 lineitems in
    * TPC-H) — per-order quadratic, globally linear in orders. The count is
    * partial+final on the pair key; the top-20 plans as
    * TakeOrderedAndProject (per-partition heaps, no global sort). */
  def copurchasePairs(spark: SparkSession, dir: String, k: Int = 20): DataFrame =
    Graph.coPurchaseEdges(spark, dir)
      .select(col("pa").as("part_a"), col("pb").as("part_b"),
        col("n").as("n_orders"))
      .orderBy(col("n_orders").desc, col("part_a").asc, col("part_b").asc)
      .limit(k)

  /** q125: association rules over the co-purchase graph — for every
    * DIRECTED pair (a → b) co-occurring in ≥ minSupport orders: support
    * count, confidence = P(b | a), and lift = confidence / P(b). The whole
    * measure stack is exact integer counts until the two final divisions
    * (rounded at the edge), so it is deterministic and oracle-checkable —
    * no FP accumulation anywhere. Plan: ONE pair aggregate (reusing q124's
    * bounded per-order fan-out), one per-part aggregate, the order count
    * as a one-row broadcast; both enrichment joins are on the tiny
    * aggregate tables, never on the fact scan. */
  def associationRules(spark: SparkSession, dir: String, minSupport: Long = 3): DataFrame = {
    // the basket table feeds three branches (pair counts, per-part counts,
    // the order universe) — materialize it once (Spark does not share
    // identical subtrees), then derive everything from the tiny frame
    val baskets = graft.functions.Materialize(Graph.orderBaskets(spark, dir))
    // order universe as a one-row broadcast (never a driver-side action)
    val nOrders = baskets.agg(count(lit(1)).as("n_orders"))
    val freq = baskets.select(explode(col("ps")).as("l_partkey"))
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("n_part"))
    // the weighted pair counts ARE the memoized co-purchase edge table
    // (same basket explode, same aggregate — value-identical by
    // construction); consuming the memo drops the pair explode+aggregate
    // from this query's own plan (round-15: it was recomputed here and in
    // q150 despite q00 already charging the shared build)
    val und = Graph.coPurchaseEdges(spark, dir)
      .filter(col("n") >= minSupport)
      .select(col("pa").as("part_a"), col("pb").as("part_b"),
        col("n").as("n_both"))
    // directed rules: each undirected pair in both directions, same count
    val pairs = und.unionByName(und.select(col("part_b").as("part_a"),
      col("part_a").as("part_b"), col("n_both")))
    pairs
      .join(freq.select(col("l_partkey").as("part_a"), col("n_part").as("n_a")), "part_a")
      .join(freq.select(col("l_partkey").as("part_b"), col("n_part").as("n_b")), "part_b")
      .crossJoin(broadcast(nOrders))
      .select(col("part_a"), col("part_b"), col("n_both"), col("n_a"), col("n_b"),
        round(col("n_both").cast("double") / col("n_a"), 4).as("confidence"),
        round(col("n_both").cast("double") * col("n_orders") /
          (col("n_a") * col("n_b")), 4).as("lift"))
  }

  /** q151: mergeable-sketch rollup — the pre-aggregated sketch-table
    * pattern that serves distinct counts at warehouse scale: per-day HLL
    * sketches of the user set are built ONCE (the sketch table a nightly
    * job would persist), and any coarser rollup — here per event type
    * across all days — is answered by UNIONING sketches, never re-scanning
    * the fact table. This is the entire point of mergeable sketches: the
    * 100 TB scan happens once, every subsequent distinct-count query runs
    * on KB-scale sketch rows.
    *
    * The gate pins the two properties that make the pattern sound:
    * `mergeable_ok` — the estimate from the unioned daily sketches equals
    * the estimate from a direct one-pass sketch (HLL registers are maxes,
    * so union-of-sketches ≡ sketch-of-union, and the estimate is a pure
    * function of registers — deterministic, order-insensitive);
    * `bounded_ok` — both estimates sit within 5% of the exact distinct
    * count (lgConfigK=12 → ~1.6% rse). The exact count rides along as the
    * shared ground truth the DuckDB oracle recomputes. */
  def sketchRollup(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(col("event_type"), col("user_id"), to_date(col("ts")).as("day"))
    val daily = ev.groupBy(col("event_type"), col("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val rolled = daily.groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_rollup"))
    val direct = ev.groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est_direct"),
        count_distinct(col("user_id")).as("n_exact"))
    direct.join(rolled, "event_type")
      .select(col("event_type"), col("n_exact"),
        (col("est_rollup") === col("est_direct")).as("mergeable_ok"),
        (abs(col("est_direct") - col("n_exact")) <=
          col("n_exact").cast("double") * 0.05).as("bounded_ok"))
  }

  /** q150: item-kNN neighbor lists — the top-k most-cosine-similar items
    * per item over the co-purchase matrix: cos(a,b) = n_both/√(n_a·n_b)
    * on binary order-membership vectors. This is the classic item-based
    * collaborative-filtering precompute (the neighbor table a recommender
    * serves from), and the third co-purchase measure after q125's
    * confidence (directional) and lift (independence-relative) — cosine is
    * the symmetric, popularity-normalized one.
    *
    * Determinism: all inputs to the similarity are exact integers; the one
    * double expression (÷√) has identical operands in both engines, and
    * ranking uses the ROUNDED similarity with item-id tie-break, so the
    * top-k cut is engine-exact even among 4-dp ties. Plan: q124's bounded
    * pair aggregate + two joins against the tiny per-item frequency table,
    * then a per-item window — rank ≤ k lowers to WindowGroupLimit (per-
    * partition top-k heaps, no full sort materialization), parallelism
    * scales with the item universe. */
  def itemKnn(spark: SparkSession, dir: String, minSupport: Long = 3,
      k: Int = 3): DataFrame = {
    // basket table materialized once; per-part counts and directed pairs
    // derive from it (q125's shape — see associationRules)
    val baskets = graft.functions.Materialize(Graph.orderBaskets(spark, dir))
    val freq = baskets.select(explode(col("ps")).as("l_partkey"))
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("n_part"))
    // pair counts from the memoized co-purchase edge table (q125's shape —
    // value-identical to the in-query explode+aggregate it replaces)
    val und = Graph.coPurchaseEdges(spark, dir)
      .filter(col("n") >= minSupport)
      .select(col("pa").as("part_a"), col("pb").as("part_b"),
        col("n").as("n_both"))
    val pairs = und.unionByName(und.select(col("part_b").as("part_a"),
      col("part_a").as("part_b"), col("n_both")))
    pairs
      .join(freq.select(col("l_partkey").as("part_a"), col("n_part").as("n_a")), "part_a")
      .join(freq.select(col("l_partkey").as("part_b"), col("n_part").as("n_b")), "part_b")
      .select(col("part_a"), col("part_b"),
        round(col("n_both").cast("double") / sqrt(col("n_a") * col("n_b")), 4).as("cos_sim"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("part_a")).orderBy(col("cos_sim").desc, col("part_b").asc)))
      .filter(col("rnk") <= k)
  }

  /** q126: ratio-to-report at two levels — each nation's revenue as a share
    * of its region and of the grand total. The classic OLAP "percent of
    * total" is often written as a windowed sum; here both denominators are
    * LOW-cardinality (5 regions, 1 total), so the right 100 TB shape is the
    * q58/q59 one: aggregate the denominators separately and broadcast them
    * back — a window over the detail would serialize on 5 partition keys.
    * Per-nation revenue is rounded to cents before the share division in
    * both engines, so the ratios are oracle-stable at 4 dp. */
  def revenueShare(spark: SparkSession, dir: String): DataFrame = {
    val rev = lineitem(spark, dir)
      .join(broadcast(supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
    val regionTot = rev.groupBy(col("r_name").as("rt_name"))
      .agg(sum(col("revenue")).as("region_rev"))
    val grand = rev.agg(sum(col("revenue")).as("total_rev"))
    rev
      .join(broadcast(regionTot), col("r_name") === col("rt_name"))
      .crossJoin(broadcast(grand))
      .select(col("r_name").as("region"), col("n_name").as("nation"), col("revenue"),
        round(col("revenue") / col("region_rev"), 4).as("share_of_region"),
        round(col("revenue") / col("total_rev"), 4).as("share_of_total"))
  }

  /** q127: inter-order gap distribution — per customer, days between
    * consecutive orders (lag over the customer's order history), reduced to
    * the corpus-level purchase-cadence profile: gap count, mean, exact
    * median/p90, max. The window partitions on the high-cardinality
    * customer key (parallelism scales with customers); the exact
    * percentiles buffer only the gap table, which is strictly smaller than
    * orders. Ties in order date break on o_orderkey, so gaps are
    * deterministic. */
  def orderGapStats(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
      .withColumn("gap_days",
        datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w)))
      .filter(col("gap_days").isNotNull)
      .agg(count(lit(1)).as("n_gaps"),
        round(avg(col("gap_days")), 4).as("mean_gap_days"),
        round(expr("percentile(gap_days, 0.5D)"), 4).as("p50_gap_days"),
        round(expr("percentile(gap_days, 0.9D)"), 4).as("p90_gap_days"),
        max(col("gap_days")).as("max_gap_days"))
  }

  /** q128: RFM segmentation — the standard customer scoring: recency (days
    * since last order, against the corpus watermark — max order date, never
    * wall clock), frequency (order count), monetary (total spend), each
    * scored 1-5 by exact quintile. Scores use the q109 equi-depth pattern:
    * the four interior quintile boundaries per metric come from ONE
    * percentile-array aggregate row broadcast back over the per-customer
    * aggregate, and score assignment is four codegen'd comparisons — a
    * global ntile window would single-partition the customer universe,
    * which is exactly what doesn't survive 100 TB. Segment labels are a
    * deterministic CASE over the three scores, mirrored verbatim in the
    * oracle. */
  def rfmSegments(spark: SparkSession, dir: String): DataFrame = {
    val o = orders(spark, dir)
    val wm = o.agg(max(col("o_orderdate").cast("date")).as("watermark"))
    val perCust = o
      .crossJoin(broadcast(wm))
      .groupBy(col("o_custkey"), col("watermark"))
      .agg(count(lit(1)).as("frequency"),
        round(sum(col("o_totalprice")), 2).as("monetary"),
        max(col("o_orderdate").cast("date")).as("last_order"))
      .select(col("o_custkey"),
        datediff(col("watermark"), col("last_order")).as("recency_days"),
        col("frequency"), col("monetary"))
    val bounds = perCust.agg(
      expr("percentile(recency_days, array(0.2D, 0.4D, 0.6D, 0.8D))").as("rq"),
      expr("percentile(frequency,    array(0.2D, 0.4D, 0.6D, 0.8D))").as("fq"),
      expr("percentile(monetary,     array(0.2D, 0.4D, 0.6D, 0.8D))").as("mq"))
    def score(metric: Column, qs: Column): Column =
      (lit(1) + (0 until 4).map(i => when(metric > element_at(qs, i + 1), 1).otherwise(0))
        .reduce(_ + _)).cast("int")
    perCust.crossJoin(broadcast(bounds))
      // recency: LOWER is better, so the quintile rank is inverted
      .withColumn("r_score", (lit(6) - score(col("recency_days").cast("double"), col("rq"))).cast("int"))
      .withColumn("f_score", score(col("frequency").cast("double"), col("fq")))
      .withColumn("m_score", score(col("monetary"), col("mq")))
      .withColumn("segment",
        when(col("r_score") >= 4 && col("f_score") >= 4 && col("m_score") >= 4, "champion")
          .when(col("r_score") <= 2 && col("f_score") >= 4, "at_risk")
          .when(col("r_score") >= 4 && col("f_score") <= 2, "recent")
          .when(col("f_score") <= 2 && col("m_score") <= 2, "low_value")
          .otherwise("regular"))
      .select(col("o_custkey"), col("recency_days"), col("frequency"), col("monetary"),
        col("r_score"), col("f_score"), col("m_score"), col("segment"))
  }

  /** q129: SCD2 interval build from the event log — per user, the
    * event_type value treated as a changing attribute: consecutive repeats
    * collapse, each retained change opens an interval [valid_from,
    * valid_to) closed by the next change (null = current version), with a
    * version number. This is the type-2 slowly-changing-dimension
    * construction every CDC warehouse pipeline runs. Both windows (the
    * change filter's lag and the interval-closing lead) share the
    * hash(user_id) clustering — one exchange total; ordering ties break on
    * event_id so intervals are deterministic. */
  def scd2Intervals(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_s").asc, col("event_id").asc)
    events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_seconds(col("ts")).as("ts_s"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      .withColumn("valid_from", col("ts_s"))
      .withColumn("valid_to", lead(col("ts_s"), 1).over(w))
      .withColumn("version", row_number().over(w).cast("long"))
      .select(col("user_id"), col("version"), col("event_type").as("state"),
        col("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
  }

  /** q131: interval-OVERLAP join — q56's binned range-join pattern extended
    * from point-in-interval to interval×interval: user sessions (q12's
    * 30-min-gap assignment) joined to the daily 00:00-01:00 maintenance
    * window they overlap, reporting sessions caught in the window and the
    * overlapping seconds. The naive formulation is a cross join with two
    * inequality predicates; here each session explodes to the DAYS it
    * spans (bounded — sessions are minutes-to-hours, so almost always one
    * or two rows) and joins the window table on the day key, with the
    * exact overlap predicate evaluated only on day-collocated candidates.
    * At warehouse scale the bin key makes this a plain shuffle equi-join
    * whose fan-out tracks session duration, never the session×window
    * cross-product. All interval math is integer epoch seconds. */
  def maintenanceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val sess = sessionize(spark, dir)
      .select(col("user_id"), col("session_id"), col("sess_start"), col("sess_end"))
      .withColumn("day", explode(sequence(
        floor(col("sess_start") / 86400L).cast("long"),
        floor(col("sess_end") / 86400L).cast("long"))))
    val bounds = events(spark, dir)
      .select(unix_seconds(col("ts")).as("ts_s"))
      .agg(floor(min(col("ts_s")) / 86400L).cast("long").as("dmin"),
        floor(max(col("ts_s")) / 86400L).cast("long").as("dmax"))
    val wins = bounds
      .select(explode(sequence(col("dmin"), col("dmax"))).as("day"))
      .select(col("day"), (col("day") * 86400L).as("win_start"),
        (col("day") * 86400L + 3600L).as("win_end"))
    sess.join(wins, Seq("day"))
      .filter(col("sess_start") < col("win_end") && col("sess_end") >= col("win_start"))
      .groupBy(col("day"), col("win_start"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(least(col("sess_end"), col("win_end")) -
          greatest(col("sess_start"), col("win_start"))).as("overlap_s"))
  }

  /** q135: marketing-style session attribution — every purchase event is
    * credited to its session's FIRST touch (the event_type that opened the
    * session) and its LAST touch (the event_type immediately preceding the
    * purchase inside the session; 'direct' when the purchase itself opens
    * the session), aggregated to (first_touch, last_touch) cells with
    * purchase counts and revenue.
    *
    * Plan shape: the session chain and both touch windows all partition by
    * user_id (or a superset key whose clustering user_id satisfies), so
    * the whole derivation rides ONE user_id exchange — the q129 pattern;
    * the only second shuffle is the final small aggregate. Revenue sums
    * round at the edge like every double aggregate under the gate. */
  def attribution(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_s").asc, col("event_id").asc)
    val bySession = Window.partitionBy(col("user_id"), col("session_id"))
      .orderBy(col("ts_s").asc, col("event_id").asc)
    events(spark, dir)
      .withColumn("ts_s", unix_seconds(col("ts")))
      .withColumn("gap_s", col("ts_s") - lag(col("ts_s"), 1).over(byUser))
      .withColumn("new_sess", when(col("gap_s").isNull || col("gap_s") > 1800, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_sess")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("first_touch", first(col("event_type")).over(
        bySession.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("last_touch", coalesce(lag(col("event_type"), 1).over(bySession), lit("direct")))
      .filter(col("event_type") === "purchase")
      .groupBy(col("first_touch"), col("last_touch"))
      .agg(count(lit(1)).as("n_purchases"),
        round(sum(col("value")), 2).as("revenue"))
  }

  /** q90: unpivot (melt) — the inverse of q35's pivot: a wide per-flag
    * aggregate (sum_qty / sum_price / avg_disc as columns) melted back to
    * long (flag, metric, val) rows. Spark's `unpivot` plans as an Expand
    * node — each input row fans out to one row per metric with NO shuffle;
    * the only exchange is the small upstream aggregate. Values are rounded
    * before the melt so the long form is oracle-comparable. */
  def returnFlagUnpivot(spark: SparkSession, dir: String): DataFrame = {
    val wide = lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"))
    wide.unpivot(
      ids = Array(col("l_returnflag")),
      values = Array(col("sum_qty"), col("sum_price"), col("avg_disc")),
      variableColumnName = "metric",
      valueColumnName = "val")
  }

  /** q149: Pareto frontier (skyline) of distinct (price, order date) points —
    * the orders no other order beats on BOTH "cheaper" and "more recent":
    * r survives iff no s has s.price ≤ r.price ∧ s.odate ≥ r.odate with at
    * least one strict. The skyline operator the multi-objective "best
    * trade-off" question needs, done without the quadratic all-pairs
    * dominance join.
    *
    * Plan — bucket-prefilter + bounded window, both dominance checks split
    * by date bucket:
    *  1. distinct points, date-bucketed (fixed integer widths from one
    *     scalar bounds aggregate, broadcast back);
    *  2. per-bucket min price (≤ nBuckets rows) → suffix-min over STRICTLY
    *     later buckets (a window over the tiny bucket table only);
    *  3. prefilter: r survives only if r.price < sufmin(bucket+1) — any
    *     strictly-later-bucket point has a strictly later date, so price ≥
    *     that min is certain domination. The prefilter is LOSSLESS for the
    *     remaining check: a dropped s cannot dominate a surviving r in the
    *     same bucket (s dropped ⇒ s.price ≥ sufmin > r.price, but
    *     domination needs s.price ≤ r.price) — so the within-bucket window
    *     in step 4 runs on survivors only, a skyline-band-sized frame, not
    *     the corpus;
    *  4. within-bucket running min of price in (odate DESC, price ASC)
    *     order: every window-preceding point has a strictly later date or
    *     (same date, strictly smaller price) — dominated iff that min ≤
    *     r.price. Partitioned by bucket, so no global sort anywhere.
    * Comparisons only (no FP arithmetic), so the result is engine-exact
    * against the NOT EXISTS dominance statement. */
  def paretoFrontier(spark: SparkSession, dir: String, nBuckets: Int = 64): DataFrame =
    paretoFrontierOn(orders(spark, dir)
      .select(col("o_totalprice").as("price"),
        col("o_orderdate").cast("date").as("odate")), nBuckets)

  /** Core of q149 over an explicit (price, odate) frame — unit-testable
    * with hand point sets (duplicates allowed; the skyline is over the
    * distinct points). */
  def paretoFrontierOn(raw: DataFrame, nBuckets: Int): DataFrame = {
    val pts = raw.select(col("price"), col("odate")).distinct()
      .withColumn("dy", datediff(col("odate"), lit("1995-01-01").cast("date")).cast("long"))
    val bounds = pts.agg(min(col("dy")).as("dlo"), max(col("dy")).as("dhi"))
    val bucketed = pts.crossJoin(broadcast(bounds))
      .select(col("price"), col("odate"),
        expr(s"(dy - dlo) div ((dhi - dlo) div $nBuckets + 1)").as("bk"))
    val sufmin = bucketed.groupBy(col("bk")).agg(min(col("price")).as("bmin"))
      .select(col("bk"),
        min(col("bmin")).over(
          Window.orderBy(col("bk").desc).rowsBetween(Window.unboundedPreceding, -1))
          .as("later_min"))
    val survivors = bucketed.join(broadcast(sufmin), Seq("bk"))
      .filter(col("later_min").isNull || col("price") < col("later_min"))
    val w = Window.partitionBy(col("bk"))
      .orderBy(col("odate").desc, col("price").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    survivors
      .withColumn("mp", min(col("price")).over(w))
      .filter(col("mp").isNull || col("mp") > col("price"))
      .select(col("price"), col("odate"))
  }
}
