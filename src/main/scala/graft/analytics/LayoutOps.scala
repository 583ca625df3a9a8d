package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.{customer, documents, lineitem, orders}
import graft.functions.SkewJoin
import graft.sink.{Bucketed, Compaction}

/** Physical-layout-aware operators under the correctness gate: salted skew
  * joins, bucketed co-located joins, partition-pruned scans, deterministic
  * sampling, and raw-zone compaction — each produces an oracle-checkable
  * result, so the layout trick is verified to not change answers.
  */
object LayoutOps {

  /** q43: join on a MAXIMALLY skewed key — `l_returnflag` has 3 distinct
    * values over the whole fact table, so a plain shuffle join lands ~33% of
    * 100 TB on single reducers. `SkewJoin.saltedJoin` spreads each hot key
    * over 16 salts via a deterministic hash of the line's order key; the
    * 3-row aggregate dimension is replicated 16×. Result (rows priced above
    * their flag's average) is identical to the unsalted join — that identity
    * IS the oracle check. */
  def saltedFlagJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_extendedprice"))
    val dim = li.groupBy(col("l_returnflag"))
      .agg(avg(col("l_extendedprice")).as("avg_price"))
    SkewJoin.saltedJoin(li, dim, "l_returnflag", "l_orderkey", salts = 16)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        sum(when(col("l_extendedprice") > col("avg_price"), 1L).otherwise(0L)).as("n_above_avg"))
  }

  /** q44: co-located fact⋈dim join over bucketed tables — both sides written
    * `bucketBy(8, key)` + `sortBy(key)`, so the sort-merge join consumes the
    * bucket layout directly: ZERO shuffle exchange on either join input
    * (asserted in PlanShapeSpec). At warehouse scale this converts the
    * dominant recurring shuffle into a one-time layout cost at ingest. */
  def bucketedCustomerOrders(spark: SparkSession, dir: String): DataFrame = {
    Bucketed.writeBucketed(
      orders(spark, dir).select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")),
      "graft_bkt_orders", "o_custkey", buckets = 8)
    Bucketed.writeBucketed(
      customer(spark, dir).select(col("c_custkey"), col("c_mktsegment")),
      "graft_bkt_customer", "c_custkey", buckets = 8)
    bucketedJoinPlan(spark)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("sum_price"))
  }

  /** The raw co-located join (pre-aggregation) — split out so PlanShapeSpec
    * can assert the exchange-free shape of the join itself. */
  def bucketedJoinPlan(spark: SparkSession): DataFrame =
    spark.table("graft_bkt_orders").hint("merge")
      .join(spark.table("graft_bkt_customer"),
        col("o_custkey") === col("c_custkey"))

  /** q45: partition pruning demonstrated end-to-end: the orders table is
    * written `partitionBy(o_year)` (the raw-zone date layout, reference
    * analogue: the date-glob read at spark_jobs/count_by_district.py:13),
    * then ONE year is read back — the scan must show PartitionFilters and
    * touch only that year's directory (asserted in PlanShapeSpec). */
  def prunedOrdersByYear(spark: SparkSession, dir: String, yr: Int = 1995): DataFrame = {
    val path = partitionedOrdersPath
    orders(spark, dir)
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(path)
    prunedScan(spark, yr)
      .groupBy(col("o_year"), month(col("o_orderdate")).as("mo"))
      .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("sum_price"))
  }

  def partitionedOrdersPath: String =
    new java.io.File("target/graft_pzone/orders").getAbsolutePath

  /** The pruned scan itself (pre-aggregation) for plan assertions. */
  def prunedScan(spark: SparkSession, yr: Int): DataFrame =
    spark.read.parquet(partitionedOrdersPath).filter(col("o_year") === yr)

  /** q46: deterministic 10% content sample — membership is a pure function
    * of the text's md5 (Sampling.contentBucket), so the sample is stable
    * under repartitioning, appends, and cluster layout. What `df.sample`'s
    * per-partition RNG cannot give, and exactly what a reproducible training
    * subset needs. */
  def contentSample(spark: SparkSession, dir: String, pct: Int = 10): DataFrame =
    Sampling.deterministicSample(documents(spark, dir), "text", pct)
      .select(col("doc_id"), Sampling.contentBucket(col("text")).as("bucket"))

  /** q47: raw-zone compaction under the gate. Two overlapping crawls of the
    * document corpus (the reference's deliberate page-overlap re-crawl,
    * crawler/alonhadat.py:49,71-72): crawl 1 sees every doc, crawl 2
    * re-fetches the even half a day later. Compaction keeps exactly one —
    * the newest — version per identity. */
  def compactedCrawls(spark: SparkSession, dir: String): DataFrame = {
    val d = documents(spark, dir).select(col("doc_id"), col("text"))
    val zone = d.withColumn("ingest_date", lit("2025-04-23"))
      .unionByName(d.filter(col("doc_id") % 2 === 0)
        .withColumn("ingest_date", lit("2025-04-24")))
    Compaction.compact(zone, col("doc_id"), col("ingest_date"))
      .select(col("doc_id"), col("ingest_date"),
        length(col("text")).cast("bigint").as("n_chars"))
  }
}
