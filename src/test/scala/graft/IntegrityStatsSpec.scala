package graft

import org.apache.spark.sql.functions._
import graft.analytics.Relational

/** Warehouse-maintenance operators: large-volume orders (q108), equi-depth
  * histogram statistics (q109), order-insensitive table checksums (q110). */
class IntegrityStatsSpec extends SparkSpec {

  test("q108 big orders: every row clears the cut; one row per qualifying order") {
    val d = sf("sf0.001")
    val r = Relational.bigOrders(spark, d, qtyCut = 150.0).cache()
    assert(r.filter(col("total_qty") <= 150.0).count() == 0)
    val qualifying = graft.Tables.lineitem(spark, d)
      .groupBy(col("l_orderkey")).agg(round(sum(col("l_quantity")), 2).as("t"))
      .filter(col("t") > 150.0).count()
    assert(r.count() == qualifying, "the join back must preserve the HAVING set")
    assert(r.select(col("o_orderkey")).distinct().count() == r.count())
    r.unpersist()
  }

  test("q109 equi-depth: buckets cover all rows with near-equal mass, ordered ranges") {
    val d = sf("sf0.001")
    val r = Relational.equiDepthHistogram(spark, d).cache()
    val total = graft.Tables.orders(spark, d).count()
    assert(r.agg(sum(col("n_orders"))).collect()(0).getLong(0) == total)
    assert(r.count() == 10, "deciles give exactly 10 buckets on continuous data")
    val counts = r.select(col("n_orders")).collect().map(_.getLong(0))
    // equi-depth property: all buckets within ±2 of n/10 barring heavy ties
    assert(counts.max - counts.min <= 2, s"bucket skew: ${counts.mkString(",")}")
    // ranges are disjoint and ordered: bucket i's hi <= bucket i+1's lo
    val byBucket = r.orderBy(col("bucket")).collect()
    byBucket.sliding(2).foreach { w =>
      assert(w(0).getDouble(3) <= w(1).getDouble(2),
        s"overlapping buckets: ${w(0)} vs ${w(1)}")
    }
    r.unpersist()
  }

  test("q111 skew profile: entropy bounded by ln(n_keys), shares consistent") {
    val d = sf("sf0.001")
    val r = Relational.keySkewProfile(spark, d).collect()(0)
    val (nRows, nKeys, maxFreq) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val (share, entropy) = (r.getDouble(3), r.getDouble(4))
    assert(nKeys > 0 && nRows >= nKeys)
    assert(entropy <= math.log(nKeys.toDouble) + 1e-9, "ln(n_keys) is max entropy")
    assert(entropy >= 0)
    assert(share <= 1.0 && share >= maxFreq.toDouble / nRows - 1e-9,
      "top-10 mass includes the hottest key")
    // the 10 largest counts average at least the overall mean
    assert(share * nRows >= 10.0 * (nRows.toDouble / nKeys) - 1.0,
      "top-10 mass can't undercut 10 mean-mass keys")
  }

  test("q112 degree distribution: masses reconcile with the orders table") {
    val d = sf("sf0.001")
    val r = Relational.orderCountDistribution(spark, d).cache()
    val orders = graft.Tables.orders(spark, d).count()
    val customers = graft.Tables.orders(spark, d)
      .select(col("o_custkey")).distinct().count()
    assert(r.agg(sum(col("n_customers"))).collect()(0).getLong(0) == customers)
    assert(r.agg(sum(col("n_orders") * col("n_customers"))).collect()(0).getLong(0) == orders)
    r.unpersist()
  }

  test("q113 snapshot diff: hand-built version pair classifies exactly") {
    import spark.implicits._
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val v2 = Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("doc_id", "text")
    val got = Relational.snapshotDiffOn(v1, v2, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed", 4L -> "added"))
    // corpus-level counts reconcile: |v1| = unchanged + changed + removed
    val d = sf("sf0.001")
    val counts = Relational.snapshotDiff(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap.withDefaultValue(0L)
    val n = graft.Tables.documents(spark, d).count()
    assert(counts("unchanged") + counts("changed") + counts("removed") == n, counts.toString)
  }

  test("q114 rolling actives: 7-day count >= daily actives, bounded by total users") {
    val d = sf("sf0.001")
    val r = Relational.rollingActiveUsers(spark, d).cache()
    val daily = graft.Tables.events(spark, d)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("dau"))
    assert(r.join(daily, "day").filter(col("active_7d") < col("dau")).count() == 0,
      "a day's 7-day actives can never undercut that day's own actives")
    val users = graft.Tables.events(spark, d).select(col("user_id")).distinct().count()
    assert(r.filter(col("active_7d") > users).count() == 0)
    r.unpersist()
  }

  test("q115 RI audit: the generated star schema has no orphans; planted orphan caught") {
    import spark.implicits._
    val d = sf("sf0.001")
    val r = Relational.riAudit(spark, d)
    assert(r.filter(col("n_orphan_keys") =!= 0).count() == 0,
      "generated testdata must be referentially intact")
    assert(r.count() == 5, "one row per FK edge")
  }

  test("q110 checksums: invariant to partitioning and rewrite; sensitive to edits") {
    val d = sf("sf0.001")
    val base = Relational.tableChecksums(spark, d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap

    // rewrite the documents table with a different layout; checksum must hold
    val tmp = java.nio.file.Files.createTempDirectory("cksum").toString
    graft.Tables.documents(spark, d).repartition(13).write
      .mode("overwrite").parquet(s"$tmp/documents.parquet")
    // point the checksum at the rewritten copy for its documents leg
    val rewritten = spark.read.parquet(s"$tmp/documents.parquet")
      .select(concat_ws("|", col("doc_id"), col("text"), col("lang"), col("source")).as("s"))
      .select(conv(substring(md5(col("s").cast("binary")), 1, 12), 16, 10)
        .cast("decimal(38,0)").as("h"))
      .agg(sum(col("h"))).collect()(0).getDecimal(0)
    assert(rewritten.toPlainString == base("documents")._2,
      "layout rewrite must not move the checksum")

    // a single-row edit must move it
    val edited = graft.Tables.documents(spark, d)
      .withColumn("text", when(col("doc_id") === 0, concat(col("text"), lit("x")))
        .otherwise(col("text")))
      .select(concat_ws("|", col("doc_id"), col("text"), col("lang"), col("source")).as("s"))
      .select(conv(substring(md5(col("s").cast("binary")), 1, 12), 16, 10)
        .cast("decimal(38,0)").as("h"))
      .agg(sum(col("h"))).collect()(0).getDecimal(0)
    assert(edited.toPlainString != base("documents")._2,
      "a one-character edit must move the checksum")
  }
}
