package graft

import org.apache.spark.sql.functions._
import graft.analytics.Relational

/** q126 (ratio-to-report), q127 (order-gap stats), q128 (RFM segmentation),
  * q129 (SCD2 intervals): semantic invariants beyond the oracle hashes. */
class CustomerAnalyticsSpec extends SparkSpec {

  test("q126 revenue share: shares sum to 1 per region and across regions") {
    val rows = Relational.revenueShare(spark, sf("sf0.001")).collect()
    // sf0.001's supplier table covers a subset of the 25 nations
    assert(rows.length >= 5 && rows.length <= 25)
    val byRegion = rows.groupBy(_.getString(0))
    assert(byRegion.size >= 3)
    byRegion.foreach { case (r, ns) =>
      val s = ns.map(_.getDouble(3)).sum
      assert(math.abs(s - 1.0) < 1e-2, s"region $r shares sum to $s")
    }
    val total = rows.map(_.getDouble(4)).sum
    assert(math.abs(total - 1.0) < 1e-2, s"global shares sum to $total")
  }

  test("q127 order gaps: count reconciles with orders minus first-order rows") {
    val d = sf("sf0.001")
    val row = Relational.orderGapStats(spark, d).head()
    val nOrders = Tables.orders(spark, d).count()
    val nCustomers = Tables.orders(spark, d).select(col("o_custkey")).distinct().count()
    assert(row.getLong(0) == nOrders - nCustomers,
      "every order except each customer's first contributes one gap")
    // ordering of the distribution
    assert(row.getDouble(2) <= row.getDouble(3), "p50 <= p90")
    assert(row.getDouble(3) <= row.getInt(4).toDouble, "p90 <= max")
  }

  test("q128 RFM: scores bounded, quintiles balanced, segment rules hold") {
    val rows = Relational.rfmSegments(spark, sf("sf0.001")).collect()
    assert(rows.nonEmpty)
    val n = rows.length
    rows.foreach { r =>
      val (rs, fs, ms, seg) = (r.getInt(4), r.getInt(5), r.getInt(6), r.getString(7))
      assert(rs >= 1 && rs <= 5 && fs >= 1 && fs <= 5 && ms >= 1 && ms <= 5)
      if (seg == "champion") assert(rs >= 4 && fs >= 4 && ms >= 4)
      if (seg == "recent") assert(rs >= 4 && fs <= 2)
    }
    // monetary has few ties → its quintiles must be near-balanced
    val mBuckets = rows.groupBy(_.getInt(6)).map(_._2.size)
    assert(mBuckets.size == 5)
    mBuckets.foreach(b => assert(b > n / 10 && b < 3 * n / 10,
      s"monetary quintile badly unbalanced: $mBuckets"))
  }

  test("q129 SCD2: intervals chain per user, one current version, no repeated state") {
    val rows = Relational.scd2Intervals(spark, sf("sf0.001"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4)))
      .groupBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { case (u, vs) =>
      val sorted = vs.sortBy(_._2)
      // versions are 1..k dense
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq, s"user $u versions")
      // exactly one open interval, and it is the last version
      assert(sorted.count(_._5 == -1L) == 1 && sorted.last._5 == -1L, s"user $u current")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5 == b._4, s"user $u: interval must close at the next valid_from")
          assert(a._3 != b._3, s"user $u: consecutive versions must change state")
        case _ =>
      }
    }
  }

  test("q137 incremental view: signed merge equals direct recompute, zero-count keys drop") {
    val d = sf("sf0.001")
    val merged = Relational.incrementalAgg(spark, d)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(merged.nonEmpty)
    // direct recompute over the updated snapshot, same decimal arithmetic
    // (both sides cast the exact decimal to double at the very edge, the
    // q137 gate contract — equality is still exact because the inputs are
    // the same decimal value)
    val o = Tables.orders(spark, d).select(col("o_orderkey"), col("o_custkey"),
      col("o_totalprice").cast("decimal(18,2)").as("price"))
    val net = o.filter(col("o_orderkey") % 10 =!= 0 && col("o_orderkey") % 13 =!= 0)
      .unionByName(o.filter(col("o_orderkey") % 10 === 0))
    val direct = net.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"),
        sum(col("price")).cast("decimal(38,2)").cast("double").as("s"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(merged == direct, "incremental maintenance must match full recompute exactly")
    merged.values.foreach { case (n, _) => assert(n > 0L, "zero-count keys must drop") }
  }

  test("q149 pareto frontier: hand cases and brute-force dominance cross-check") {
    import spark.implicits._
    import java.sql.Date
    def sky(pts: (Double, String)*): Set[(Double, String)] =
      Relational.paretoFrontierOn(
        pts.map { case (p, d) => (p, Date.valueOf(d)) }.toDF("price", "odate"), 4)
        .collect().map(r => (r.getDouble(0), r.getDate(1).toString)).toSet
    // cheaper-and-later dominates; the latest point always survives
    assert(sky((10.0, "1995-01-10"), (5.0, "1995-06-01"), (20.0, "1996-01-01")) ==
      Set((5.0, "1995-06-01"), (20.0, "1996-01-01")))
    // same price, later date dominates; duplicates collapse to one point
    assert(sky((5.0, "1995-02-01"), (5.0, "1995-03-01"), (5.0, "1995-03-01")) ==
      Set((5.0, "1995-03-01")))
    // same date, cheaper dominates
    assert(sky((5.0, "1995-02-01"), (7.0, "1995-02-01")) == Set((5.0, "1995-02-01")))
    // brute-force cross-check on a deterministic 200-point cloud
    val cloud = (1 to 200).map { i =>
      val p = (i * 37 % 101 + 1).toDouble
      val day = i * 53 % 365 + 1
      (p, f"1995-01-01".substring(0, 4) + "-" +
        f"${(day - 1) / 31 + 1}%02d-" + f"${(day - 1) % 28 + 1}%02d")
    }
    val pts = cloud.distinct
    val brute = pts.filter { case (p, d) =>
      !pts.exists { case (p2, d2) =>
        p2 <= p && d2 >= d && (p2 < p || d2 > d)
      }
    }.toSet
    assert(sky(cloud: _*) == brute)
  }
}
