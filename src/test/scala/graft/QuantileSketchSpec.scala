package graft

import org.apache.spark.sql.functions._
import graft.functions.QuantileSketch
import graft.functions.QuantileSketch.MrlSketch

/** The custom mergeable MRL quantile aggregate (q102): exactness below the
  * buffer size, the deterministic worst-case rank bound under hostile merge
  * orders, serialization round-trip, and layout invariance of the gated
  * booleans. */
class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private def rankErr(values: IndexedSeq[Double], est: Double, p: Double): Double = {
    val rank = values.count(_ <= est).toDouble / values.size
    math.abs(rank - p)
  }

  test("below k the sketch is the exact order statistic") {
    val sk = new MrlSketch(64)
    val vs = (1 to 50).map(_.toDouble).reverse
    vs.foreach(sk.insert)
    assert(sk.quantile(0.5) == 25.0, s"ceil(0.5*50)=25th smallest, got ${sk.quantile(0.5)}")
    assert(sk.quantile(0.02) == 1.0)
    assert(sk.quantile(0.99) == 50.0)
  }

  test("rank bound holds across promotions and hostile merge orders") {
    val n = 20000
    val k = 256 // small k to force many collapses
    val values = (0 until n).map(i => ((i * 2654435761L) % 1000003L).toDouble)
    // single-stream insert
    val one = new MrlSketch(k)
    values.foreach(one.insert)
    // 7-way split, merged smallest-into-largest then pairwise — a merge
    // order Spark would never produce, to stress associativity
    val parts = values.grouped(n / 7 + 1).map { chunk =>
      val s = new MrlSketch(k); chunk.foreach(s.insert); s
    }.toList
    val merged = parts.reduceRight { (a, b) => b.mergeWith(a); b }
    val sorted = values.sorted
    for (sk <- Seq(one, merged); p <- Seq(0.01, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      assert(sk.n == n)
      val err = rankErr(sorted, sk.quantile(p), p)
      // theory: L·n/2k with L=log2(n/k)≈6 → ~1.2%; assert the gate's 2%
      assert(err <= 0.02, s"p=$p err=$err")
    }
  }

  test("serialization round-trips the buffer exactly") {
    val sk = new MrlSketch(128)
    (1 to 5000).foreach(i => sk.insert((i * 7919 % 4231).toDouble))
    val back = MrlSketch.fromBytes(sk.toBytes)
    assert(back.n == sk.n)
    for (p <- Seq(0.1, 0.5, 0.9))
      assert(back.quantile(p) == sk.quantile(p), s"round-trip changed p=$p")
  }

  test("q102: booleans stable under repartitioning; estimates track exact") {
    val d = sf("sf0.001")
    val base = graft.Tables.orders(spark, d)
      .select(col("o_orderstatus"), col("o_totalprice"))
    for (parts <- Seq(1, 7, 32)) {
      val sk = base.repartition(parts).groupBy(col("o_orderstatus")).agg(
        QuantileSketch.quantileSketch(col("o_totalprice"), Seq(0.5, 0.9)).as("qs"))
      val joined = base.join(broadcast(sk), "o_orderstatus")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          (sum(when(col("o_totalprice") <= col("qs")(0), 1L).otherwise(0L))
            .cast("double") / count(lit(1))).as("r50"),
          (sum(when(col("o_totalprice") <= col("qs")(1), 1L).otherwise(0L))
            .cast("double") / count(lit(1))).as("r90"))
      val bad = joined.filter(
        abs(col("r50") - 0.5) > lit(0.02) + lit(2.0) / col("n") ||
        abs(col("r90") - 0.9) > lit(0.02) + lit(2.0) / col("n"))
      assert(bad.count() == 0, s"rank bound violated at $parts partitions")
    }
  }

  test("SQL registration: graft_quantile_sketch callable from spark.sql") {
    graft.functions.GraftExtensions.register(spark)
    Seq(1.0, 2.0, 3.0, 4.0, 5.0).toDF("v").createOrReplaceTempView("qs_vals")
    val arr = spark.sql(
      "SELECT graft_quantile_sketch(v, array(0.5D, 0.8D)) AS qs FROM qs_vals")
      .collect()(0).getSeq[Double](0)
    assert(arr == Seq(3.0, 4.0), s"got $arr")
    // scalar percentile literal (parses as decimal) also accepted
    val one = spark.sql(
      "SELECT graft_quantile_sketch(v, 0.5) AS qs FROM qs_vals")
      .collect()(0).getSeq[Double](0)
    assert(one == Seq(3.0))
  }

  test("empty group evaluates to null, null inputs are skipped") {
    val df = Seq[(String, Option[Double])](
      ("a", Some(1.0)), ("a", None), ("a", Some(3.0))
    ).toDF("g", "v")
    val r = df.groupBy($"g").agg(
        QuantileSketch.quantileSketch($"v", Seq(0.5)).as("qs"))
      .select($"qs"(0)).collect()(0).getDouble(0)
    assert(r == 1.0, s"median of {1,3} at ceil(0.5*2)=1st smallest: got $r")
    val empty = df.filter($"v" > 100).agg(
      QuantileSketch.quantileSketch($"v", Seq(0.5)).as("qs")).collect()(0)
    assert(empty.isNullAt(0), "empty group must yield null")
  }
}
