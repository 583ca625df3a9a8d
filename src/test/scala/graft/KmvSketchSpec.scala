package graft

import org.apache.spark.sql.functions._
import graft.functions.KmvSketch
import graft.functions.KmvSketch._
import graft.analytics.Accuracy

/** KMV theta sketch (q152/q153): exact-below-k contract, estimation error,
  * set algebra, bitwise merge invariance, SQL registration. */
class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  test("below k distinct the sketch is exact, for counts and intersections") {
    val a = new Kmv(64); val b = new Kmv(64)
    (1L to 40L).foreach(v => a.insert(v * 7919L)) // arbitrary distinct hashes
    (21L to 60L).foreach(v => b.insert(v * 7919L))
    (1L to 40L).foreach(v => a.insert(v * 7919L)) // duplicates must not count
    assert(a.estimate == 40.0 && b.estimate == 40.0)
    val (u, i, j) = Kmv.setEstimates(Kmv.fromBytes(a.toBytes), Kmv.fromBytes(b.toBytes))
    assert(u == 60.0, s"union $u")
    assert(i == 20.0, s"intersection $i")
    assert(math.abs(j - 20.0 / 60.0) < 1e-12, s"jaccard $j")
  }

  test("estimation error within 5 rse at k=1024 on 200k distinct values") {
    val est = spark.range(200000L)
      .agg(kmvSketch(xxhash64(col("id")), 1024).as("sk"))
      .select(kmvEstimate(col("sk"))).as[Double].head()
    val rse = 1.0 / math.sqrt(1022.0)
    assert(math.abs(est - 200000.0) <= 200000.0 * 5 * rse,
      s"estimate $est vs 200000 (5 rse = ${5 * rse})")
  }

  test("serialized sketch is bitwise independent of partitioning and merge order") {
    def bytes(parts: Int): Array[Byte] = spark.range(0, 100000L, 1, parts)
      .agg(kmvSketch(xxhash64(col("id")), 256).as("sk"))
      .select(col("sk")).as[Array[Byte]].head()
    val one = bytes(1)
    assert(java.util.Arrays.equals(one, bytes(7)))
    assert(java.util.Arrays.equals(one, bytes(32)))
  }

  test("union/intersection/jaccard estimates track exact overlap on 3:1 ranges") {
    // A = [0, 120k), B = [60k, 180k): union 180k, intersection 60k, J = 1/3
    val df = spark.range(180000L).select(col("id"),
      (col("id") < 120000L).as("in_a"), (col("id") >= 60000L).as("in_b"))
    val sk = df.agg(
      kmvSketch(when(col("in_a"), xxhash64(col("id"))), 1024).as("ska"),
      kmvSketch(when(col("in_b"), xxhash64(col("id"))), 1024).as("skb"))
    val r = sk.select(
      kmvEstimate(kmvUnion(col("ska"), col("skb"))).as("u"),
      kmvIntersectEstimate(col("ska"), col("skb")).as("i"),
      kmvJaccard(col("ska"), col("skb")).as("j"))
      .as[(Double, Double, Double)].head()
    assert(math.abs(r._1 - 180000.0) <= 180000.0 * 0.16, s"union ${r._1}")
    assert(math.abs(r._2 - 60000.0) <= 60000.0 * 0.20, s"inter ${r._2}")
    assert(math.abs(r._3 - 1.0 / 3.0) <= 0.08, s"jaccard ${r._3}")
  }

  test("null hashes are skipped; empty input yields an empty exact sketch") {
    val sk = spark.range(10L)
      .agg(kmvSketch(when(col("id") < 0, xxhash64(col("id"))), 64).as("sk"))
      .select(kmvEstimate(col("sk"))).as[Double].head()
    assert(sk == 0.0)
  }

  test("SQL surface: kmv functions registered via GraftExtensions") {
    graft.functions.GraftExtensions.register(spark)
    spark.range(50000L).createOrReplaceTempView("kmv_ids")
    val r = spark.sql(
      """SELECT kmv_estimate(kmv_union(a, b)) AS u, kmv_jaccard(a, b) AS j
        |FROM (SELECT kmv_sketch(xxhash64(id), 512) AS a,
        |             kmv_sketch(xxhash64(id + 25000), 512) AS b
        |      FROM kmv_ids)""".stripMargin)
      .as[(Double, Double)].head()
    assert(math.abs(r._1 - 75000.0) <= 75000.0 * 0.25, s"union ${r._1}")
    assert(math.abs(r._2 - 1.0 / 3.0) <= 0.12, s"jaccard ${r._2}")
  }

  test("kmv_merge rollup equals the direct sketch bitwise (q153 contract)") {
    val per = spark.range(100000L)
      .withColumn("g", pmod(col("id"), lit(13)))
      .groupBy(col("g")).agg(kmvSketch(xxhash64(col("id")), 256).as("sk"))
      .agg(kmvMerge(col("sk")).as("rolled"))
    val direct = spark.range(100000L)
      .agg(kmvSketch(xxhash64(col("id")), 256).as("direct"))
    val (a, b) = per.crossJoin(direct)
      .select(col("rolled"), col("direct")).as[(Array[Byte], Array[Byte])].head()
    assert(java.util.Arrays.equals(a, b), "rollup must be bitwise identical")
  }

  test("streaming windowed sketch equals the batch sketch bitwise across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.EventStream
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val in = MemoryStream[EventStream.Event]
    val q = EventStream.windowedUserSketch(in.toDF())
      .writeStream.format("memory").queryName("usersketch").outputMode("append").start()
    try {
      // users 1..30 in hour 10, split across two micro-batches
      in.addData((1 to 18).map(u =>
        EventStream.Event(u.toLong, ts("2024-01-01 10:05:00"), u.toLong, "click", 1.0)): _*)
      q.processAllAvailable()
      in.addData((10 to 30).map(u =>
        EventStream.Event(100 + u.toLong, ts("2024-01-01 10:40:00"), u.toLong, "view", 1.0)): _*)
      q.processAllAvailable()
      in.addData(EventStream.Event(999, ts("2024-01-01 13:00:00"), 999, "click", 1.0))
      q.processAllAvailable()
      val row = spark.table("usersketch")
        .filter(col("hour") === ts("2024-01-01 10:00:00")).collect().head
      assert(row.getAs[Double]("approx_users") == 30.0, row.toString)
      assert(row.getAs[Long]("n_events") == 39L)
      val batch = (1 to 30).map(_.toLong).toDF("user_id")
        .agg(kmvSketch(xxhash64(col("user_id")), 256)).as[Array[Byte]].head()
      assert(java.util.Arrays.equals(row.getAs[Array[Byte]]("sk"), batch),
        "state-store incremental sketch must be bitwise identical to batch")
    } finally q.stop()
  }

  test("q152/q153 gate queries hold at every SF (exact mode at sf0.001, estimation above)") {
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { s =>
      val row = Accuracy.kmvOverlap(spark, sf(s)).collect().head
      Seq("est_r_ok", "est_a_ok", "union_ok", "inter_ok", "jaccard_ok").foreach { c =>
        assert(row.getAs[Boolean](c), s"$s: $c must hold: $row")
      }
      val r2 = Accuracy.kmvRollup(spark, sf(s)).collect().head
      assert(r2.getAs[Boolean]("merge_bitwise_ok") && r2.getAs[Boolean]("est_ok"),
        s"$s: ${r2.toString}")
    }
  }
}
