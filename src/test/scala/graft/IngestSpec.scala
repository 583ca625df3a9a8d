package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ingest.RawListings
import graft.sink.Bucketed

class IngestSpec extends SparkSpec {
  import spark.implicits._

  private lazy val jsonlDir: String = {
    val tmp = Files.createTempDirectory("graft_raw").toString
    val lines = Seq(
      """{"post_date":"2025-04-24","duong_pho":"Lê Lợi","phuong_xa":"Bến Nghé","quan_huyen":"1","thanh_pho":"Hồ Chí Minh","loai_bds":"Nhà đất","area":80.0,"chieu_ngang":"4","chieu_dai":"20","duong_truoc_nha":"12","so_tang":"3","so_phong_ngu":"4","cho_de_xe":"Có","price":1.5,"source":"alonhadat"}""",
      """{"post_date":"2025-04-23","quan_huyen":"Gò Vấp","thanh_pho":"Hồ Chí Minh","price":"Thỏa thuận","source":"alonhadat"}""",
      """{"post_date":"2025-04-23","quan_huyen":"","price":"Không rõ","source":"alonhadat"}""",
      """this is not json at all""",
      """{"post_date":"2025-04-22","quan_huyen":"Tân Bình","price":0.85,"source":"alonhadat"}""")
    Files.writeString(java.nio.file.Paths.get(s"$tmp/data_1.jsonl"), lines.mkString("\n"))
    tmp
  }

  test("S1: explicit-schema JSONL read drops malformed lines, keeps union price as string") {
    val df = RawListings.readJsonl(spark, jsonlDir)
    assert(df.count() == 4) // corrupt line dropped
    assert(df.schema("price").dataType.typeName == "string")
    val kept = RawListings.readJsonl(spark, jsonlDir, dropMalformed = false).cache()
    assert(kept.count() == 5)
    assert(kept.filter($"_corrupt_record".isNotNull).count() == 1)
    kept.unpersist()
  }

  test("S1+normalize: typed listings from the raw zone; reference district count works") {
    val typed = RawListings.typedListings(spark, jsonlDir)
    val statuses = typed.select($"price_status").as[String].collect().sorted.toSeq
    assert(statuses == Seq("negotiable", "ok", "ok", "unknown"))
    val counts = graft.analytics.Views.districtCounts(typed)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("1" -> 1, "Gò Vấp" -> 1, "Tân Bình" -> 1)) // "" filtered
  }

  test("S5: kafka envelope is keyed and JSON-round-trippable") {
    val env = RawListings.toKafkaEnvelope(RawListings.readJsonl(spark, jsonlDir))
    assert(env.columns.toSeq == Seq("key", "value"))
    val rows = env.collect()
    assert(rows.forall(r => r.getString(0) != null && r.getString(0).nonEmpty))
    val back = spark.createDataset(rows.map(_.getString(1)).toSeq)
      .toDF("value")
      .select(graft.streaming.IngestStream.parseWire($"value"))
    assert(graft.streaming.IngestStream.flatten(back).count() == 4)
  }

  test("end-to-end pipeline: raw JSONL → raw zone → batch views") {
    val wh = Files.createTempDirectory("graft_pipe").toString
    val n = graft.Pipeline.run(spark, jsonlDir, wh, "2025-04-24")
    assert(n == 4)
    val counts = spark.read.parquet(s"$wh/district_counts")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("1" -> 1, "Gò Vấp" -> 1, "Tân Bình" -> 1))
    assert(spark.read.parquet(s"$wh/district_price_stats").count() == 2) // districts with ok price
    assert(new java.io.File(s"$wh/listings_raw/ingest_date=2025-04-24").exists())
  }

  test("stream-static enrichment join") {
    implicit val sqlCtx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[graft.streaming.EventStream.Event]
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val q = graft.streaming.EventStream.enriched(in.toDF(), dim)
      .writeStream.format("memory").queryName("enriched_ev").outputMode("append").start()
    try {
      in.addData(
        graft.streaming.EventStream.Event(1, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1, "click", 1.0),
        graft.streaming.EventStream.Event(2, java.sql.Timestamp.valueOf("2024-01-01 10:00:01"), 9, "click", 2.0))
      q.processAllAvailable()
      val rows = spark.table("enriched_ev")
        .collect().map(r => r.getAs[Long]("event_id") -> Option(r.getAs[String]("tier"))).toMap
      assert(rows == Map(1L -> Some("gold"), 2L -> None))
    } finally q.stop()
  }

  test("bucketed tables join with zero exchanges") {
    // disable broadcast so the plan demonstrates bucket co-location (at real
    // scale neither side is broadcastable)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val li = graft.Tables.lineitem(spark, sf("sf0.001")).select($"l_orderkey", $"l_quantity")
    val o = graft.Tables.orders(spark, sf("sf0.001"))
      .select($"o_orderkey".as("l_orderkey"), $"o_totalprice")
    Bucketed.writeBucketed(li, "li_b", "l_orderkey", 8)
    Bucketed.writeBucketed(o, "o_b", "l_orderkey", 8)
    val joined = Bucketed.colocatedJoin(spark, "li_b", "o_b", "l_orderkey")
    assert(joined.count() == li.count()) // every lineitem has its order
    val plan = joined.queryExecution.executedPlan.toString
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
  }
}
