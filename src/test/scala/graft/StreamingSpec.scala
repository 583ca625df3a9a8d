package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{EventStream, IngestStream, ViewMaintenance}

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowed hourly counts over a MemoryStream, watermark drops late rows") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[EventStream.Event]
    val q = EventStream.hourlyCounts(in.toDF())
      .writeStream.format("memory").queryName("hourly").outputMode("append").start()
    try {
      in.addData(
        EventStream.Event(1, ts("2024-01-01 10:05:00"), 1, "click", 1.0),
        EventStream.Event(2, ts("2024-01-01 10:55:00"), 1, "click", 2.0),
        EventStream.Event(3, ts("2024-01-01 11:05:00"), 2, "view", 3.0))
      q.processAllAvailable()
      // advance watermark far enough to close the 10:00 and 11:00 windows
      in.addData(EventStream.Event(4, ts("2024-01-01 13:00:00"), 1, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("hourly")
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSet
      assert(rows.contains(("2024-01-01 10:00:00.0", "click", 2L)))
      assert(rows.contains(("2024-01-01 11:00:00.0", "view", 1L)))
    } finally q.stop()
  }

  test("stateful sessionization emits closed sessions") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[EventStream.Event]
    // NoTimeout here: with ProcessingTimeTimeout the engine keeps scheduling
    // timeout-check batches and processAllAvailable never quiesces.
    val q = EventStream.sessionize(in.toDS(),
        timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    try {
      in.addData(
        EventStream.Event(1, ts("2024-01-01 10:00:00"), 7, "click", 1.0),
        EventStream.Event(2, ts("2024-01-01 10:10:00"), 7, "click", 2.0),
        // 40-min gap closes the first session
        EventStream.Event(3, ts("2024-01-01 10:50:00"), 7, "view", 5.0))
      q.processAllAvailable()
      val rows = spark.table("sessions")
        .collect().map(r => (r.getLong(0), r.getLong(3), r.getDouble(4))).toSet
      assert(rows == Set((7L, 2L, 3.0))) // first session: 2 events, sum 3.0
    } finally q.stop()
  }

  test("streaming near-dup: cross-batch duplicate alerts, bounded bucket state") {
    import graft.streaming.DedupStream
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[DedupStream.DocArrival]
    val q = DedupStream.nearDupAlerts(in.toDS(),
        timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
      .writeStream.format("memory").queryName("dup_alerts").outputMode("append").start()
    try {
      val textA = "the quick brown fox jumps over the lazy dog again and again today"
      val textB = "completely different content about stream processing state machines"
      in.addData(
        DedupStream.DocArrival(1L, textA),
        DedupStream.DocArrival(2L, textB))
      q.processAllAvailable()
      assert(spark.table("dup_alerts").count() == 0,
        "unrelated docs must not alert")
      // a later micro-batch delivers an exact copy of doc 1: identical
      // shingles -> identical signature -> same bucket in EVERY band
      in.addData(DedupStream.DocArrival(3L, textA))
      q.processAllAvailable()
      val alerts = spark.table("dup_alerts")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(alerts == Set((3L, 1L)),
        s"the copy must alert against its prior, and only that pair: $alerts")
      // and the alert fires from every band (16 identical-bucket collisions)
      assert(spark.table("dup_alerts").count() == 16)
    } finally q.stop()
  }

  test("streaming near-dup: overflow docs alert against retained priors but are not retained") {
    import graft.streaming.DedupStream
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[DedupStream.DocArrival]
    val q = DedupStream.nearDupAlerts(in.toDS(), capPerBucket = 2,
        timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
      .writeStream.format("memory").queryName("dup_cap").outputMode("append").start()
    try {
      val text = "one identical crawl page body repeated across many arrivals today ok"
      (1L to 4L).foreach { i =>
        in.addData(DedupStream.DocArrival(i, text))
        q.processAllAvailable()
      }
      val pairs = spark.table("dup_cap")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // docs 3 and 4 overflow the cap: they alert against the two retained
      // priors only, and doc 4 never alerts against un-retained doc 3 —
      // per-bucket state is genuinely bounded at capPerBucket ids
      assert(pairs == Set((2L, 1L), (3L, 1L), (3L, 2L), (4L, 1L), (4L, 2L)), pairs.toString)
    } finally q.stop()
  }

  test("streaming drift: per-label centroid state accumulates exactly across batches") {
    import graft.streaming.DriftStream
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[DriftStream.VecArrival]
    val q = DriftStream.centroidDrift(in.toDS(),
        timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
      .writeStream.format("memory").queryName("drift").outputMode("update").start()
    try {
      def latest(): Map[String, (Long, Double)] = spark.table("drift")
        .collect().map(r => (r.getString(0), (r.getLong(1), r.getDouble(2))))
        .groupBy(_._1).map { case (l, rows) => l -> rows.map(_._2).maxBy(_._1) }
      in.addData(
        DriftStream.VecArrival("a", Seq(0.6, 0.8)),
        DriftStream.VecArrival("b", Seq(1.0, 0.0)))
      q.processAllAvailable()
      assert(latest() == Map("a" -> ((1L, 1.0)), "b" -> ((1L, 1.0))))
      // same direction keeps the norm; opposite vectors cancel to 0 —
      // state carries EXACT micro-unit sums across the batch boundary
      in.addData(
        DriftStream.VecArrival("a", Seq(0.6, 0.8)),
        DriftStream.VecArrival("b", Seq(-1.0, 0.0)))
      q.processAllAvailable()
      assert(latest() == Map("a" -> ((2L, 1.0)), "b" -> ((2L, 0.0))))
    } finally q.stop()
  }

  test("late cross-batch events are dropped, never extend a session backwards") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[EventStream.Event]
    val q = EventStream.sessionize(in.toDS(),
        timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
      .writeStream.format("memory").queryName("late_sessions").outputMode("append").start()
    try {
      in.addData(
        EventStream.Event(1, ts("2024-01-01 10:00:00"), 9, "click", 1.0),
        EventStream.Event(2, ts("2024-01-01 10:10:00"), 9, "click", 2.0))
      q.processAllAvailable()
      // a later micro-batch delivers an event with EARLIER event-time than
      // the state frontier (10:10): the watermark-mirror guard must drop it
      // (unguarded, its negative gap would extend the session and regress
      // `last`, corrupting the eventual session row)
      in.addData(EventStream.Event(3, ts("2024-01-01 09:00:00"), 9, "view", 100.0))
      q.processAllAvailable()
      // 40-min gap from the TRUE frontier closes the session
      in.addData(EventStream.Event(4, ts("2024-01-01 10:50:00"), 9, "view", 5.0))
      q.processAllAvailable()
      val rows = spark.table("late_sessions")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getDouble(4))).toSet
      // the closed session is exactly the two on-time events — the late
      // straggler contributed nothing and the interval never regressed
      val s = ts("2024-01-01 10:00:00").getTime / 1000
      val e = ts("2024-01-01 10:10:00").getTime / 1000
      assert(rows == Set((9L, s, e, 2L, 3.0)), rows)
    } finally q.stop()
  }

  test("SCD2 stream drops change events older than the open version") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[EventStream.Event]
    val q = EventStream.scd2Stream(in.toDS())
      .writeStream.format("memory").queryName("late_scd2").outputMode("append").start()
    try {
      in.addData(EventStream.Event(1, ts("2024-01-01 12:00:00"), 5, "view", 0))
      q.processAllAvailable()
      // late change: would close version 1 with valid_to 11:00 < valid_from
      in.addData(EventStream.Event(2, ts("2024-01-01 11:00:00"), 5, "click", 0))
      q.processAllAvailable()
      in.addData(EventStream.Event(3, ts("2024-01-01 13:00:00"), 5, "click", 0))
      q.processAllAvailable()
      val rows = spark.table("late_scd2")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getLong(3), r.getLong(4))).toList
      rows.foreach { case (_, _, _, from, to) =>
        assert(to >= from, s"interval must never be negative: $rows") }
      // exactly one closed version: view from 12:00 to the ON-TIME click
      assert(rows == List((5L, 1L, "view",
        ts("2024-01-01 12:00:00").getTime / 1000,
        ts("2024-01-01 13:00:00").getTime / 1000)), rows)
    } finally q.stop()
  }

  test("raw-zone streaming sink: partitioned parquet, no duplicates on restart") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_rawzone").toString
    val ckpt = s"$dir/_checkpoint"
    val out = s"$dir/data"
    val in = MemoryStream[String]
    val parsed = IngestStream.flatten(in.toDF().select(IngestStream.parseWire(col("value"))))

    def runOnce(): Unit = {
      val q = IngestStream.toRawZone(parsed, out, ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    in.addData(
      """{"post_date":"2025-04-24","quan_huyen":"Gò Vấp","price":"1.5","source":"alonhadat"}""",
      """{"post_date":"2025-04-24","quan_huyen":"Q3","price":"2.0","source":"alonhadat"}""")
    runOnce()
    val first = spark.read.parquet(out)
    assert(first.count() == 2)
    assert(first.columns.contains("ingest_date"))
    // restart from the same checkpoint with no new data → nothing re-written
    runOnce()
    assert(spark.read.parquet(out).count() == 2)
    // new data lands incrementally
    in.addData("""{"post_date":"2025-04-25","quan_huyen":"Q5","price":"3.0","source":"alonhadat"}""")
    runOnce()
    assert(spark.read.parquet(out).count() == 3)
  }

  test("corpus quality filter runs unchanged on a stream (filter-at-ingest)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // the q65/q66 operators are pure per-row columns, so the SAME code path
    // filters documents at ingest time — no batch/stream fork to maintain
    val in = MemoryStream[(Long, String)]
    val docs = in.toDF().toDF("doc_id", "text")
    val goodText = "the and " +
      (1 to 58).map(i => s"segment$i").mkString(" ") // 60 toks, distinct bigrams, 2 stopwords
    val loopText = ("spam ham " * 40).trim                                       // repetition + no stopwords
    in.addData((1L, goodText), (2L, loopText), (3L, "too short"))
    val q = graft.analytics.TextStats.gopherFilterOn(docs)
      .writeStream.format("memory").queryName("gopher_stream")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("gopher_stream").collect()
      .map(r => r.getLong(0) -> r.getAs[Boolean]("pass")).toMap
    assert(got(1L), "stopword-rich long doc must pass")
    assert(!got(2L), "looping doc must fail")
    assert(!got(3L), "short doc must fail")
    // batch/stream parity: identical rows from the batch path on the same data
    val batch = graft.analytics.TextStats.gopherFilterOn(
      Seq((1L, goodText), (2L, loopText), (3L, "too short")).toDF("doc_id", "text"))
    assert(batch.collect().toSet == spark.table("gopher_stream").collect().toSet)
    spark.sql("DROP TABLE IF EXISTS gopher_stream")
  }

  test("stream-stream join: purchases matched to prior-hour clicks, state bounded") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[EventStream.Event]
    val q = EventStream.purchasesWithRecentClicks(in.toDF())
      .writeStream.format("memory").queryName("ssj").outputMode("append").start()
    try {
      in.addData(
        EventStream.Event(1, ts("2024-01-01 09:30:00"), 1, "click", 0.0),    // within 1h
        EventStream.Event(2, ts("2024-01-01 08:00:00"), 1, "click", 0.0),    // too old
        EventStream.Event(3, ts("2024-01-01 10:00:00"), 1, "purchase", 9.0),
        EventStream.Event(4, ts("2024-01-01 10:00:00"), 2, "purchase", 5.0)) // no clicks
      q.processAllAvailable()
      // advance both watermarks so results finalize
      in.addData(
        EventStream.Event(5, ts("2024-01-01 13:00:00"), 3, "click", 0.0),
        EventStream.Event(6, ts("2024-01-01 13:00:00"), 3, "purchase", 1.0))
      q.processAllAvailable()
      val rows = spark.table("ssj")
        .collect().map(r => (r.getAs[Long]("purchase_id"), r.getAs[Long]("click_id"))).toSet
      assert(rows.contains((3L, 1L)))    // in-window click joined
      assert(!rows.contains((3L, 2L)))   // out-of-window click excluded
      assert(!rows.exists(_._1 == 4L))   // inner join: no clicks → no row
    } finally q.stop()
  }

  test("per-trigger cap bounds each micro-batch (T1 count-cap analog via maxFilesPerTrigger)") {
    // The reference flushes at 100 records OR 60 s; the engine maps the
    // count cap to a per-trigger source limit (maxOffsetsPerTrigger on
    // Kafka — untestable here, no connector jar). The FILE source's
    // maxFilesPerTrigger is the same per-trigger-cap mechanism, so this
    // pins the semantics: N capped inputs → N micro-batches, not one.
    val dir = java.nio.file.Files.createTempDirectory("graft_trigger").toString
    val src = new java.io.File(dir, "in"); src.mkdirs()
    for (i <- 1 to 3)
      java.nio.file.Files.writeString(src.toPath.resolve(s"f$i.json"),
        s"""{"post_date":"2025-04-2$i","quan_huyen":"Q$i","price":"$i.0","source":"alonhadat"}""")
    val stream = spark.readStream
      .schema(graft.model.Listing.RawSchema)
      .option("maxFilesPerTrigger", 1)
      .json(src.getAbsolutePath)
    val q = stream.writeStream.format("memory").queryName("trigger_cap")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(spark.table("trigger_cap").count() == 3)
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(batches.length == 3,
      s"expected 3 capped micro-batches, got rows per batch: ${batches.map(_.numInputRows).mkString(",")}")
    batches.foreach(p => assert(p.numInputRows == 1))
  }

  test("streaming dedup: duplicate ids across micro-batches collapse; state is watermark-bounded") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[EventStream.Event]
    val q = EventStream.dedupedEvents(in.toDF())
      .writeStream.format("memory").queryName("dedup_stream").outputMode("append").start()
    try {
      in.addData(
        EventStream.Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        EventStream.Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0)) // same-batch dupe
      q.processAllAvailable()
      in.addData(
        EventStream.Event(1, ts("2024-01-01 10:01:00"), 1, "click", 1.0), // cross-batch dupe (in watermark)
        EventStream.Event(2, ts("2024-01-01 10:02:00"), 1, "view", 2.0))
      q.processAllAvailable()
      val ids = spark.table("dedup_stream").collect().map(_.getAs[Long]("event_id")).toSeq
      assert(ids.sorted == Seq(1L, 2L), s"duplicates must collapse, got $ids")
    } finally q.stop()
  }

  test("source registry: one independent query per source, isolated sinks and checkpoints") {
    import graft.streaming.SourceRegistry
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_fanout").toString
    val inA = MemoryStream[String]
    val inB = MemoryStream[String]
    val streams = Map("alonhadat" -> inA, "siteb" -> inB)
    val sources = Map(
      "alonhadat" -> SourceRegistry.defaultSources("alonhadat"),
      "siteb" -> SourceRegistry.SourceSpec("listings.siteb", graft.model.Listing.RawSchema,
        df => IngestStream.flatten(df.select(IngestStream.parseWire(col("value"))))))
    inA.addData("""{"post_date":"2025-04-24","quan_huyen":"Gò Vấp","price":"1.5","source":"alonhadat"}""")
    inB.addData(
      """{"post_date":"2025-04-24","quan_huyen":"Q7","price":"2.5","source":"siteb"}""",
      """{"post_date":"2025-04-25","quan_huyen":"Q9","price":"3.5","source":"siteb"}""")
    val qs = SourceRegistry.startAll(spark, sources,
      (name, _) => streams(name).toDF(), s"$root/sink", s"$root/ckpt")
    try {
      assert(qs.keySet == Set("alonhadat", "siteb"))
      assert(qs.values.map(_.id).toSet.size == 2, "two INDEPENDENT queries")
      qs.values.foreach(_.processAllAvailable())
      assert(spark.read.parquet(s"$root/sink/alonhadat").count() == 1)
      assert(spark.read.parquet(s"$root/sink/siteb").count() == 2)
      // independent checkpoints exist per source
      assert(new java.io.File(s"$root/ckpt/alonhadat").exists())
      assert(new java.io.File(s"$root/ckpt/siteb").exists())
      // late data on ONE source lands without touching the other's sink
      inA.addData("""{"post_date":"2025-04-26","quan_huyen":"Q1","price":"9.9","source":"alonhadat"}""")
      qs("alonhadat").processAllAvailable()
      assert(spark.read.parquet(s"$root/sink/alonhadat").count() == 2)
      assert(spark.read.parquet(s"$root/sink/siteb").count() == 2)
    } finally qs.values.foreach(_.stop())
  }

  test("compaction keeps only the latest version per listing identity") {
    val v1 = Seq(
      ("Gò Vấp", "P5", "Lê Lợi", java.sql.Date.valueOf("2025-04-20"), 80.0, 1.5),
      ("Q3", "P1", "Huế", java.sql.Date.valueOf("2025-04-21"), 60.0, 2.0))
      .toDF("quan_huyen", "phuong_xa", "duong_pho", "post_date", "area", "price_billion_vnd")
      .withColumn("ingest_date", lit(java.sql.Date.valueOf("2025-04-22")))
    // re-crawl: same listing 1 with updated price, later ingest date
    val v2 = Seq(("Gò Vấp", "P5", "Lê Lợi", java.sql.Date.valueOf("2025-04-20"), 80.0, 1.6))
      .toDF("quan_huyen", "phuong_xa", "duong_pho", "post_date", "area", "price_billion_vnd")
      .withColumn("ingest_date", lit(java.sql.Date.valueOf("2025-04-23")))
    val compacted = graft.sink.Compaction.compactListings(v1.unionByName(v2))
    assert(compacted.count() == 2)
    val price = compacted.filter($"quan_huyen" === "Gò Vấp")
      .head().getAs[Double]("price_billion_vnd")
    assert(price == 1.6) // latest version won
  }

  test("wire parse: permissive from_json over the raw listing schema") {
    val json = Seq(
      """{"post_date":"2025-04-24","quan_huyen":"Gò Vấp","price":"1.5","area":80.5,"source":"alonhadat"}""",
      """{"post_date":"2025-04-24","quan_huyen":"Q3","price":"Thỏa thuận","source":"alonhadat"}""",
      "not json at all").toDF("value")
    val parsed = IngestStream.flatten(json.select(IngestStream.parseWire(col("value"))))
    val rows = parsed.collect()
    assert(rows.length == 2) // malformed line dropped via _corrupt_record marker
    val typed = graft.ingest.Normalize.fromWire(parsed)
    val byDistrict = typed.collect().map(r =>
      r.getAs[String]("quan_huyen") -> r.getAs[String]("price_status")).toMap
    assert(byDistrict == Map("Gò Vấp" -> "ok", "Q3" -> "negotiable"))
  }

  test("streaming session funnel: stage order enforced, cross-session conversion rejected") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[EventStream.Event]
    // NoTimeout for the same reason as the sessionize test above: with
    // ProcessingTimeTimeout the engine keeps scheduling timeout-check
    // batches and processAllAvailable never quiesces.
    val q = EventStream.sessionFunnel(in.toDS(),
        timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
      .writeStream.format("memory").queryName("sfunnel").outputMode("append").start()
    try {
      in.addData(
        // u1: view, then click 2h later (NEW session) — no in-session click
        EventStream.Event(10, ts("2025-01-01 00:00:00"), 1, "view", 0),
        EventStream.Event(11, ts("2025-01-01 02:00:00"), 1, "click", 0),
        // u2: full in-session conversion
        EventStream.Event(20, ts("2025-01-01 00:00:00"), 2, "view", 0),
        EventStream.Event(21, ts("2025-01-01 00:10:00"), 2, "click", 0),
        EventStream.Event(22, ts("2025-01-01 00:20:00"), 2, "purchase", 0),
        // u3: click precedes the session's first view — ordering violation
        EventStream.Event(30, ts("2025-01-01 00:00:00"), 3, "click", 0),
        EventStream.Event(31, ts("2025-01-01 00:10:00"), 3, "view", 0))
      q.processAllAvailable()
      // close every open session with a far-future event per user
      (1L to 3L).foreach(u => in.addData(
        EventStream.Event(90 + u, ts("2025-01-02 00:00:00"), u, "error", 0)))
      q.processAllAvailable()
      val closed = spark.table("sfunnel")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getBoolean(4), r.getBoolean(5), r.getBoolean(6))).toSet
      // u1 session 1: viewed only; u1 session 2 (the lone click): nothing
      assert(closed.contains((1L, ts("2025-01-01 00:00:00").getTime / 1000, true, false, false)))
      assert(closed.contains((1L, ts("2025-01-01 02:00:00").getTime / 1000, false, false, false)))
      // u2: fully converted
      assert(closed.contains((2L, ts("2025-01-01 00:00:00").getTime / 1000, true, true, true)))
      // u3: viewed, but the pre-view click must not count
      assert(closed.contains((3L, ts("2025-01-01 00:00:00").getTime / 1000, true, false, false)))
    } finally q.stop()
  }

  test("streaming SCD2: repeats collapse, changes close versions, versions chain across batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[EventStream.Event]
    val q = EventStream.scd2Stream(in.toDS())
      .writeStream.format("memory").queryName("scd2").outputMode("append").start()
    try {
      in.addData(
        EventStream.Event(1, ts("2025-01-01 00:00:00"), 1, "view", 0),
        EventStream.Event(2, ts("2025-01-01 00:05:00"), 1, "view", 0),  // repeat: collapse
        EventStream.Event(3, ts("2025-01-01 00:10:00"), 1, "click", 0)) // closes v1
      q.processAllAvailable()
      in.addData( // second batch: the open v2 must close against retained state
        EventStream.Event(4, ts("2025-01-01 00:20:00"), 1, "purchase", 0),
        EventStream.Event(5, ts("2025-01-01 00:30:00"), 2, "view", 0))  // u2 opens, never closes
      q.processAllAvailable()
      val closed = spark.table("scd2")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getLong(3), r.getLong(4))).toSet
      val t0 = ts("2025-01-01 00:00:00").getTime / 1000
      assert(closed == Set(
        (1L, 1L, "view", t0, t0 + 600),        // v1: repeat collapsed, closed by click
        (1L, 2L, "click", t0 + 600, t0 + 1200) // v2: closed across the batch boundary
      ), s"only closed versions may flow: $closed")
    } finally q.stop()
  }

  test("custom mergeable sketch aggregates a stream (per-key quantiles, update mode)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Double)]
    val q = in.toDF().toDF("k", "v")
      .groupBy($"k")
      .agg(graft.functions.QuantileSketch.quantileSketch($"v", Seq(0.5)).as("qs"))
      .select($"k", $"qs"(0).as("p50"))
      .writeStream.format("memory").queryName("stream_qs").outputMode("update").start()
    try {
      in.addData((1 to 100).map(i => ("a", i.toDouble)): _*)
      q.processAllAvailable()
      // second micro-batch MERGES into the existing sketch state
      in.addData((101 to 200).map(i => ("a", i.toDouble)): _*)
      q.processAllAvailable()
      val p50 = spark.table("stream_qs").collect().map(r => r.getString(0) -> r.getDouble(1))
        .toMap.apply("a")
      assert(p50 == 100.0, s"median of 1..200 across two micro-batches: got $p50")
    } finally q.stop()
  }

  test("foreachBatch sink: batchId-keyed writes are idempotent, restart adds no dupes") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_febatch").toString
    val ckpt = s"$dir/_checkpoint"
    val out = s"$dir/upsert"
    val in = MemoryStream[(Long, String)]
    val df = in.toDF().toDF("id", "payload")

    def runOnce(): Unit = {
      val q = IngestStream.toIdempotentBatchSink(df, out, ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    in.addData((1L, "a"), (2L, "b"))
    runOnce()
    assert(spark.read.parquet(out).count() == 2)
    // restart, no new data: checkpointed offsets → no batch re-runs
    runOnce()
    assert(spark.read.parquet(out).count() == 2)
    // new data lands in a NEW batch dir; old batch dirs untouched
    in.addData((3L, "c"))
    runOnce()
    val all = spark.read.parquet(out)
    assert(all.count() == 3)
    assert(all.select("id").as[Long].collect().toSet == Set(1L, 2L, 3L))
    // replay semantics: re-writing a batch to its deterministic path
    // OVERWRITES (same rows, same count) — the crash-before-commit case.
    // (Materialize the rows first: overwriting a path being lazily read
    // from is rejected by Spark.)
    val batch0Rows = spark.read.parquet(s"$out/batch_id=0")
      .as[(Long, String)].collect().toSeq
    batch0Rows.toDF("id", "payload")
      .write.mode("overwrite").parquet(s"$out/batch_id=0")
    assert(spark.read.parquet(out).count() == 3,
      "a replayed batch must overwrite its own output, never append")
  }

  test("streaming view maintenance: signed CDC merge equals recompute across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_viewmaint").toString
    val viewDir = s"$dir/view"
    val ckpt = s"$dir/_checkpoint"
    val in = MemoryStream[(String, Long, String)]
    val cdc = in.toDF().toDF("op", "o_custkey", "price_s")
      .select(col("op"), col("o_custkey"), col("price_s").cast("decimal(18,2)").as("price"))

    def runOnce(): Unit = {
      val q = ViewMaintenance.maintainView(cdc, viewDir, ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def view(): Map[Long, (Long, BigDecimal)] =
      ViewMaintenance.latestView(spark, viewDir, Long.MaxValue)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), BigDecimal(r.getDecimal(2))))).toMap

    // batch 0: three inserts over two customers
    in.addData(("I", 1L, "10.00"), ("I", 1L, "5.50"), ("I", 2L, "7.25"))
    runOnce()
    assert(view() == Map(
      1L -> ((2L, BigDecimal("15.50"))), 2L -> ((1L, BigDecimal("7.25")))))
    // batch 1: insert for 3, delete one of customer 1's orders, delete
    // customer 2's ONLY order — its key must drop from the view
    in.addData(("I", 3L, "2.00"), ("D", 1L, "10.00"), ("D", 2L, "7.25"))
    runOnce()
    val v = view()
    assert(v == Map(
      1L -> ((1L, BigDecimal("5.50"))), 3L -> ((1L, BigDecimal("2.00")))),
      s"merge must subtract deletes and drop drained keys: $v")
    // restart with no new data: checkpoint prevents re-application
    runOnce()
    assert(view() == v, "an empty restart must not change the view")
    // replay safety: re-merging batch 1's inputs against the view BEFORE
    // batch 1 reproduces v=1 exactly (crash-before-commit overwrite)
    val replayed = ViewMaintenance.applyDelta(
      ViewMaintenance.latestView(spark, viewDir, 1L),
      Seq(("I", 3L, "2.00"), ("D", 1L, "10.00"), ("D", 2L, "7.25"))
        .toDF("op", "o_custkey", "price_s")
        .select(col("op"), col("o_custkey"), col("price_s").cast("decimal(18,2)").as("price")))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), BigDecimal(r.getDecimal(2))))).toMap
    assert(replayed == v, "replaying a batch must be idempotent")
  }

  test("streaming shard manifest: incremental merge equals recompute; replay idempotent") {
    import graft.streaming.ShardManifestStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_shardman").toString
    val manDir = s"$dir/manifest"
    val ckpt = s"$dir/_checkpoint"
    val in = MemoryStream[(Long, String)]
    val docs = in.toDF().toDF("doc_id", "text")

    def runOnce(): Unit = {
      val q = ShardManifestStream.maintainManifest(docs, manDir, ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def manifest(): Map[Long, (Long, Long, BigDecimal)] =
      ShardManifestStream.latestManifest(spark, manDir, Long.MaxValue)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), BigDecimal(r.getDecimal(3))))).toMap

    val b0 = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon"), (3L, "zeta"))
    val b1 = Seq((4L, "eta theta iota kappa"), (5L, "lambda"))
    in.addData(b0: _*); runOnce()
    in.addData(b1: _*); runOnce()
    // incremental ≡ recompute, bit for bit (counts AND decimal checksums)
    val recomputed = graft.analytics.Sampling
      .manifestRaw((b0 ++ b1).toDF("doc_id", "text"), 16)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), BigDecimal(r.getDecimal(3))))).toMap
    val m = manifest()
    assert(m == recomputed, s"incremental $m vs recompute $recomputed")
    // empty restart: checkpoint prevents re-application
    runOnce()
    assert(manifest() == m, "an empty restart must not change the manifest")
    // replay safety: re-merging batch 1 against the pre-batch-1 manifest
    // reproduces v=1 exactly (crash-before-commit overwrite)
    val replayed = ShardManifestStream.mergeBatch(
      ShardManifestStream.latestManifest(spark, manDir, 1L),
      b1.toDF("doc_id", "text"), 16)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), BigDecimal(r.getDecimal(3))))).toMap
    assert(replayed == m, "replaying a batch must be idempotent")
  }

  test("event-time timers close sessions when the watermark passes the gap") {
    import graft.streaming.SessionCloseStream
    implicit val sqlCtx = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[SessionCloseStream.Event]
    val q = SessionCloseStream.closedSessions(in.toDS())
      .writeStream.format("memory").queryName("closed").outputMode("append").start()
    try {
      // u1's session: 10:00-10:05; its timer arms at 10:35 (30 min gap)
      in.addData(
        SessionCloseStream.Event(1L, ts("2024-01-01 10:00:00")),
        SessionCloseStream.Event(1L, ts("2024-01-01 10:05:00")))
      q.processAllAvailable()
      assert(spark.table("closed").isEmpty, "nothing closes before the watermark moves")
      // u2 at 11:30 pushes the watermark to 11:20 (10 min delay) > 10:35...
      in.addData(SessionCloseStream.Event(2L, ts("2024-01-01 11:30:00")))
      q.processAllAvailable()
      // ...and the NEXT batch runs with that watermark, firing u1's timer;
      // u2's own timer (12:00) stays armed
      in.addData(SessionCloseStream.Event(2L, ts("2024-01-01 11:31:00")))
      q.processAllAvailable()
      val closed = spark.table("closed").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(closed == Set((1L,
        ts("2024-01-01 10:00:00").getTime, ts("2024-01-01 10:05:00").getTime, 2L)),
        s"expected exactly u1's closed session: $closed")
    } finally {
      q.stop()
      prevProvider match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming semantic near-dup: planted cross-batch duplicate alerts, no false alerts") {
    import graft.streaming.SemanticDedupStream
    implicit val sqlCtx = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // near-orthogonal fillers vs a planted scaled copy: the copy shares its
    // original's sign pattern in EVERY table (scale-invariant), the fillers
    // verify at cosine far below tau
    def basis(i: Int, scale: Double): Seq[Double] =
      Seq.tabulate(64)(j => if (j == i) scale else 0.01 * ((j % 7) - 3))
    val in = MemoryStream[SemanticDedupStream.VecArrival]
    val q = SemanticDedupStream.alerts(in.toDS(), capPerBucket = 8, tau = 0.95)
      .writeStream.format("memory").queryName("sem_alerts").outputMode("append").start()
    try {
      in.addData(
        SemanticDedupStream.VecArrival(1L, basis(0, 1.0)),
        SemanticDedupStream.VecArrival(2L, basis(20, 1.0)))
      q.processAllAvailable()
      // batch 2: a x2-scaled copy of vector 1 (true scalar multiple →
      // cosine exactly 1.0, identical sign pattern) + a filler
      in.addData(
        SemanticDedupStream.VecArrival(3L, basis(0, 1.0).map(_ * 2.0)),
        SemanticDedupStream.VecArrival(4L, basis(40, 1.0)))
      q.processAllAvailable()
      val alerts = spark.table("sem_alerts").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet
      assert(alerts.nonEmpty, "planted duplicate raised no alert")
      assert(alerts.forall { case (a, b, c) => a == 3L && b == 1L && c == 1.0 },
        s"only the planted (3, 1) pair may alert: $alerts")
    } finally {
      q.stop()
      prevProvider match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState profiles: typed state accumulates across batches (RocksDB store)") {
    import graft.streaming.ProfileStream
    implicit val sqlCtx = spark.sqlContext
    // transformWithState requires the RocksDB state-store provider
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[ProfileStream.Event]
    val q = ProfileStream.profiles(in.toDS())
      .writeStream.format("memory").queryName("profiles").outputMode("update").start()
    try {
      in.addData(
        ProfileStream.Event(1L, "view", 0.0, 100L),
        ProfileStream.Event(1L, "purchase", 10.5, 110L),
        ProfileStream.Event(2L, "view", 0.0, 105L))
      q.processAllAvailable()
      in.addData(
        ProfileStream.Event(1L, "purchase", 2.25, 200L),
        ProfileStream.Event(2L, "purchase", 1.0, 210L))
      q.processAllAvailable()
      // last emitted profile per user reflects ALL batches — the typed
      // ValueState survived the micro-batch boundary
      val last = spark.table("profiles").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
        .groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).maxBy(_._1) }
      assert(last(1L) == ((3L, 2L, 12750000L, 200L)), s"u1: ${last(1L)}")
      assert(last(2L) == ((2L, 1L, 1000000L, 210L)), s"u2: ${last(2L)}")
    } finally {
      q.stop()
      prevProvider match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState MapState: Misra-Gries heavy hitters honor both MG bounds") {
    import graft.streaming.HeavyHitterStream
    import graft.streaming.HeavyHitterStream.Tok
    implicit val sqlCtx = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[Tok]
    val q = HeavyHitterStream.heavyHitters(in.toDS(), k = 8)
      .writeStream.format("memory").queryName("hot").outputMode("update").start()
    try {
      // lang "en": 30 of 100 tokens are the planted heavy term, the other
      // 70 are all distinct — n/(k+1) = 100/9 ≈ 11.1, so "hot" MUST be
      // tracked with 30 ≥ count_lb ≥ 30 − 11 = 19
      val heavy = Seq.fill(30)(Tok("en", "hot"))
      val tail = (1 to 70).map(i => Tok("en", s"u$i"))
      // interleave so decrements actually hit the heavy counter
      val mixed = heavy.zipAll(tail, null, null)
        .flatMap { case (a, b) => Seq(Option(a), Option(b)).flatten }
      in.addData(mixed: _*)
      // lang "vi": 3 distinct terms ≤ k ⇒ MG is EXACT
      in.addData(Seq.fill(5)(Tok("vi", "a")) ++ Seq.fill(3)(Tok("vi", "b")) ++
        Seq.fill(2)(Tok("vi", "c")): _*)
      q.processAllAvailable()
      val rows = spark.table("hot").collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val hot = rows.getOrElse(("en", "hot"),
        fail(s"heavy term must survive MG: ${rows.keys}"))
      assert(hot >= 19L && hot <= 30L, s"MG bound violated: $hot")
      assert(rows(("vi", "a")) == 5L && rows(("vi", "b")) == 3L &&
        rows(("vi", "c")) == 2L, "≤k distinct terms must count exactly")
      // cross-batch: the MapState persists — 4 more hits accumulate
      in.addData(Seq.fill(4)(Tok("vi", "a")): _*)
      q.processAllAvailable()
      val later = spark.table("hot").collect()
        .filter(r => r.getString(0) == "vi" && r.getString(1) == "a")
        .map(_.getLong(2)).max
      assert(later == 9L, s"counts must accumulate across batches: $later")
    } finally {
      q.stop()
      prevProvider match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
