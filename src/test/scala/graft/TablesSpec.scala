package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Regression pins for `Tables.events`' physical-encoding normalization.
  *
  * The driver has regenerated `events.parquet` with different `ts`
  * encodings across rounds (ns INT64 through round 5, µs
  * `isAdjustedToUTC=0` → TIMESTAMP_NTZ from round 6), and the round-6
  * regeneration silently broke all 11 event-analytics gate queries at
  * analysis time. These fixtures pin every encoding the accessor claims to
  * handle, so the next regeneration fails HERE with a clear message instead
  * of in eleven downstream queries.
  */
class TablesSpec extends SparkSpec {

  private def writeFixture(df: org.apache.spark.sql.DataFrame): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_events_fix").toString
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("events: TIMESTAMP_NTZ (µs, isAdjustedToUTC=0) parquet arrives as TimestampType with identical instants") {
    import spark.implicits._
    // 2024-01-15T10:30:00.123456 and an hour later, written as NTZ micros —
    // the round-6 testdata encoding
    val micros = Seq(1705314600123456L, 1705318200123456L)
    val src = micros.toDF("us")
      .select(col("us"),
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"),
        lit("click").as("event_type"))
    assert(src.schema("ts").dataType == TimestampNTZType)
    val dir = writeFixture(src)

    val got = Tables.events(spark, dir)
    assert(got.schema("ts").dataType == TimestampType,
      s"expected TimestampType, got ${got.schema("ts").dataType}")
    // value-identical under the UTC session timezone: unix_micros must
    // round-trip, and the numeric casts the event queries use must analyze
    val back = got.select(col("us"), unix_micros(col("ts")).as("got_us"),
        col("ts").cast("double").as("dbl"))
      .collect()
    back.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), s"instant drifted: $r")
      assert(math.abs(r.getDouble(2) - r.getLong(0) / 1e6) < 1e-6)
    }
  }

  test("events: INT64 ts (nanosAsLong path) arrives as TimestampType truncated ns → µs") {
    import spark.implicits._
    val nanos = Seq(1705314600123456789L)
    val dir = writeFixture(
      nanos.toDF("ts").select(col("ts"), lit("view").as("event_type")))
    val got = Tables.events(spark, dir)
    assert(got.schema("ts").dataType == TimestampType)
    val us = got.select(unix_micros(col("ts"))).as[Long].head()
    assert(us == 1705314600123456L, s"ns→µs truncation wrong: $us")
  }

  test("events: driver testdata loads and its ts supports the numeric ops event queries use") {
    val got = Tables.events(spark, sf("sf0.001"))
    assert(got.schema("ts").dataType == TimestampType)
    // the exact op family that went red in round 6 — must analyze and run
    val n = got.select(unix_micros(col("ts")),
      floor(col("ts").cast("double")).cast("long")).limit(5).count()
    assert(n > 0)
  }

  test("drift canary: live testdata schemas carry the dtypes the engine relies on") {
    // the round-6 lesson generalized: if the driver regenerates ANY table
    // with drifted physical types, fail HERE with the table and column
    // named, not in dozens of downstream gate queries
    for (sfd <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val docs = Tables.documents(spark, sf(sfd)).schema
      assert(docs("doc_id").dataType.typeName == "long", s"$sfd documents.doc_id: ${docs("doc_id").dataType}")
      assert(docs("text").dataType.typeName == "string", s"$sfd documents.text")
      val emb = Tables.embeddings(spark, sf(sfd)).schema
      assert(emb("vec_id").dataType.typeName == "long", s"$sfd embeddings.vec_id: ${emb("vec_id").dataType}")
      assert(emb("embedding").dataType.typeName == "array",
        s"$sfd embeddings.embedding: ${emb("embedding").dataType}")
      // numeric element type — any of float/double works through the
      // cast("array<double>") every consumer applies; binary/string would not
      val elem = emb("embedding").dataType
        .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType.typeName
      assert(Set("float", "double").contains(elem), s"$sfd embedding element: $elem")
      val ord = Tables.orders(spark, sf(sfd)).schema
      assert(ord("o_orderkey").dataType.typeName == "long", s"$sfd orders.o_orderkey")
      assert(Set("double", "decimal").exists(ord("o_totalprice").dataType.typeName.startsWith),
        s"$sfd orders.o_totalprice: ${ord("o_totalprice").dataType}")
      val li = Tables.lineitem(spark, sf(sfd)).schema
      assert(li("l_orderkey").dataType.typeName == "long", s"$sfd lineitem.l_orderkey")
      val ev = Tables.events(spark, sf(sfd)).schema
      assert(ev("ts").dataType.typeName == "timestamp", s"$sfd events.ts: ${ev("ts").dataType}")
    }
  }
}
