package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row
import graft.model.Listing

/** Streaming ingest: the reference's scheduler → Kafka → consumer → HDFS
  * chain (SURVEY.md §3.3) as ONE Structured Streaming query:
  *
  *   kafka source → from_json(RawSchema) → normalize → partitioned sink
  *
  * vs the reference's hand-rolled pipeline:
  *  - micro-batch trigger: consumer flushes at 100 records or 60 s
  *    (kafka_cc/consumer/kafka_to_hdfs_consumer.py:24-25,133) →
  *    `Trigger.ProcessingTime(60s)` + `maxOffsetsPerTrigger` (cap is
  *    per-trigger, documented difference per SURVEY.md §7.5).
  *  - offset tracking: consumer-group auto-commit (at-least-once, line 61)
  *    → checkpointed offsets + file-sink WAL (exactly-once).
  *  - date-partitioned layout: manual YYYY/MM/DD dirs over WebHDFS
  *    (lines 88-105) → `partitionBy(ingest_date)`.
  */
object IngestStream {

  /** Kafka source → parsed raw listing frame. `value` is UTF-8 JSON of the
    * wire schema (reference: kafka_cc/producer/kafka_producer.py:24,63).
    * PERMISSIVE parse: malformed values yield null columns, mirroring the
    * reference's log-and-drop (kafka_to_hdfs_consumer.py:104).
    *
    * NOTE: requires the spark-sql-kafka connector on the classpath (shipped
    * separately from Spark core; absent in this container, so tests drive
    * the downstream stages from MemoryStream instead — `parseWire` onward
    * is identical either way). */
  def fromKafka(spark: SparkSession, bootstrap: String, topic: String,
      maxOffsetsPerTrigger: Long = 10000): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .option("maxOffsetsPerTrigger", maxOffsetsPerTrigger)
      .load()
      .select(parseWire(col("value").cast("string")))

  /** The value-parse stage, factored so tests can drive it from a
    * MemoryStream of JSON strings instead of a broker. PERMISSIVE mode with
    * an explicit corrupt-record column: `from_json` yields an all-null
    * struct (not a null struct) for garbage input, so the marker column is
    * the only reliable way to drop malformed records. */
  def parseWire(value: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val schema = Listing.RawSchema.add("_corrupt_record", org.apache.spark.sql.types.StringType)
    from_json(value, schema,
      Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt_record")).as("r")
  }

  /** Parsed stream → flattened raw columns; malformed records dropped (the
    * reference logs-and-drops, kafka_to_hdfs_consumer.py:104;
    * alonhadat.py:194-195). */
  def flatten(parsed: DataFrame): DataFrame =
    parsed.select(col("r.*"))
      .filter(col("_corrupt_record").isNull)
      .drop("_corrupt_record")

  /** Raw-zone streaming sink: exactly-once parquet, ingest-date partitioned.
    * 60 s processing-time trigger mirrors the reference's time-based flush. */
  def toRawZone(raw: DataFrame, path: String, checkpoint: String): DataStreamWriter[Row] =
    raw.withColumn("ingest_date", to_date(current_timestamp()))
      .writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy("ingest_date")
      .trigger(Trigger.ProcessingTime("60 seconds"))

  /** `foreachBatch` sink with batchId-keyed idempotence — the standard
    * recipe for exactly-once writes to sinks Spark has no transactional
    * connector for (JDBC upserts, external indexes, object-store merges):
    * each micro-batch lands in a DETERMINISTIC location derived from its
    * `batchId`, written with overwrite semantics, so a batch replayed after
    * a crash-before-checkpoint OVERWRITES its own previous (possibly
    * partial) output instead of appending duplicates. Replay safety comes
    * from (checkpointed offsets → same batchId → same rows → same path),
    * not from the sink being transactional.
    *
    * The built-in file sink (toRawZone) already gets exactly-once from its
    * own WAL; this path exists for every OTHER sink type — the function
    * passed per batch is arbitrary driver-side code operating on a normal
    * batch DataFrame, which is also what makes full-DataFrame-API writes
    * (merge/upsert/repartition-per-batch) possible mid-stream. */
  def toIdempotentBatchSink(df: DataFrame, outDir: String,
      checkpoint: String): DataStreamWriter[Row] =
    df.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
        ()
      }
      .option("checkpointLocation", checkpoint)
}
