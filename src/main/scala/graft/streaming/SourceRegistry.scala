package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Multi-source streaming fan-out (T7) — the reference's crawler scheduler
  * keeps a registry of sources and runs one ingest per source
  * (scheduler/scheduler_runner.py:28-31,46-52: `sources = {"alonhadat":
  * ...}`). The engine's equivalent: a declarative registry mapping each
  * source to its topic + wire schema, and ONE streaming query per source —
  * independent checkpoints, independent failure domains, per-source sink
  * directories. Independent queries (vs one union-all query) are deliberate:
  * a poisoned topic or slow source stalls only its own query, and each
  * source scales its trigger/offsets independently — the same isolation the
  * reference gets from per-source crawler processes.
  */
object SourceRegistry {

  /** One registered ingest source. `topic` is the Kafka topic when a broker
    * is attached; tests and file-based deployments drive `parse` directly. */
  final case class SourceSpec(
      topic: String,
      schema: StructType,
      /** wire format → typed frame; identity for already-typed streams */
      parse: DataFrame => DataFrame = identity)

  /** The reference's registry has one live source (alonhadat); the engine
    * ships the registry itself so adding a source is one entry, not a new
    * pipeline. */
  def defaultSources: Map[String, SourceSpec] = Map(
    "alonhadat" -> SourceSpec("listings.alonhadat", graft.model.Listing.RawSchema,
      df => IngestStream.flatten(df.select(IngestStream.parseWire(col("value"))))))

  /** Start one query per source from a caller-supplied stream factory
    * (Kafka in production, MemoryStream in tests — the factory receives the
    * source name and spec and returns the raw stream). Each source writes
    * `<sinkRoot>/<name>` with checkpoint `<checkpointRoot>/<name>`. */
  def startAll(
      spark: SparkSession,
      sources: Map[String, SourceSpec],
      stream: (String, SourceSpec) => DataFrame,
      sinkRoot: String,
      checkpointRoot: String): Map[String, StreamingQuery] =
    sources.map { case (name, spec) =>
      val parsed = spec.parse(stream(name, spec))
      name -> parsed
        .withColumn("ingest_date", to_date(current_timestamp()))
        .writeStream
        .format("parquet")
        .option("path", s"$sinkRoot/$name")
        .option("checkpointLocation", s"$checkpointRoot/$name")
        .partitionBy("ingest_date")
        .queryName(s"ingest_$name")
        .start()
    }

  /** Kafka-backed stream factory (production path; requires the
    * spark-sql-kafka connector jar — absent in this container, see
    * COVERAGE.md S4). */
  def kafkaStream(spark: SparkSession, bootstrap: String)(
      name: String, spec: SourceSpec): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", spec.topic)
      .option("startingOffsets", "earliest")
      .load()
      .select(col("value").cast("string").as("value"))
}
