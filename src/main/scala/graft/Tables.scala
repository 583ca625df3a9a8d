package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Central accessors for the driver-provided test tables
  * (`/root/testdata/sf*` — see TESTDATA.md). One parquet file per table.
  *
  * All engine queries take the scale-factor directory as a parameter so the
  * same plan runs at any SF (and, with a different `dir`, against a real
  * warehouse path on a cluster). Reads use explicit parquet scans — schema
  * comes from parquet footers, never inference over JSON.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** `events.ts` has shipped in two physical parquet encodings across
    * testdata generations; both are normalized here so every consumer sees a
    * plain `TimestampType` column:
    *
    *  - nanosecond INT64: Spark's vectorized reader rejects parquet NANOS, so
    *    sessions set `spark.sql.legacy.parquet.nanosAsLong=true` and the
    *    column arrives as a long; truncate ns → µs (exactly what DuckDB's
    *    TIMESTAMP_NS → TIMESTAMP conversion does).
    *  - MICROS with `isAdjustedToUTC=0`: Spark 4.x reads this as
    *    `TIMESTAMP_NTZ`, which rejects numeric casts (`cast(ts as double)`,
    *    `unix_micros`) at analysis time. Cast to `TimestampType` — under the
    *    UTC session timezone the build pins, the instant is value-identical. */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
