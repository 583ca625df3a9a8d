package graft.sink

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Raw-zone compaction: collapse re-crawled listings to their latest
  * version.
  *
  * The reference's ingest is at-least-once WITH DELIBERATE OVERLAP — every
  * crawl re-fetches pages 1-5 plus the next 25 (crawler/alonhadat.py:49,
  * 71-72), and its Kafka key dedup is dead code (the key coalesce always
  * falls through to a timestamp, kafka_producer.py:59-61; SURVEY.md §1.3).
  * So the raw zone accumulates duplicates by design, and dedup must be a
  * first-class engine op keyed on a SYNTHESIZED listing identity
  * (SURVEY.md §7.5): the content tuple (district, street, post_date, area).
  *
  * Scale: one shuffle keyed on the identity hash. Run per ingest-date
  * partition (overlap only spans a few crawl cycles), so the shuffle is
  * bounded by a day's data, not the table.
  */
object Compaction {

  /** Content-derived listing identity (stable across re-crawls; the
    * reference's dead Kafka key replaced). */
  def listingIdentity(df: DataFrame): Column =
    xxhash64(col("quan_huyen"), col("phuong_xa"), col("duong_pho"),
      col("post_date"), col("area"))

  /** Generic keep-newest compaction: one survivor per `identity`, ordered by
    * `version` descending (stable tiebreak on the full-record hash so
    * re-runs are deterministic even when versions collide). One shuffle
    * keyed on the identity. */
  def compact(zone: DataFrame, identity: Column, version: Column): DataFrame = {
    val w = Window.partitionBy(col("__lid"))
      .orderBy(version.desc, xxhash64(zone.columns.map(col): _*).asc)
    zone.withColumn("__lid", identity)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__lid", "__rn")
  }

  /** Keep the newest version of each listing (latest ingest_date). */
  def compactListings(zone: DataFrame): DataFrame =
    compact(zone, listingIdentity(zone), col("ingest_date"))
}
