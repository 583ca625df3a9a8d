package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed table layout for co-located joins (100 TB posture).
  *
  * A fact⋈fact join (e.g. lineitem ⋈ orders on the order key) shuffles BOTH
  * sides every query. Writing each side bucketed by the join key — same
  * bucket count — makes the join a per-bucket zip with NO exchange on either
  * side: Spark's physical planner recognizes matching
  * `HashPartitioning(key, n)` output partitioning from bucketed scans. At
  * warehouse scale this turns the dominant recurring shuffle (terabytes per
  * query) into a one-time layout cost at ingest.
  *
  * Bucketing requires the table catalog (`saveAsTable`); a Hive metastore is
  * not needed — Spark's built-in in-memory/derby catalog suffices.
  */
object Bucketed {

  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int = 32): Unit = {
    val spark = df.sparkSession
    // The session catalog is in-memory but the warehouse dir persists:
    // files left by a PREVIOUS session at the managed location make
    // CREATE TABLE fail even in overwrite mode (the table isn't in this
    // session's catalog, so overwrite can't claim the location). Drop both.
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key — plans with zero
    * Exchange nodes (verify with `.explain`). */
  def colocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
