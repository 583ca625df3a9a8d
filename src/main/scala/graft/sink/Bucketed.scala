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

  /** Rewrite a bucketed table to exactly ONE file per bucket, preserving
    * the bucket spec — the small-file compaction every append-mode index
    * table eventually needs (each `extend`/micro-batch append leaves one
    * file per touched bucket). Shared by [[graft.analytics.DedupIndex]]
    * and [[graft.analytics.LexIndex]].
    *
    * Snapshot FIRST, repartition AFTER: the table relation advertises
    * `HashPartitioning(key, n)` from its bucket spec, so a repartition over
    * the raw table scan is optimized away as redundant — while the physical
    * scan runs UNbucketed (file splits; "disabled by query planner"),
    * leaving partitions misaligned with bucket ids and the writer emitting
    * one file per (task, bucket) instead of one per bucket. The checkpoint
    * severs the bucketing claim, so the repartition survives and task i
    * holds exactly bucket i (repartition and the bucketed writer share
    * Murmur3 hashing). Bucketed tables have no partitions to overwrite
    * selectively, so this is a full rewrite; at warehouse scale the swap
    * runs as write-new-table + catalog rename. */
  def compactBucketed(spark: SparkSession, table: String, key: String,
      transform: DataFrame => DataFrame = identity): Unit = {
    import org.apache.spark.sql.functions.col
    val n = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
      .bucketSpec.getOrElse(sys.error(s"$table is not a bucketed table"))
      .numBuckets
    val loc = new org.apache.hadoop.fs.Path(spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table)).location)
    // `transform` lets the rewrite fold in answer-preserving maintenance the
    // caller already owes — the indexes pass their tombstone anti-join here,
    // making compaction the physical purge point (Tombstones' copy-on-write
    // half). It runs BEFORE the snapshot so the rewrite never materializes
    // rows it is about to drop.
    val snap = graft.functions.Materialize(transform(spark.table(table)))
      .repartition(n, col(key))
    // drop + delete the location explicitly: overwrite-in-place leaves the
    // previous generation's files in the managed dir, which would both
    // defeat the compaction and feed stale rows back into the scan
    spark.sql(s"DROP TABLE $table")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    snap.write.bucketBy(n, key).sortBy(key).format("parquet").saveAsTable(table)
  }
}

