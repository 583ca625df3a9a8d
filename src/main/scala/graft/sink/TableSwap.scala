package graft.sink

import org.apache.spark.sql.SparkSession

/** Generation swap for multi-table persisted indexes: a rebuild writes its
  * tables under a STAGING name (hours of work, zero impact on the serving
  * index), then this rename makes the generation live — catalog ops plus a
  * filesystem rename, no data movement on HDFS-like stores (an object
  * store pays a copy; production there fronts the index with a view and
  * replaces the view, a single atomic catalog op). The two-op drop+rename
  * window per table is the same one the warehouse-scale form of
  * [[Bucketed.compactBucketed]] documents.
  *
  * Two catalog subtleties are handled here so every index family shares
  * them:
  *  - PARTITIONED tables (the ANN cells): renaming a managed table moves
  *    its directory but the catalog's partition entries keep their old
  *    locations — the next scan would quietly read zero rows. Every
  *    partition is re-anchored under the new root (O(#partitions)
  *    metadata, the compaction planner's cardinality).
  *  - BUCKETED tables (dedup sigs/bands, lex postings/dl): the bucket
  *    spec is table metadata and travels with the rename, so the
  *    exchange-free probe plans survive the swap (spec-pinned).
  *
  * Tombstone logs of both names are retired: a rebuilt generation was
  * built from the current corpus and has nothing to forget. */
object TableSwap {

  def swapIn(spark: SparkSession, staging: String, live: String,
      suffixes: Seq[String]): Unit = {
    for (suffix <- suffixes) {
      val (s, l) = (staging + suffix, live + suffix)
      if (spark.catalog.tableExists(s)) {
        spark.sql(s"DROP TABLE IF EXISTS $l")
        spark.sql(s"ALTER TABLE $s RENAME TO $l")
        reanchorPartitions(spark, l)
      }
    }
    Tombstones.clear(spark, live)
    Tombstones.clear(spark, staging)
  }

  /** See scaladoc: partition locations stranded by a managed-table rename
    * are re-anchored under the table's new root. */
  private def reanchorPartitions(spark: SparkSession, table: String): Unit = {
    val cat = spark.sessionState.catalog
    val ti = org.apache.spark.sql.catalyst.TableIdentifier(table)
    if (cat.getTableMetadata(ti).partitionColumnNames.nonEmpty) {
      val root = new org.apache.hadoop.fs.Path(cat.getTableMetadata(ti).location)
      val fixed = cat.listPartitions(ti).map { p =>
        val dir = p.spec.map { case (k, v) => s"$k=$v" }.mkString("/")
        p.copy(storage = p.storage.copy(
          locationUri = Some(new org.apache.hadoop.fs.Path(root, dir).toUri)))
      }
      if (fixed.nonEmpty) cat.alterPartitions(ti, fixed)
    }
  }
}
