package graft.sink

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier

/** Catalog-correct location resolution for managed tables.
  *
  * Deriving a managed table's path as `<warehouse.dir>/<name.toLowerCase>`
  * is wrong whenever the session's current database is not `default` (the
  * real path is `<warehouse>/<db>.db/<name>`): a stale-location guard built
  * that way can delete an unrelated directory or miss the leftovers it
  * exists to clean (round-8 ADVICE). Resolve from the catalog instead —
  * the table's recorded location when it exists, and the catalog's own
  * default-path rule (`defaultTablePath`) for a table about to be created.
  */
object ManagedPaths {

  /** Where `table` lives (existing) or would live (about to be created). */
  def pathOf(spark: SparkSession, table: String): Path = {
    val cat = spark.sessionState.catalog
    val ti = TableIdentifier(table)
    if (spark.catalog.tableExists(table))
      new Path(cat.getTableMetadata(ti).location)
    else new Path(cat.defaultTablePath(ti))
  }

  /** Stale-location guard: the session catalog is in-memory but the
    * warehouse dir persists, so files left by a PREVIOUS session at the
    * managed location block CREATE TABLE. Call before creating `table`
    * (after any DROP): deletes leftover files at the path the new table
    * will claim. */
  def clearStale(spark: SparkSession, table: String): Unit = {
    val loc = pathOf(spark, table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }
}
