package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col}

/** Tombstone log for the persisted indexes — the DELETE verb of the index
  * lifecycle (build / extend / monitor / refresh / compact / **delete**),
  * in the shape a 100 TB corpus service actually needs it:
  *
  *  - **merge-on-read**: a deletion request appends its ids to
  *    `<name>_tombstones` and touches NOTHING else — O(batch) I/O, visible
  *    to the very next query, which [[filter]]s every index scan with a
  *    broadcast anti-join against the log. No index rewrite on the
  *    request path (a single doc's postings are scattered across every
  *    term bucket; rewriting terabytes per GDPR request is the design
  *    this exists to avoid).
  *  - **purge-on-compact**: the physical rewrite rides the maintenance
  *    pass the index already needs for small-file compaction — the
  *    compaction snapshot anti-joins the log, so tombstoned rows vanish
  *    from the new generation and the log resets. The log's size is
  *    therefore bounded by purge cadence (kilobytes-to-MBs between
  *    nightly compactions), which is what keeps the broadcast side of
  *    [[filter]] trivially small.
  *
  * This is the merge-on-read + copy-on-write split every lakehouse delete
  * implements (Delta deletion vectors, Iceberg delete files) — re-expressed
  * over plain bucketed/partitioned parquet tables.
  *
  * The log stores a single `id` column; [[append]]/[[filter]] adapt to the
  * caller's id column name. A rebuild ([[clear]] from each index's `build`)
  * resets retention state — a fresh index has no history to forget.
  */
object Tombstones {

  def tableOf(name: String): String = s"${name}_tombstones"

  /** A missing log table normally MEANS "no deletions pending", so a log
    * rewrite interrupted between its DROP and RENAME
    * ([[Bucketed.replaceTable]]'s one crash window) would silently read as
    * an empty log — and the next [[append]] would recreate the table and
    * orphan the staged ids forever. Every accessor heals that window
    * first: two in-memory catalog lookups when nothing is pending. */
  private def healed(spark: SparkSession, name: String): Unit =
    Bucketed.healInterruptedReplace(spark, tableOf(name))

  /** Ids of `idCol` newly deleted: the request minus what the log already
    * holds. Callers that maintain side totals (LexIndex's negative stats
    * delta) MUST base them on this, not the raw request — a replayed or
    * overlapping deletion request must not double-subtract. Payload
    * columns persist ONLY when declared in `payloadCols` (LexIndex stores
    * each deleted doc's length so a later stats heal never has to consult
    * physical state — see [[graft.analytics.LexIndex.healStats]]); any
    * other column of a wide request frame is dropped here, so a caller
    * passing raw docs can't silently persist text into the log, and a
    * declared column that's missing fails AT the call site instead of as
    * a schema mismatch on a later cross-family append (round-9 ADVICE).
    * Dedup is by id. */
  def newIds(ids: DataFrame, name: String, idCol: String,
      payloadCols: Seq[String] = Nil): DataFrame = {
    val d = ids.withColumnRenamed(idCol, "id")
      .select(("id" +: payloadCols).map(col): _*)
      .dropDuplicates("id")
    of(ids.sparkSession, name) match {
      case Some(log) => d.join(broadcast(log), Seq("id"), "left_anti")
      case None => d
    }
  }

  /** Append deleted ids to the log — the whole cost of a delete request.
    * Ids already logged are skipped, so the call is idempotent. Columns
    * beyond the id survive only when declared via `payloadCols` (see
    * [[newIds]]). */
  def append(ids: DataFrame, name: String, idCol: String,
      payloadCols: Seq[String] = Nil): Unit = {
    val spark = ids.sparkSession
    val t = tableOf(name)
    val d = newIds(ids, name, idCol, payloadCols) // heals via logOf before the existence check below
    if (spark.catalog.tableExists(t))
      d.write.mode("append").format("parquet").saveAsTable(t)
    else {
      ManagedPaths.clearStale(spark, t)
      d.write.mode("overwrite").format("parquet").saveAsTable(t)
    }
    CrashPoints.reached("tombstones.appended")
  }

  /** The current log, if any deletions are pending. */
  def of(spark: SparkSession, name: String): Option[DataFrame] =
    logOf(spark, name).map(_.select(col("id")))

  /** The full log including payload columns stored by [[append]]. */
  def logOf(spark: SparkSession, name: String): Option[DataFrame] = {
    healed(spark, name)
    if (spark.catalog.tableExists(tableOf(name)))
      Some(spark.table(tableOf(name)))
    else None
  }

  /** Carry retention state FORWARD across a generation swap: deletion
    * requests that arrived AFTER the rebuild's corpus snapshot must keep
    * holding against the new generation — clearing the live log at swap
    * time would silently resurrect tombstoned docs (round-8 ADVICE).
    * Requests addressed to the staging name while it was building fold
    * in too; ids the rebuild already excluded cost nothing (the
    * merge-on-read anti-join is a no-op for them) and the log retires at
    * the next purge-on-compact as usual. Payload columns are carried only
    * when both logs agree on schema (they do within one index family). */
  def carryForward(spark: SparkSession, staging: String, live: String): Unit = {
    logOf(spark, staging).foreach { s =>
      // intra-family carry: the staged log's own payload schema IS the
      // declaration (both logs agree on schema within one index family)
      append(s, live, "id", s.columns.filterNot(_ == "id").toSeq)
      clear(spark, staging)
    }
  }

  /** Merge-on-read: drop `df` rows whose `idCol` is tombstoned. Broadcast
    * anti-join (log bounded by purge cadence); the identity when the log
    * is empty, so read paths call it unconditionally and plans without
    * pending deletions are byte-identical to before. */
  def filter(df: DataFrame, name: String, idCol: String): DataFrame =
    of(df.sparkSession, name) match {
      case Some(log) => df.join(broadcast(log), df(idCol) === log("id"), "left_anti")
      case None => df
    }

  /** Reset the log — after a purge has rewritten every row it covered, or
    * from `build` (a rebuilt index starts with nothing to forget). */
  def clear(spark: SparkSession, name: String): Unit = {
    healed(spark, name)
    val t = tableOf(name)
    spark.sql(s"DROP TABLE IF EXISTS $t")
    ManagedPaths.clearStale(spark, t)
    CrashPoints.reached("tombstones.cleared")
  }
}

