package graft.sink

import org.apache.spark.sql.DataFrame

/** `INSERT OVERWRITE` with DYNAMIC partition semantics, conf-isolated per
  * call.
  *
  * The V1 catalog `insertInto` path reads `partitionOverwriteMode` ONLY
  * from the session conf — the per-write `.option(...)` never reaches
  * `InsertIntoStatement` (verified against the Spark 4.1 writer: the
  * statement is built from the plan, mode and table identifier alone; the
  * option works only for path-based writes à la BatchViews). A
  * session-global set/restore dance is a data-loss race under concurrent
  * legs ([[graft.functions.Par]] fans compactions over disjoint tables):
  * one leg's finally-restore landing between a sibling's set and its
  * write downgrades that overwrite to STATIC — a cid-scoped compact then
  * silently truncates every unselected partition, and a leg can capture a
  * sibling's temporary "dynamic" and leak it session-wide.
  *
  * So the write runs in a per-call CLONED session (`newSession()`: own
  * SQLConf, shared SparkContext and catalog) whose conf is dynamic. The
  * frame crosses sessions through a global temp view — the clone reuses
  * the caller's analyzed plan (call sites pass a Materialized snapshot,
  * so nothing recomputes), no RDD row conversion. Two seams closed
  * explicitly:
  *  - the CALLER's relation cache is refreshed after the write (a clone's
  *    write does not invalidate another session's cached file listing —
  *    the cross-session staleness trap this repo has hit before);
  *  - the view is dropped in `finally` (names are per-call unique, so
  *    concurrent legs never collide).
  */
object DynamicOverwrite {

  private val seq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Positional-resolution insertInto, like the writer API: callers must
    * pass columns already in the target table's order. */
  def insertInto(df: DataFrame, table: String): Unit = {
    val caller = df.sparkSession
    val v = s"graft_dynov_${seq.incrementAndGet()}"
    df.createOrReplaceGlobalTempView(v)
    try {
      val clone = caller.newSession()
      clone.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      clone.table(s"global_temp.$v")
        .write.mode("overwrite").insertInto(table)
    } finally caller.catalog.dropGlobalTempView(v)
    caller.catalog.refreshTable(table)
  }
}
