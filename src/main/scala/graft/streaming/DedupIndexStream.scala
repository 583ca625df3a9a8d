package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.analytics.DedupIndex
import graft.functions.Materialize

/** The STANDING dedup loop over the persisted index — what a 100 TB ingest
  * pipeline actually runs: every arriving micro-batch is deduplicated
  * against everything ingested so far, its survivors are committed to the
  * clean zone, and the index grows by exactly those survivors. Composes
  * [[graft.analytics.DedupIndex]] (batch build/probe/extend) with
  * Structured Streaming's `foreachBatch`, the idempotence discipline of
  * [[ViewMaintenance]] applied to index maintenance:
  *
  *  - survivors land at `survivorsDir/b=<batchId>` in overwrite mode — a
  *    replayed batch rewrites the same directory (idempotent);
  *  - the index [[DedupIndex.extend]] is guarded by a batchId marker file
  *    written AFTER the append: a batch that committed fully is skipped on
  *    replay. A crash between append and marker can duplicate index rows
  *    (at-least-once extend) — harmless by construction: candidates are
  *    distinct pairs and [[DedupIndex.nearDupsAgainst]] distincts its
  *    verified output, so duplicated rows never duplicate matches. The
  *    dangerous twin of that window — the batch's OWN survivors already
  *    sitting in the index when the batch replays, so every survivor
  *    matches itself at est 1.0 and the anti-join erases the previously
  *    committed survivor set — is closed structurally: matches whose
  *    corpus id is one of the replaying batch's own doc ids are discarded,
  *    which restores exactly the first run's semantics (dedup against the
  *    pre-batch index only; intra-batch near-dups are by contract not
  *    deduped here, only exact intra-batch copies collapse);
  *  - intra-batch exact copies collapse first (min doc_id per content
  *    digest), so two copies arriving in ONE batch can't both survive.
  *
  * Per-batch cost is O(batch + collisions) — the [[DedupIndex]] contract —
  * regardless of how large the index has grown; state lives entirely in
  * the index tables, not in streaming state (contrast [[DedupStream]],
  * which trades bounded in-memory state for an *approximate* working-set
  * view; this loop is the exact, durable member of the pair).
  */
object DedupIndexStream {

  case class DocArrival(doc_id: Long, text: String)

  /** One micro-batch of the loop — exposed for direct testing.
    *
    * `compactEvery` > 0 runs [[DedupIndex.compact]] after every Nth
    * batch's commit: each extend appends one file per touched bucket, so
    * a standing loop otherwise accretes files without bound. The dedup
    * index's tables are bucketed (not partitioned), so compaction is a
    * full rewrite — N sizes the amortization (rewrite cost / N batches);
    * like the ANN twin it is answer-preserving and idempotent, so it
    * carries no marker and a crash-replay that re-compacts is harmless. */
  def processBatch(spark: SparkSession, name: String, batch: DataFrame,
      batchId: Long, survivorsDir: String, estThreshold: Double = 0.9,
      compactEvery: Int = 0): Unit = {
    val markerPath = new Path(s"$survivorsDir/_committed/b=$batchId")
    val fs = markerPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(markerPath)) return // fully committed — replay is a no-op
    // intra-batch exact dedup: keep min doc_id per content digest
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("text").cast("binary"))).orderBy(col("doc_id"))
    val uniq = batch.select(col("doc_id"), col("text"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("doc_id"), col("text"))
    // Replay safety: a crash between extend and the marker leaves this
    // batch's survivors in the index; on replay they would match THEMSELVES
    // (est 1.0) and the anti-join below would erase the committed survivor
    // files. Dropping matches whose corpus side is a doc id of this very
    // batch makes the replay reproduce the first run bit-for-bit — the
    // batch is always deduplicated against the pre-batch index only.
    val batchIds = uniq.select(col("doc_id").as("corpus_id"))
    val matched = DedupIndex.nearDupsAgainst(spark, name, uniq, estThreshold)
      .join(broadcast(batchIds), Seq("corpus_id"), "left_anti")
      .select(col("new_id").as("doc_id")).distinct()
    val survivors = Materialize(uniq.join(matched, Seq("doc_id"), "left_anti"))
    survivors.write.mode("overwrite").parquet(s"$survivorsDir/b=$batchId")
    DedupIndex.extend(survivors, name)
    fs.create(markerPath, true).close()
    if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
      DedupIndex.compact(spark, name)
  }

  /** The standing query: wire to `.option("checkpointLocation", …).start()`.
    * The index at `name` must exist ([[DedupIndex.build]], possibly on an
    * empty corpus) before the stream starts. */
  def run(docs: Dataset[DocArrival], name: String, survivorsDir: String,
      estThreshold: Double = 0.9, compactEvery: Int = 0): DataStreamWriter[DocArrival] =
    docs.writeStream.foreachBatch { (batch: Dataset[DocArrival], batchId: Long) =>
      processBatch(batch.sparkSession, name, batch.toDF(), batchId,
        survivorsDir, estThreshold, compactEvery)
    }
}
