package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.analytics.LexIndex

/** Standing maintenance loop for the persisted inverted index — the
  * lexical member of the index-maintenance family (DedupIndexStream,
  * AnnIndexStream): every arriving micro-batch of documents extends the
  * BM25 index, so keyword retrieval serves today's crawl without a
  * rebuild.
  *
  * Exactly-once discipline, and why it's STRICTER here: the dedup index
  * tolerates at-least-once appends (duplicate rows can't duplicate its
  * distinct'd output pairs), but duplicated postings inflate tf, df, and
  * the stats totals — silently wrong BM25 scores. So a replayed batch must
  * append to each of the three tables exactly once, assembled from
  * idempotent parts:
  *
  *  1. the batch snapshots to `workDir/stage/b=<id>` in overwrite mode —
  *     a deterministic re-writable staging copy, so every replay derives
  *     byte-identical postings/lengths/stats from the SAME rows;
  *  2. each table append is guarded by its OWN marker written after it —
  *     a crash between appends resumes at the first un-markered table,
  *     re-deriving from the stage, never re-appending a committed one;
  *  3. a final batch marker short-circuits fully-committed replays.
  *
  * `compactEvery` > 0 runs [[LexIndex.compact]] after every Nth batch —
  * answer-preserving and idempotent, so it carries no marker. */
object LexIndexStream {

  case class DocArrival(doc_id: Long, text: String)

  /** One micro-batch — exposed for direct testing. */
  def processBatch(spark: SparkSession, name: String, batch: DataFrame,
      batchId: Long, workDir: String, compactEvery: Int = 0): Unit = {
    val fs = new Path(workDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val done = new Path(s"$workDir/_committed/b=$batchId")
    if (fs.exists(done)) return
    val stage = s"$workDir/stage/b=$batchId"
    batch.select("doc_id", "text").write.mode("overwrite").parquet(stage)
    val staged = spark.read.parquet(stage)
    def guarded(step: String)(f: => Unit): Unit = {
      val m = new Path(s"$workDir/_committed/b=$batchId.$step")
      if (!fs.exists(m)) { f; fs.create(m, true).close() }
    }
    guarded("postings") { LexIndex.appendPostings(staged, name) }
    guarded("dl") { LexIndex.appendDl(staged, name) }
    guarded("stats") { LexIndex.appendStatsDelta(staged, name) }
    fs.create(done, true).close()
    if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
      LexIndex.compact(spark, name)
  }

  /** The standing query: wire to `.option("checkpointLocation", …).start()`.
    * The index at `name` must exist ([[LexIndex.build]], possibly on an
    * empty corpus) before the stream starts. */
  def run(docs: Dataset[DocArrival], name: String, workDir: String,
      compactEvery: Int = 0): DataStreamWriter[DocArrival] =
    docs.writeStream.foreachBatch { (batch: Dataset[DocArrival], batchId: Long) =>
      processBatch(batch.sparkSession, name, batch.toDF(), batchId,
        workDir, compactEvery)
    }
}
