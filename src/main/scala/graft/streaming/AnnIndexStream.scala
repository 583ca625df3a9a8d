package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.analytics.AnnIndex

/** Streaming maintenance of the persisted ANN index — the retrieval-side
  * twin of [[DedupIndexStream]]: embeddings arriving on a stream (fresh
  * documents leaving the encoder) are assigned with the STORED quantizer
  * and appended into the partitioned cells layout, so retrieval sees new
  * vectors within one micro-batch without retraining or rebuilding.
  *
  * Same idempotence discipline as [[DedupIndexStream]]: the append is
  * guarded by a batchId commit marker (replay of a committed batch is a
  * no-op); a crash between append and marker can duplicate index rows —
  * harmless, because [[AnnIndex.topKAgainst]] dedups its candidate set on
  * (query_id, neighbor_id) before ranking, so a duplicated vector can
  * never occupy two top-k slots. Quantizer refresh (centroid drift as the
  * corpus shifts) is a deliberate batch [[AnnIndex.build]], the usual
  * index-maintenance split.
  */
object AnnIndexStream {

  case class VecArrival(vec_id: Long, v: Seq[Double])

  /** One micro-batch: assign with the stored quantizer, append, mark. */
  def processBatch(spark: SparkSession, name: String, batch: DataFrame,
      batchId: Long, markerDir: String): Unit = {
    val markerPath = new Path(s"$markerDir/b=$batchId")
    val fs = markerPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(markerPath)) return
    AnnIndex.extend(batch.select(col("vec_id"), col("v")), name)
    fs.create(markerPath, true).close()
  }

  /** The standing query: wire to `.option("checkpointLocation", …).start()`. */
  def run(vecs: Dataset[VecArrival], name: String,
      markerDir: String): DataStreamWriter[VecArrival] =
    vecs.writeStream.foreachBatch { (batch: Dataset[VecArrival], batchId: Long) =>
      processBatch(batch.sparkSession, name, batch.toDF(), batchId, markerDir)
    }
}
