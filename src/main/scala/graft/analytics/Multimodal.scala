package graft.analytics

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.documents

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * decoded partition-wise on the executors.
  *
  * The container has no image/audio codecs, so the decode itself is a
  * clearly-marked deterministic STUB (`StubCodec.decode`) — but the Spark
  * side is real and tested: binary column schema, a typed `Dataset`
  * partition-wise decode (`mapPartitions` — the Scala analogue of
  * `mapInPandas`: one iterator per partition so a real codec can batch,
  * reuse buffers, and hold native handles per-partition), and downstream
  * relational composition over the extracted metadata.
  */
object Multimodal {

  case class MediaBlob(doc_id: Long, payload: Array[Byte])
  case class MediaMeta(doc_id: Long, n_bytes: Int, width: Int, height: Int,
      fmt: String, n_frames: Int)

  /** STUB codec. A real deployment swaps this object for JNI/FFI bindings to
    * an image/audio library; everything around it stays unchanged. The fake
    * is a pure function of (doc_id, payload bytes) so tests and the SQL
    * oracle can reproduce it exactly. */
  object StubCodec {
    val Formats: Array[String] = Array("jpg", "png", "webp")
    def decode(blob: MediaBlob): MediaMeta = {
      val n = blob.payload.length
      MediaMeta(
        doc_id = blob.doc_id,
        n_bytes = n,
        width = n % 640 + 32,
        height = (n * 7) % 480 + 32,
        fmt = Formats((blob.doc_id % 3).toInt),
        n_frames = (blob.doc_id % 16).toInt + 1)
    }
  }

  /** The documents table as a fake media table: text bytes as the opaque
    * payload. (Stand-in for `spark.read.format("binaryFile")` or a parquet
    * table with a real binary column.) */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaBlob] = {
    import spark.implicits._
    documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaBlob]
  }

  /** q31: partition-wise decode → typed metadata. The iterator-in /
    * iterator-out shape is the contract that matters at scale: constant
    * memory per partition, codec init once per partition, no
    * driver involvement. */
  def decodeMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .mapPartitions { blobs =>
        // per-partition codec init would go here (native handles, buffers)
        blobs.map(StubCodec.decode)
      }
      .toDF()
  }

  /** q40: frame sampling — the 1-blob → N-frame-rows shape every video
    * pipeline needs. Frames explode from the decoded metadata (no second
    * decode pass); per-frame features are the stub codec's deterministic
    * arithmetic so the distributed shape is oracle-checkable. A real codec
    * would emit a thumbnail/embedding per frame from inside the same
    * partition-wise pass. */
  def frameSample(spark: SparkSession, dir: String): DataFrame =
    decodeMeta(spark, dir)
      .select(col("doc_id"), col("n_bytes"), col("fmt"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_id"))
      .select(
        col("doc_id"),
        col("frame_id"),
        col("fmt"),
        // stub per-frame features: offset + a content-dependent luma proxy
        (col("frame_id").cast("long") * 40L).as("frame_ms"),
        pmod(col("n_bytes") * (col("frame_id") + 1), lit(256)).as("mean_luma"))

  /** q41: thumbnail resize planning — fit-within-target dims preserving
    * aspect ratio (integer math; the actual pixel resample is the codec
    * stub's job). Shows the resize stage as pure relational compute over
    * decoded metadata: no second pass over the blobs. */
  def thumbnailDims(spark: SparkSession, dir: String, target: Int = 256): DataFrame = {
    val w = col("width").cast("long")
    val h = col("height").cast("long")
    // scale = min(target/w, target/h) applied in integer math:
    // if w >= h: thumb_w = target, thumb_h = h*target/w (floor); else sym.
    decodeMeta(spark, dir).select(
      col("doc_id"), col("width"), col("height"),
      when(w >= h, lit(target)).otherwise((w * target / h).cast("int")).as("thumb_w"),
      when(w >= h, (h * target / w).cast("int")).otherwise(lit(target)).as("thumb_h"))
  }

  /** Relational composition over decoded metadata — grouped shape stats per
    * format (shows the decoded struct is a first-class relational citizen). */
  def formatStats(spark: SparkSession, dir: String): DataFrame =
    decodeMeta(spark, dir)
      .groupBy(col("fmt"))
      .agg(count(lit(1)).as("n_media"),
        round(avg(col("width")), 4).as("avg_width"),
        round(avg(col("height")), 4).as("avg_height"),
        max(col("n_frames")).as("max_frames"))
}
