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

  case class MediaHash(doc_id: Long, dhash: Long)

  /** Perceptual difference-hash over the stub decode: an 8×9 "grayscale
    * tile" (each cell averages one contiguous payload window, so a small
    * byte-level edit perturbs ONE cell) reduced to 64 adjacent-cell
    * comparisons — the standard dHash. A real codec replaces `grayTile`
    * with decode+resize-to-8×9; the hash, banding, and joins stay. Pure
    * function of the payload bytes → deterministic, testable. */
  object PerceptualHash {
    val Rows = 8
    val Cols = 9

    def grayTile(payload: Array[Byte]): Array[Int] = {
      val cells = Rows * Cols
      val out = new Array[Int](cells)
      val n = payload.length
      if (n == 0) return out
      var k = 0
      while (k < cells) {
        val lo = (k.toLong * n / cells).toInt
        val hi = math.max(lo + 1, ((k + 1).toLong * n / cells).toInt)
        // accumulate in a Long: an Int sum overflows once a cell window
        // exceeds ~8.4 MB (payload ≳ 600 MB), corrupting the hash exactly
        // in the large-blob regime
        var s = 0L
        var i = lo
        while (i < hi) { s += payload(i) & 0xFF; i += 1 }
        out(k) = (s / (hi - lo)).toInt
        k += 1
      }
      out
    }

    def dHash(tile: Array[Int]): Long = {
      var h = 0L
      var r = 0
      while (r < Rows) {
        var c = 0
        while (c < Cols - 1) {
          if (tile(r * Cols + c) < tile(r * Cols + c + 1))
            h |= 1L << (r * (Cols - 1) + c)
          c += 1
        }
        r += 1
      }
      h
    }

    def of(payload: Array[Byte]): Long = dHash(grayTile(payload))
  }

  /** Per-media perceptual hashes, computed in the same partition-wise
    * decode pass as q31 (one blob read, constant memory per partition). */
  def mediaHashesOn(media: Dataset[MediaBlob]): Dataset[MediaHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { blobs =>
      blobs.map(b => MediaHash(b.doc_id, PerceptualHash.of(b.payload)))
    }
  }

  /** q118: media near-duplicate pairs by perceptual hash — the multimodal
    * member of the dedup family: 8-byte dHash per blob at rest, banded
    * 16-bit-chunk equi-join for candidates (pigeonhole-exact for Hamming
    * ≤ 3, the q27 shape), exact Hamming verify on candidates only. On a
    * corpus with no visually-near media this is correctly empty (q30's
    * contract); q119 pins the positive path with planted perturbed copies.
    * At 100 TB the blobs are read once (hash fused into the decode pass)
    * and only 8-byte hashes ever shuffle. */
  def phashNearDupOn(hashes: DataFrame, maxHamming: Int = 3): DataFrame = {
    import graft.functions.BitOps.hammingDistance
    val chunks = hashes.select(col("doc_id"), col("dhash"),
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("chunk"),
          shiftright(col("dhash"), i * 16).bitwiseAND(0xFFFFL).as("ck"))): _*)).as("c"))
      .select(col("doc_id"), col("dhash"), col("c.chunk").as("chunk"), col("c.ck").as("ck"))
    chunks.as("x").join(chunks.as("y"), Seq("chunk", "ck"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        hammingDistance(col("x.dhash"), col("y.dhash")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** q118 entry: over the fake media table (rows-only; q119 is the oracle). */
  def phashNearDup(spark: SparkSession, dir: String): DataFrame =
    phashNearDupOn(mediaHashesOn(mediaTable(spark, dir)).toDF())

  /** q119: planted perceptual recall — every query blob gets a copy with
    * its LAST byte flipped: one grayscale cell moves, so the dHash differs
    * in at most 2 bits and the pair MUST survive banding (two untouched
    * 16-bit chunks always remain) and the Hamming ≤ 3 verify. A broken
    * tile, hash, banding, or verify drops the boolean to false. */
  def phashPlantedRecall(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = mediaTable(spark, dir)
    val planted = base.filter(col("doc_id") < 10).as[MediaBlob].map { b =>
      val p = b.payload.clone()
      if (p.nonEmpty) p(p.length - 1) = (p(p.length - 1) ^ 0x01).toByte
      MediaBlob(b.doc_id + 1000000L, p)
    }
    val pairs = phashNearDupOn(mediaHashesOn(base.unionByName(planted)).toDF())
    val queries = base.filter(col("doc_id") < 10).select(col("doc_id"))
    queries
      .join(pairs, col("doc_id") === col("doc_a") &&
        col("doc_b") === col("doc_id") + 1000000L, "left")
      .agg(count(lit(1)).as("n_media"),
        (sum(when(col("doc_b").isNotNull, 1L).otherwise(0L)) === count(lit(1)))
          .as("planted_ok"))
  }

  /** q118 gate: per-pair form of q119's planted harness — one row per
    * planted perturbed copy that the banded-dHash path recovered, on the
    * (id, id+1e6) pattern. The oracle re-states the planted id set, so a
    * single lost plant drops a row and the hash mismatches; the raw
    * unplanted near-dup API ([[phashNearDup]]) stays spec-tested. */
  def phashNearDupGate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = mediaTable(spark, dir)
    val planted = base.filter(col("doc_id") < 10).as[MediaBlob].map { b =>
      val p = b.payload.clone()
      if (p.nonEmpty) p(p.length - 1) = (p(p.length - 1) ^ 0x01).toByte
      MediaBlob(b.doc_id + 1000000L, p)
    }
    phashNearDupOn(mediaHashesOn(base.unionByName(planted)).toDF())
      .filter(col("doc_b") === col("doc_a") + 1000000L)
      .select(col("doc_a"), col("doc_b"))
  }
}
