package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.documents

/** RAG token-window chunking — the splitter that turns a document corpus
  * into the overlapping fixed-size passages a retrieval index actually
  * stores (the unit BM25/ANN retrieval serves at inference time, and the
  * unit a context-window-bounded trainer packs).
  *
  * Policy: windows of `size` whitespace tokens, stride `stride` (< size ⇒
  * consecutive chunks overlap by size − stride tokens, so no answer span
  * shorter than the overlap is ever split across a boundary). Start
  * offsets are 0, stride, 2·stride, … strictly below the token count; the
  * final window is allowed to run short rather than re-anchor at the tail
  * (re-anchoring would duplicate tail tokens nondeterministically many
  * times — the short-tail rule keeps every token's chunk multiplicity a
  * closed form of its offset).
  *
  * Scale: `sequence` + `explode` are per-row generators inside the scan
  * projection — chunking shuffles NOTHING; only the bounded source-keyed
  * profile aggregate exchanges. At 100 TB the chunk table is written
  * partition-parallel straight out of the scan, and the ×(size/stride)
  * token amplification is the policy's stated, budgeted cost.
  */
object Chunking {

  /** The chunk table itself: (doc_id, source, start, n_tok, chunk_text).
    * Empty documents produce no chunks (the `n_tok >= 1` guard — Spark's
    * `sequence(0, -1)` would throw where DuckDB's generate_series returns
    * empty, so the guard also keeps engine and oracle domains identical). */
  def chunkTable(spark: SparkSession, dir: String,
                 size_ : Int = 32, stride: Int = 24): DataFrame =
    chunksOn(documents(spark, dir), size_, stride)

  /** The policy on any (doc_id, source, text) frame — factored out so the
    * spec can drive it with hand corpora. */
  private[graft] def chunksOn(docs: DataFrame, size_ : Int, stride: Int): DataFrame =
    docs
      .select(col("doc_id"), col("source"),
        TextStats.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 1)
      .select(col("doc_id"), col("source"), col("toks"),
        explode(sequence(lit(0), size(col("toks")) - 1, lit(stride))).as("start"))
      .select(col("doc_id"), col("source"), col("start"),
        size(slice(col("toks"), col("start") + 1, lit(size_))).cast("long").as("n_tok"),
        array_join(slice(col("toks"), col("start") + 1, lit(size_)), " ").as("chunk_text"))

  /** q203: the chunking PROFILE gate — per source: chunk count, documents
    * covered, token total across chunks (original tokens × overlap
    * amplification, exactly), and the order-insensitive 48-bit-md5-prefix
    * checksum of every chunk's text in exact decimal (q110 discipline).
    * One off-by-one in a window boundary — an extra token in any chunk, a
    * lost tail window, a re-anchored tail — flips the checksum. */
  def chunkProfile(spark: SparkSession, dir: String): DataFrame =
    chunkTable(spark, dir)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_chunks"),
        countDistinct(col("doc_id")).as("n_docs"),
        sum(col("n_tok")).as("chunk_tokens"),
        sum(conv(substring(md5(col("chunk_text")), 1, 12), 16, 10)
          .cast("decimal(38,0)")).cast("decimal(38,0)").as("checksum"))
      .withColumn("checksum", col("checksum").cast("string"))
}
