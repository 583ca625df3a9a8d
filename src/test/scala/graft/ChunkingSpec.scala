package graft

import org.apache.spark.sql.functions._
import graft.analytics.{Chunking, TextStats}

/** q203 — token-window chunking. The oracle gate pins engine ≡ DuckDB on
  * the profile; these specs pin the window algebra itself: exact chunk
  * boundaries on a hand corpus, the per-doc chunk-count closed form, and
  * full token coverage with the exact overlap amplification. */
class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  test("hand corpus: starts, short tail, overlap — exact chunk set") {
    val docs = Seq((1L, "s", "a b c d e"), (2L, "s", "x"), (3L, "s", "  "))
      .toDF("doc_id", "source", "text")
    val out = Chunking.chunksOn(docs, size_ = 3, stride = 2)
      .select("doc_id", "start", "n_tok", "chunk_text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3))).toSet
    assert(out == Set(
      (1L, 0, 3L, "a b c"), (1L, 2, 3L, "c d e"), (1L, 4, 1L, "e"),
      (2L, 0, 1L, "x")), out)    // doc 3 is all-whitespace → no chunks
  }

  test("per-doc chunk count and token amplification match the closed form") {
    val perDoc = Chunking.chunkTable(spark, sf("sf0.001"))
      .groupBy("doc_id").agg(count(lit(1)).as("c"), sum(col("n_tok")).as("tok"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val nTok = Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), size(TextStats.tokens(col("text"))).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perDoc.nonEmpty && nTok.nonEmpty)
    for ((id, n) <- nTok) {
      if (n == 0L) assert(!perDoc.contains(id), s"doc $id: chunks from an empty doc")
      else {
        val starts = 0L until n by 24L
        assert(perDoc(id)._1 == starts.length.toLong, s"doc $id: chunk count")
        assert(perDoc(id)._2 == starts.map(s => math.min(32L, n - s)).sum,
          s"doc $id: token amplification")
      }
    }
  }
}
