package graft

import org.apache.spark.sql.functions._
import graft.analytics.{LexIndex, Sampling, TextStats}

/** Persisted inverted index + incremental BM25 (q179). */
class LexIndexSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf("sf0.01"))
    .select(col("doc_id"), col("text"),
      Sampling.contentBucket(col("text")).as("cb"))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("index-served BM25 equals the from-scratch computation") {
    val corpus = docs.select("doc_id", "text")
    LexIndex.build(corpus, "spec_lex_eq", buckets = 4)
    import spark.implicits._
    val qterms = TextStats.RetrievalQueries
      .flatMap { case (qid, s) => s.split(" ").map(t => (qid, t)) }
      .toDF("query_id", "term")
    assert(rows(LexIndex.bm25Against(spark, "spec_lex_eq"))
      == rows(TextStats.bm25On(corpus, qterms, 10)))
  }

  test("dl derived from postings equals the direct tokenize pass (dl = Σ tf)") {
    // the round-14 single-tokenize build/extend path rides on this
    // identity — a drift here would silently shift every BM25 score
    val corpus = docs.select("doc_id", "text")
    assert(rows(LexIndex.dlFromPostings(LexIndex.postingsOf(corpus)))
      == rows(LexIndex.dlOf(corpus)))
  }

  test("build(A)+extend(B) ≡ build(A∪B): postings, lengths, and stats deltas all merge") {
    val a = docs.filter(col("cb") >= 40).select("doc_id", "text")
    val b = docs.filter(col("cb") < 40).select("doc_id", "text")
    LexIndex.build(a, "spec_lex_ext", buckets = 4)
    LexIndex.extend(b, "spec_lex_ext")
    LexIndex.build(a.unionByName(b), "spec_lex_all", buckets = 4)
    assert(rows(LexIndex.bm25Against(spark, "spec_lex_ext"))
      == rows(LexIndex.bm25Against(spark, "spec_lex_all")))
    val cat = spark.sql("DESCRIBE EXTENDED spec_lex_ext_postings")
      .filter(col("col_name") === "Num Buckets").collect()
    assert(cat.length == 1 && cat(0).getString(1).trim == "4")
  }

  test("compact: file count collapses, bucket spec survives, answers unchanged") {
    val a = docs.filter(col("cb") >= 40).select("doc_id", "text")
    val b = docs.filter(col("cb") < 40).select("doc_id", "text")
    LexIndex.build(a, "spec_lex_cmp", buckets = 4)
    LexIndex.extend(b, "spec_lex_cmp")
    val before = rows(LexIndex.bm25Against(spark, "spec_lex_cmp"))
    def nFiles(t: String): Int = {
      val loc = new org.apache.hadoop.fs.Path(spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(t)).location)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(loc).count(_.getPath.getName.endsWith(".parquet"))
    }
    assert(nFiles("spec_lex_cmp_postings") > 4, "extend must have appended files")
    LexIndex.compact(spark, "spec_lex_cmp")
    assert(nFiles("spec_lex_cmp_postings") <= 4, "one file per bucket after compact")
    assert(spark.table("spec_lex_cmp_stats").count() == 1, "stats log folded to one row")
    val cat = spark.sql("DESCRIBE EXTENDED spec_lex_cmp_postings")
      .filter(col("col_name") === "Num Buckets").collect()
    assert(cat.length == 1 && cat(0).getString(1).trim == "4")
    assert(rows(LexIndex.bm25Against(spark, "spec_lex_cmp")) == before)
  }

  test("streaming loop: batches extend the index exactly once, replay and partial commits heal") {
    import graft.streaming.LexIndexStream
    val all = docs.select("doc_id", "text")
    val a = all.filter(col("doc_id") % 3 === 0)
    val b = all.filter(col("doc_id") % 3 === 1)
    val c = all.filter(col("doc_id") % 3 === 2)
    val work = java.nio.file.Files.createTempDirectory("lexstream").toString
    LexIndex.build(a, "spec_lex_str", buckets = 4)
    LexIndexStream.processBatch(spark, "spec_lex_str", b, 0L, work)
    // full replay of a committed batch: must be a no-op
    LexIndexStream.processBatch(spark, "spec_lex_str", b, 0L, work)
    // partial-commit crash: batch 1 appended postings but died before dl/
    // stats — simulate by running the postings leg alone with its marker
    val fs = new org.apache.hadoop.fs.Path(work)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    c.write.mode("overwrite").parquet(s"$work/stage/b=1")
    LexIndex.appendPostings(spark.read.parquet(s"$work/stage/b=1"), "spec_lex_str")
    fs.create(new org.apache.hadoop.fs.Path(s"$work/_committed/b=1.postings"), true).close()
    // the replayed batch must finish dl+stats WITHOUT re-appending postings
    LexIndexStream.processBatch(spark, "spec_lex_str", c, 1L, work)
    LexIndex.build(all, "spec_lex_str_all", buckets = 4)
    assert(rows(LexIndex.bm25Against(spark, "spec_lex_str"))
      == rows(LexIndex.bm25Against(spark, "spec_lex_str_all")),
      "streamed index must equal a from-scratch build over all arrivals")
  }

  test("probe plan prunes postings buckets to the query terms") {
    LexIndex.build(docs.select("doc_id", "text"), "spec_lex_prune", buckets = 4)
    val q = LexIndex.bm25Against(spark, "spec_lex_prune")
    q.count()
    val plan = q.queryExecution.executedPlan.toString
    // the postings scan must advertise bucket pruning (isin on the bucket
    // column), not a full-table read
    assert(plan.contains("SelectedBucketsCount"),
      s"no bucket pruning in postings probe plan:\n${plan.take(2000)}")
  }
}
