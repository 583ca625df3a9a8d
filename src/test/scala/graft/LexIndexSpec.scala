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
