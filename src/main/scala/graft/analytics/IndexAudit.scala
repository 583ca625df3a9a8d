package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.{documents, embeddings}
import graft.analytics.TextStats.tokens

/** fsck for the persisted-index trio — the reconciliation audit a standing
  * 100 TB index service runs nightly: does each index still describe
  * exactly the corpus it claims to? Crashes between the multi-table writes
  * of an extend, a partial purge, or a bad manual backfill all surface
  * here, BEFORE they surface as silently-wrong retrieval.
  *
  * Two verdicts per surface:
  *  - `complete`: the index covers the corpus exactly — no missing rows
  *    (corpus entries the index never saw) and no orphans (index entries
  *    whose corpus row is gone);
  *  - `consistent`: the index's internal invariants hold (one signature
  *    per doc, a uniform band count, one cell per vector with a known
  *    centroid, per-doc posting mass equal to the stored doc length, the
  *    stats delta log's running totals equal to the doc-length table).
  *
  * Each check is a join/aggregate between an index table and the corpus
  * projection it mirrors — bucketed scans on the index side, nothing
  * corpus-squared; the output is six rows of booleans. */
object IndexAudit {

  private def row(spark: SparkSession, surface: String,
      complete: DataFrame, consistent: DataFrame): DataFrame =
    complete.crossJoin(consistent)
      .select(lit(surface).as("surface"), col("complete"), col("consistent"))

  def auditGate(spark: SparkSession, dir: String): DataFrame = {
    val docs = documents(spark, dir).select(col("doc_id"), col("text"))
    val vecs = embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    DedupIndex.build(docs, "graft_audit_dedup", buckets = 8)
    LexIndex.build(docs, "graft_audit_lex", buckets = 8)
    AnnIndex.build(vecs, "graft_audit_ann", numCentroids = 16)
    audit(spark, docs, vecs, "graft_audit_dedup", "graft_audit_lex",
      "graft_audit_ann")
  }

  /** The audit itself, over already-built indexes (callable against live
    * ones — the gate builds fresh copies so the query is self-contained). */
  def audit(spark: SparkSession, docs: DataFrame, vecs: DataFrame,
      dedupName: String, lexName: String, annName: String): DataFrame = {

    // full-outer id reconciliation: complete ⇔ no side has an unmatched id
    def idsMatch(index: DataFrame, corpus: DataFrame, key: String): DataFrame =
      index.select(col(key)).distinct().withColumn("i", lit(1))
        .join(corpus.select(col(key)).distinct().withColumn("c", lit(1)),
          Seq(key), "full_outer")
        .agg((sum(when(col("i").isNull || col("c").isNull, 1L).otherwise(0L))
          === lit(0L)).as("complete"))

    val sigs = spark.table(s"${dedupName}_sigs")
    val bands = spark.table(s"${dedupName}_bands")
    val dedupSigs = row(spark, "dedup_sigs",
      idsMatch(sigs, docs, "doc_id"),
      // exactly one signature row per doc
      sigs.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
        .agg((max(col("n")) === lit(1L)).as("consistent")))
    val dedupBands = row(spark, "dedup_bands",
      idsMatch(bands, docs, "doc_id"),
      // uniform band count per doc (every doc hashed into the same grid)
      bands.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
        .agg((min(col("n")) === max(col("n"))).as("consistent")))

    val cells = spark.table(s"${annName}_cells")
    val annCells = row(spark, "ann_cells",
      idsMatch(cells, vecs, "vec_id"),
      // one cell per vector, and that cell's centroid exists
      cells.groupBy(col("vec_id")).agg(count(lit(1)).as("n"),
          max(col("cid")).as("cid"))
        .join(spark.table(s"${annName}_centroids").select(col("cid"))
          .withColumn("k", lit(1)), Seq("cid"), "left")
        .agg((max(col("n")) === lit(1L) &&
          sum(when(col("k").isNull, 1L).otherwise(0L)) === lit(0L))
          .as("consistent")))

    // lex surfaces: docs with ≥1 token are the population the index holds
    val tokenful = docs.select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tok"))
      .filter(col("n_tok") >= 1)
    val dl = spark.table(s"${lexName}_dl")
    val postings = spark.table(s"${lexName}_postings")
    val lexDl = row(spark, "lex_dl",
      idsMatch(dl, tokenful, "doc_id"),
      // stored length equals the recomputed token count, doc-for-doc
      dl.join(tokenful, Seq("doc_id"), "full_outer")
        .agg((sum(when(col("dl") <=> col("n_tok"), 0L).otherwise(1L))
          === lit(0L)).as("consistent")))
    val lexPostings = row(spark, "lex_postings",
      idsMatch(postings, tokenful, "doc_id"),
      // per-doc posting mass equals the stored doc length
      postings.groupBy(col("doc_id")).agg(sum(col("tf")).as("mass"))
        .join(dl, Seq("doc_id"), "full_outer")
        .agg((sum(when(col("mass") <=> col("dl"), 0L).otherwise(1L))
          === lit(0L)).as("consistent")))
    val lexStats = row(spark, "lex_stats",
      // the delta log's totals equal the doc-length table it summarizes
      spark.table(s"${lexName}_stats")
        .agg(sum(col("n_docs")).as("sn"), sum(col("sum_dl")).as("sd"))
        .crossJoin(dl.agg(count(lit(1)).as("cn"), sum(col("dl")).as("cd")))
        .agg((max(col("sn")) === max(col("cn")) &&
          max(col("sd")) === max(col("cd"))).as("complete")),
      spark.range(1).select(lit(true).as("consistent")))

    dedupSigs.unionByName(dedupBands).unionByName(annCells)
      .unionByName(lexDl).unionByName(lexPostings).unionByName(lexStats)
      .orderBy(col("surface"))
  }
}
