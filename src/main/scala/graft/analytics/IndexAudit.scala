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

  // Shared gate inputs (round-9 VERDICT item 4): q212 and q216 each build
  // the full index trio, and the expensive passes — MinHash signatures,
  // the postings/dl explode, centroid training + cell assignment — are
  // identical between them while independent-BUILD semantics are not what
  // either gate tests (q212 audits invariants, q216 proves forgetting).
  // Memoized once per session (SessionMemo, charged in Bench's
  // q00_shared_build like every other shared table); each gate still
  // writes its OWN tables, so q216's deletes and purges can never touch
  // q212's audited copies, and either gate alone still self-contains.
  private def gateDocs(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir).select(col("doc_id"), col("text"))
  private def gateVecs(spark: SparkSession, dir: String): DataFrame =
    embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
  private def sigsMemo(spark: SparkSession, dir: String): DataFrame =
    graft.functions.SessionMemo(spark, s"indexgate.sigs:$dir")(
      DedupIndex.sigsOf(gateDocs(spark, dir)))
  private def postingsMemo(spark: SparkSession, dir: String): DataFrame =
    graft.functions.SessionMemo(spark, s"indexgate.postings:$dir")(
      LexIndex.postingsOf(gateDocs(spark, dir)))
  private def dlMemo(spark: SparkSession, dir: String): DataFrame =
    graft.functions.SessionMemo(spark, s"indexgate.dl:$dir")(
      LexIndex.dlOf(gateDocs(spark, dir)))
  private def centroidsMemo(spark: SparkSession, dir: String): DataFrame =
    graft.functions.SessionMemo(spark, s"indexgate.centroids:$dir")(
      Similarity.trainCentroidsOn(gateVecs(spark, dir), numCentroids = 8))
  private def cellsMemo(spark: SparkSession, dir: String): DataFrame =
    graft.functions.SessionMemo(spark, s"indexgate.cells:$dir")(
      Similarity.assignCellsOn(gateVecs(spark, dir), centroidsMemo(spark, dir)))

  /** Eagerly build the shared gate inputs — Bench calls this inside
    * q00_shared_build so the shared cost stays visible in the total. */
  def warmGateInputs(spark: SparkSession, dir: String): Unit = {
    sigsMemo(spark, dir); postingsMemo(spark, dir); dlMemo(spark, dir)
    centroidsMemo(spark, dir); cellsMemo(spark, dir)
  }

  /** With the memo OFF (A/B mode) the helpers hand back raw lazy frames;
    * the buildFrom* sinks consume them from two branches each, so cut
    * lineage here — with the memo ON the frames are already
    * materialized and this is the identity. */
  private def snap(spark: SparkSession, df: org.apache.spark.sql.DataFrame) =
    if (!graft.functions.SessionMemo.enabled(spark))
      graft.functions.Materialize(df)
    else df

  private def buildTrio(spark: SparkSession, dir: String, prefix: String,
      buckets: Int): Unit = {
    DedupIndex.buildFromSigs(snap(spark, sigsMemo(spark, dir)),
      s"${prefix}_dd", buckets)
    LexIndex.buildFrom(snap(spark, postingsMemo(spark, dir)),
      snap(spark, dlMemo(spark, dir)), s"${prefix}_lx", buckets)
    AnnIndex.buildFrom(gateVecs(spark, dir),
      snap(spark, centroidsMemo(spark, dir)),
      snap(spark, cellsMemo(spark, dir)), s"${prefix}_an")
  }

  def auditGate(spark: SparkSession, dir: String): DataFrame = {
    val docs = gateDocs(spark, dir)
    val vecs = gateVecs(spark, dir)
    buildTrio(spark, dir, "graft_audit", buckets = 8)
    audit(spark, docs, vecs, "graft_audit_dd", "graft_audit_lx",
      "graft_audit_an")
  }

  /** q216: the COMPLIANCE REPORT — what a deletion request's owner actually
    * gets back: for one retention decision (here: every content-bucket-<15
    * document, with vectors linked by the vec_id == doc_id convention),
    * propagate through every surface (tombstones → physical purges), then
    * PROVE the forgetting per surface by scanning the raw index tables for
    * the ids: how many rows the surface held before (`n_before` — stated by
    * the oracle from the corpus, so a delete that silently targeted
    * nothing cannot pass), how many remain (must be 0), and that the
    * tombstone logs themselves are gone (`log_cleared` — the log is also
    * personal data). The raw-table scans bypass the merge-on-read filters
    * on purpose: this report is about bytes at rest, not query answers. */
  def forgetGate(spark: SparkSession, dir: String): DataFrame = {
    val docs = gateDocs(spark, dir)
    // fresh MUTABLE copies from the shared inputs: this gate deletes,
    // purges and drops logs — none of which can be allowed to reach the
    // q212 copies (hence separate tables, shared compute only)
    buildTrio(spark, dir, "graft_forget", buckets = 4)
    val gone = graft.functions.Materialize(
      docs.filter(Sampling.contentBucket(col("text")) < 15).select(col("doc_id")))
    DedupIndex.delete(gone, "graft_forget_dd")
    LexIndex.delete(gone, "graft_forget_lx")
    AnnIndex.delete(gone.select(col("doc_id").as("vec_id")), "graft_forget_an")
    val before = Map(
      "dedup_sigs" -> held(spark, "graft_forget_dd_sigs", "doc_id", gone),
      "dedup_bands" -> held(spark, "graft_forget_dd_bands", "doc_id", gone),
      "lex_postings" -> held(spark, "graft_forget_lx_postings", "doc_id", gone),
      "lex_dl" -> held(spark, "graft_forget_lx_dl", "doc_id", gone),
      "ann_cells" -> held(spark, "graft_forget_an_cells", "vec_id",
        gone.select(col("doc_id").as("vec_id"))))
    DedupIndex.compact(spark, "graft_forget_dd")
    LexIndex.compact(spark, "graft_forget_lx")
    AnnIndex.purgeTombstones(spark, "graft_forget_an")
    val logsGone =
      !spark.catalog.tableExists(graft.sink.Tombstones.tableOf("graft_forget_dd")) &&
      !spark.catalog.tableExists(graft.sink.Tombstones.tableOf("graft_forget_lx")) &&
      !spark.catalog.tableExists(graft.sink.Tombstones.tableOf("graft_forget_an"))
    import spark.implicits._
    before.toSeq.map { case (surface, nBefore) =>
      val key = if (surface == "ann_cells") "vec_id" else "doc_id"
      val ids = if (surface == "ann_cells")
        gone.select(col("doc_id").as("vec_id")) else gone
      val remaining = held(spark, s"graft_forget_${tableOf(surface)}", key, ids)
      (surface, nBefore, remaining, remaining == 0L, logsGone)
    }.toDF("surface", "n_before", "n_remaining", "forgotten", "log_cleared")
      .orderBy(col("surface"))
  }

  private def tableOf(surface: String): String = surface match {
    case "dedup_sigs" => "dd_sigs"
    case "dedup_bands" => "dd_bands"
    case "lex_postings" => "lx_postings"
    case "lex_dl" => "lx_dl"
    case "ann_cells" => "an_cells"
  }

  /** Distinct ids of `ids` physically present in `table` — a raw scan of
    * the managed location, deliberately NOT `spark.table` (the report must
    * see bytes at rest, not the merge-on-read view). */
  private def held(spark: SparkSession, table: String, key: String,
      ids: DataFrame): Long = {
    val loc = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table)).location
    // semi-join BEFORE distinct: the broadcast hash filter prunes inside
    // the scan stage, so the distinct shuffles only the matching rows
    // (the deletion batch's share), never the whole surface
    spark.read.parquet(loc.toString).select(col(key))
      .join(org.apache.spark.sql.functions.broadcast(ids), Seq(key), "left_semi")
      .distinct().count()
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
