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
    pristineTrio(spark, dir)
  }

  /** q212's audited trio, built ONCE per session (round-10 VERDICT item
    * 4 extends the shared-input rule to the whole pristine build: q212
    * only READS these tables, so independent-build semantics are not
    * what it tests — q216 still builds its own mutable copy). The memo
    * holds a marker frame; the side effect is the build. Bench charges
    * it in q00_shared_build; run alone, the first q212 call pays it. */
  private def pristineTrio(spark: SparkSession, dir: String): Unit =
    graft.functions.SessionMemo(spark, s"indexgate.trio:$dir") {
      buildTrio(spark, dir, "graft_audit", buckets = 8)
      spark.range(1).toDF("built")
    }

  /** With the memo OFF (A/B mode) the helpers hand back raw lazy frames;
    * the buildFrom* sinks consume them from two branches each, so cut
    * lineage here — with the memo ON the frames are already
    * materialized and this is the identity. */
  private def snap(spark: SparkSession, df: org.apache.spark.sql.DataFrame) =
    if (!graft.functions.SessionMemo.enabled(spark))
      graft.functions.Materialize(df)
    else df

  /** `slice` (key-column → predicate) restricts a build to an id-defined
    * corpus subset WITHOUT forking the session-shared input memos: the
    * filter sits on top of the materialized frames. q216 builds its
    * mutable trio over a deterministic 40% slice (doc_id % 5 < 2) — the
    * forget verbs are identical on any slice, and an id rule (unlike a
    * content-hash rule) stays computable on every id-keyed frame. The
    * quantizer deliberately stays full-corpus (a slice's index reusing a
    * corpus-trained quantizer is the production shape anyway). */
  private def buildTrio(spark: SparkSession, dir: String, prefix: String,
      buckets: Int,
      slice: Option[String => org.apache.spark.sql.Column] = None): Unit = {
    def sl(df: DataFrame, key: String): DataFrame =
      slice.map(p => df.filter(p(key))).getOrElse(df)
    // memo frames resolve BEFORE the fan-out (SessionMemo's build is not
    // re-entrant across threads for the same key), then the three
    // families' table writes run concurrently — disjoint tables
    val sigs = snap(spark, sl(sigsMemo(spark, dir), "doc_id"))
    val postings = snap(spark, sl(postingsMemo(spark, dir), "doc_id"))
    val dl = snap(spark, sl(dlMemo(spark, dir), "doc_id"))
    val cents = snap(spark, centroidsMemo(spark, dir))
    val cells = snap(spark, sl(cellsMemo(spark, dir), "vec_id"))
    val vecs = sl(gateVecs(spark, dir), "vec_id")
    inParallel(Seq(
      () => DedupIndex.buildFromSigs(sigs, s"${prefix}_dd", buckets),
      () => LexIndex.buildFrom(postings, dl, s"${prefix}_lx", buckets),
      () => AnnIndex.buildFrom(vecs, cents, cells, s"${prefix}_an")))
  }

  /** Fan independent per-family maintenance legs onto their own driver
    * threads (fresh pool per call — threads are created on the CALLER's
    * thread, so an armed CrashPoints budget would be inherited by design,
    * and production threads stay a no-op). Spark's scheduler interleaves
    * the three families' jobs across the same executors. */
  private def inParallel(bodies: Seq[() => Unit]): Unit = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(bodies.size)
    implicit val ec: scala.concurrent.ExecutionContextExecutorService =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(
        bodies.map(b => scala.concurrent.Future(b()))),
      scala.concurrent.duration.Duration.Inf)
    finally pool.shutdown()
  }

  def auditGate(spark: SparkSession, dir: String): DataFrame = {
    val docs = gateDocs(spark, dir)
    val vecs = gateVecs(spark, dir)
    pristineTrio(spark, dir)
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
    // fresh MUTABLE copies from the shared inputs: this gate deletes,
    // purges and drops logs — none of which can be allowed to reach the
    // q212 copies (hence separate tables, shared compute only). The
    // corpus is the deterministic doc_id % 5 < 2 slice (the q227/q228
    // cost discipline — the forget verbs are identical on any slice)
    val docs = gateDocs(spark, dir).filter(col("doc_id") % 5 < 2)
    buildTrio(spark, dir, "graft_forget", buckets = 4,
      slice = Some(k => col(k) % 5 < 2))
    val gone = graft.functions.Materialize(
      docs.filter(Sampling.contentBucket(col("text")) < 15).select(col("doc_id")))
    // the three families are INDEPENDENT surfaces (disjoint tables,
    // separate tombstone logs): their request legs and purge legs fan out
    // on driver threads exactly as a production compliance job would —
    // the gate's wall was otherwise ~30 back-to-back driver-synchronous
    // jobs whose latency, not volume, set the cost (a corpus slice
    // changed nothing)
    inParallel(Seq(
      () => DedupIndex.delete(gone, "graft_forget_dd"),
      () => LexIndex.delete(gone, "graft_forget_lx"),
      () => AnnIndex.delete(gone.select(col("doc_id").as("vec_id")),
        "graft_forget_an")))
    val surfaces = Seq(
      ("dedup_sigs", "graft_forget_dd_sigs", "doc_id"),
      ("dedup_bands", "graft_forget_dd_bands", "doc_id"),
      ("lex_postings", "graft_forget_lx_postings", "doc_id"),
      ("lex_dl", "graft_forget_lx_dl", "doc_id"),
      ("ann_cells", "graft_forget_an_cells", "vec_id"))
    val before = heldAll(spark, surfaces, gone)
    inParallel(Seq(
      () => DedupIndex.compact(spark, "graft_forget_dd"),
      () => LexIndex.compact(spark, "graft_forget_lx"),
      () => AnnIndex.purgeTombstones(spark, "graft_forget_an")))
    val remaining = heldAll(spark, surfaces, gone)
    val logsGone =
      !spark.catalog.tableExists(graft.sink.Tombstones.tableOf("graft_forget_dd")) &&
      !spark.catalog.tableExists(graft.sink.Tombstones.tableOf("graft_forget_lx")) &&
      !spark.catalog.tableExists(graft.sink.Tombstones.tableOf("graft_forget_an"))
    import spark.implicits._
    surfaces.map { case (surface, _, _) =>
      val (nBefore, nLeft) = (before(surface), remaining(surface))
      (surface, nBefore, nLeft, nLeft == 0L, logsGone)
    }.toDF("surface", "n_before", "n_remaining", "forgotten", "log_cleared")
      .orderBy(col("surface"))
  }

  /** Distinct ids of `gone` physically present per surface — raw scans of
    * the managed locations, deliberately NOT `spark.table` (the report
    * must see bytes at rest, not the merge-on-read view). All five
    * surfaces count in ONE union-all job (they were one count job EACH
    * until round 11 — ten sequential scans of driver latency for a
    * five-row report): each leg semi-joins the broadcast deletion batch
    * BEFORE the distinct, so the shuffle carries only the batch's share
    * of each surface, never whole tables. */
  private def heldAll(spark: SparkSession,
      surfaces: Seq[(String, String, String)], gone: DataFrame): Map[String, Long] = {
    val legs = surfaces.map { case (surface, table, key) =>
      val loc = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table)).location
      spark.read.parquet(loc.toString).select(col(key).as("k"))
        .join(org.apache.spark.sql.functions.broadcast(
          gone.select(col("doc_id").as("k"))), Seq("k"), "left_semi")
        .select(lit(surface).as("surface"), col("k"))
    }
    val counted = legs.reduce(_ unionByName _)
      .groupBy(col("surface")).agg(countDistinct(col("k")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    surfaces.map { case (s, _, _) => s -> counted.getOrElse(s, 0L) }.toMap
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
