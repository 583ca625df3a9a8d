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
      // derived from the postings memo (dl = Σ tf per doc, value-identical
      // to dlOf) — the shared inputs then pay ONE tokenize pass, not two
      LexIndex.dlFromPostings(postingsMemo(spark, dir)))
  private def centroidsMemo(spark: SparkSession, dir: String): DataFrame =
    graft.functions.SessionMemo(spark, s"indexgate.centroids:$dir")(
      Similarity.trainCentroidsOn(gateVecs(spark, dir), numCentroids = 8))
  private def cellsMemo(spark: SparkSession, dir: String): DataFrame =
    graft.functions.SessionMemo(spark, s"indexgate.cells:$dir")(
      Similarity.assignCellsOn(gateVecs(spark, dir), centroidsMemo(spark, dir)))

  /** Eagerly build the shared gate INPUT memos — independent computations
    * (signatures, postings, doc lengths, centroids→cells) fanned on
    * driver threads; distinct SessionMemo keys, so concurrent builds
    * never collide (the cells leg builds centroids first on its own
    * thread — same-thread recursion, allowed). */
  def warmSharedInputs(spark: SparkSession, dir: String): Unit =
    graft.functions.Par.inParallel(Seq(
      () => sigsMemo(spark, dir),
      // dl now derives from postings — build them on ONE leg, in order,
      // so the two threads never race the postings memo key
      () => { postingsMemo(spark, dir); dlMemo(spark, dir) },
      () => cellsMemo(spark, dir)))

  /** Eagerly build the shared gate inputs — Bench calls this inside
    * q00_shared_build so the shared cost stays visible in the total. */
  def warmGateInputs(spark: SparkSession, dir: String): Unit = {
    warmSharedInputs(spark, dir)
    pristineTrio(spark, dir)
  }

  /** The q212 pristine build alone — for callers that warmed the inputs
    * themselves (Bench's fanned q00). */
  def warmPristineTrio(spark: SparkSession, dir: String): Unit =
    pristineTrio(spark, dir)

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
    * mutable trio over a deterministic 20% slice (doc_id % 10 < 2) — the
    * forget verbs are identical on any slice, and an id rule (unlike a
    * content-hash rule) stays computable on every id-keyed frame. The
    * quantizer deliberately stays full-corpus (a slice's index reusing a
    * corpus-trained quantizer is the production shape anyway). */
  private def buildTrio(spark: SparkSession, dir: String, prefix: String,
      buckets: Int,
      slice: Option[String => org.apache.spark.sql.Column] = None,
      clustered: Boolean = false,
      graphVecs: Option[DataFrame] = None): Unit =
    inParallel(trioLegs(spark, dir, prefix, buckets, slice, clustered,
      graphVecs).flatMap(_._2).toSeq)

  /** The trio's build work as PER-FAMILY leg groups — [[buildTrio]] fans
    * them all behind one barrier (q212's pristine build), while q216's
    * forget gate threads each family's build into that family's own
    * delete→purge→count pipeline (no global build barrier). */
  private def trioLegs(spark: SparkSession, dir: String, prefix: String,
      buckets: Int,
      slice: Option[String => org.apache.spark.sql.Column] = None,
      clustered: Boolean = false,
      graphVecs: Option[DataFrame] = None): Map[String, Seq[() => Unit]] = {
    def sl(df: DataFrame, key: String): DataFrame =
      slice.map(p => df.filter(p(key))).getOrElse(df)
    // memo frames resolve BEFORE the fan-out (SessionMemo's build is not
    // re-entrant across threads for the same key), then the families'
    // table writes run concurrently — disjoint tables
    val sigs = snap(spark, sl(sigsMemo(spark, dir), "doc_id"))
    val postings = snap(spark, sl(postingsMemo(spark, dir), "doc_id"))
    val dl = snap(spark, sl(dlMemo(spark, dir), "doc_id"))
    val cents = snap(spark, centroidsMemo(spark, dir))
    val cells = snap(spark, sl(cellsMemo(spark, dir), "vec_id"))
    val vecs = sl(gateVecs(spark, dir), "vec_id")
    // optional fourth/fifth families (q216 only — q212's pristine trio
    // audits the three-table reconciliation contract unchanged): the
    // cluster surface promotes the dedup family via buildClusterTables
    // (its own shingle pass on the slice — not memo-shared, the sigs memo
    // holds signatures, not shingles), the graph family builds over a
    // bounded vector slice (NN-Descent cost is the gate's, not shared)
    val cluLeg: Seq[() => Unit] =
      if (!clustered) Nil
      else Seq(() => DedupIndex.buildClusterTables(
        graft.functions.Materialize(sl(gateDocs(spark, dir), "doc_id")
          .select(org.apache.spark.sql.functions.col("doc_id"),
            graft.analytics.TextStats.wordShingles(
              org.apache.spark.sql.functions.col("text")).as("w"))),
        s"${prefix}_dd", buckets, threshold = 0.6, parts = buckets * 2))
    // rounds = 0 (cell-blocked init only): the forget gate tests at-rest
    // deletion, not graph quality — NN-Descent refinement is the cost of
    // a quality gate (q224-q227), not a compliance gate
    val graphLeg: Seq[() => Unit] = graphVecs.toSeq.map(gv =>
      () => AnnGraphIndex.build(gv, s"${prefix}_gx", k = 8, rounds = 0,
        numCentroids = 4, buckets = 4))
    import graft.functions.PhaseTimer.timed
    Map(
      "dd" -> (Seq(
        () => timed("trio.dd") {
          DedupIndex.buildFromSigs(sigs,
            s"${prefix}_dd", buckets, parts = buckets * 2)
          // named fault-injection seam for the forget-gate deadlock
          // regression (a dd BUILD failure must fail the gate, not hang
          // its lmcount leg); production no-op like every reached()
          graft.sink.CrashPoints.reached("trio.dd.built")
        })
        ++ cluLeg.map(l => () => timed("trio.clu")(l()))),
      "lx" -> Seq(() => timed("trio.lx")(
        LexIndex.buildFrom(postings, dl, s"${prefix}_lx", buckets))),
      "an" -> Seq(() => timed("trio.an")(
        AnnIndex.buildFrom(vecs, cents, cells, s"${prefix}_an"))),
      "gx" -> graphLeg.map(l => () => timed("trio.gx")(l())))
  }

  /** Fan independent per-family maintenance legs onto their own driver
    * threads — see [[graft.functions.Par]] (factored out in round 12 so
    * DedupIndex's disjoint-table appends share the discipline). */
  private def inParallel(bodies: Seq[() => Unit]): Unit =
    graft.functions.Par.inParallel(bodies)

  def auditGate(spark: SparkSession, dir: String): DataFrame = {
    val docs = gateDocs(spark, dir)
    val vecs = gateVecs(spark, dir)
    pristineTrio(spark, dir)
    audit(spark, docs, vecs, "graft_audit_dd", "graft_audit_lx",
      "graft_audit_an")
  }

  /** q216: the COMPLIANCE REPORT — what a deletion request's owner actually
    * gets back: for one retention decision (every content-bucket-<15
    * document of the slice, plus doc 0 — see below; vectors linked by the
    * vec_id == doc_id convention), propagate through every surface the
    * corpus service maintains (tombstones → repairs → physical purges),
    * then PROVE the forgetting per surface by scanning the raw index
    * tables for the ids. ALL FIVE persisted families are swept (round-11
    * VERDICT item 1): dedup sigs/bands, the cluster map's four tables, lex
    * postings/dl, ann cells, and the graph index's edges (either
    * endpoint), vectors and entry reps — 12 surfaces.
    *
    * Per surface: `n_before` (rows at rest after the deletes, before the
    * purges) is stated by the oracle in closed form wherever the surface
    * holds every doc/vector STRUCTURALLY (10 of 12 — a delete that
    * silently targeted nothing cannot pass); for the two
    * reference-holding surfaces it is NULL (graph_entries holds only
    * per-cell rep ids; the label map holds only merged former roots,
    * which this build-then-delete lifecycle never creates — and the
    * delete's own repair already drops a gone doc's entries, spec-pinned
    * in DedupIndexSpec with an engineered merge). `held_before` is the
    * boolean form: TRUE everywhere provable — including graph_entries,
    * because the deletion set is engineered to contain doc/vec 0, the
    * global minimum of the vector slice and therefore the rep of its own
    * cell. `n_remaining` must be 0 on all 12, and the tombstone logs
    * themselves must be gone (`log_cleared` — the log is also personal
    * data). The raw-table scans bypass the merge-on-read filters on
    * purpose: this report is about bytes at rest, not query answers. */
  def forgetGate(spark: SparkSession, dir: String): DataFrame = {
    // fresh MUTABLE copies from the shared inputs: this gate deletes,
    // purges and drops logs — none of which can be allowed to reach the
    // q212 copies (hence separate tables, shared compute only). The
    // corpus is the deterministic doc_id % 5 < 2 slice (the q227/q228
    // cost discipline — the forget verbs are identical on any slice);
    // the graph family's vector slice is additionally bounded
    // (vec_id < 1250): its build pays NN-Descent, a gate-local cost
    val docs = gateDocs(spark, dir).filter(col("doc_id") % 10 < 2)
    val gvecs = gateVecs(spark, dir)
      .filter(col("vec_id") % 10 < 2 && col("vec_id") < 1250)
    val buildLegs = trioLegs(spark, dir, "graft_forget", buckets = 4,
      slice = Some(k => col(k) % 10 < 2), clustered = true,
      graphVecs = Some(gvecs))
    val gone = graft.functions.Materialize(
      docs.filter(Sampling.contentBucket(col("text")) < 15 ||
          col("doc_id") === 0L)
        .select(col("doc_id")))
    // the families are INDEPENDENT surfaces (disjoint tables, separate
    // tombstone logs): their request legs and purge legs fan out on
    // driver threads exactly as a production compliance job would — the
    // gate's wall is otherwise back-to-back driver-synchronous jobs whose
    // latency, not volume, sets the cost. The dedup leg's delete also
    // repairs the cluster map (split/orphan semantics ride the delete).
    def byId(idCol: String): DataFrame => DataFrame =
      df => df.select(col(idCol).as("k"))
    def byBoth(a: String, b: String): DataFrame => DataFrame =
      df => df.select(explode(array(col(a), col(b))).as("k"))
    val surfaces: Seq[(String, String, DataFrame => DataFrame)] = Seq(
      ("ann_cells", "graft_forget_an_cells", byId("vec_id")),
      ("clu_clusters", "graft_forget_dd_clusters", byId("doc_id")),
      ("clu_labelmap", "graft_forget_dd_labelmap",
        byBoth("old_label", "new_label")),
      ("clu_pfx", "graft_forget_dd_pfx", byId("doc_id")),
      ("clu_shg", "graft_forget_dd_shg", byId("doc_id")),
      ("dedup_bands", "graft_forget_dd_bands", byId("doc_id")),
      ("dedup_sigs", "graft_forget_dd_sigs", byId("doc_id")),
      ("graph_edges", "graft_forget_gx_edges", byBoth("src", "dst")),
      ("graph_entries", "graft_forget_gx_entries", byId("rep")),
      ("graph_vectors", "graft_forget_gx_vectors", byId("vec_id")),
      ("lex_dl", "graft_forget_lx_dl", byId("doc_id")),
      ("lex_postings", "graft_forget_lx_postings", byId("doc_id")))
    // PER-FAMILY pipelines instead of global delete→purge barriers
    // (round-12 VERDICT item 4 — the gate is latency-bound, and a global
    // barrier makes every family wait for the slowest family TWICE):
    // each family runs delete → purge → its own remaining-counts on one
    // driver thread, gated only by the dependencies the semantics
    // actually have:
    //  - the before-counts leg rides WITH the deletes (tombstone appends
    //    plus a cluster repair that only adds rows for RETAINED docs — no
    //    surface's gone-id presence changes before the purges), but every
    //    PURGE must wait for it (a purge removes the bytes being counted);
    //  - the label map is the exception (round-12 finding: the repair
    //    REPLACES `_labelmap`, so a concurrent raw read can hit the
    //    drop→rename window — a transient TABLE_NOT_FOUND under load):
    //    its count runs after the dedup family's delete, and only the
    //    dedup purge waits for it;
    //  - remaining-counts are per-family, right after that family's
    //    purge — four small concurrent union jobs instead of a fifth
    //    serial phase (each still one job over its own surfaces).
    // Latches count down in `finally` so a failing leg can never deadlock
    // the others (Par is fail-slow; a leg that proceeds past a failed
    // dependency fails on its own and the first failure rethrows).
    val overlapped = surfaces.filterNot(_._1 == "clu_labelmap")
    val buildsDone = new java.util.concurrent.CountDownLatch(4)
    val countsDone = new java.util.concurrent.CountDownLatch(1)
    val ddDeleteDone = new java.util.concurrent.CountDownLatch(1)
    val labelmapDone = new java.util.concurrent.CountDownLatch(1)
    val beforeRef = new java.util.concurrent.atomic.AtomicReference(
      Map.empty[String, Long])
    val lmRef = new java.util.concurrent.atomic.AtomicReference(
      Map.empty[String, Long])
    val remainRef = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    import graft.functions.PhaseTimer.timed
    def family(fam: String, del: () => Unit, purge: () => Unit,
        isDd: Boolean): () => Unit = () => timed(s"q216.fam.$fam") {
      // the family's own BUILD heads its pipeline (no global build
      // barrier — only the before-counts leg needs every table to exist).
      // ddDeleteDone's finally covers the WHOLE build→delete prefix: a
      // build failure that never reaches del() must still release the
      // lmcount leg, or a failed dd build deadlocks the gate (the other
      // latches only guard legs that already own them in finally).
      try {
        try inParallel(buildLegs(fam)) finally buildsDone.countDown()
        del()
      } finally if (isDd) ddDeleteDone.countDown()
      countsDone.await()
      if (isDd) labelmapDone.await()
      purge()
      val famSurfaces = surfaces.filter(_._2.startsWith(s"graft_forget_$fam"))
      heldAll(spark, famSurfaces, gone).foreach { case (k, v) =>
        remainRef.put(k, v) }
    }
    inParallel(Seq(
      family("dd", () => DedupIndex.delete(gone, "graft_forget_dd"),
        () => DedupIndex.compact(spark, "graft_forget_dd"), isDd = true),
      family("lx", () => LexIndex.delete(gone, "graft_forget_lx"),
        () => LexIndex.compact(spark, "graft_forget_lx"), isDd = false),
      family("an", () => AnnIndex.delete(
          gone.select(col("doc_id").as("vec_id")), "graft_forget_an"),
        () => AnnIndex.purgeTombstones(spark, "graft_forget_an"),
        isDd = false),
      family("gx", () => AnnGraphIndex.delete(
          gone.select(col("doc_id").as("vec_id")), "graft_forget_gx"),
        () => AnnGraphIndex.compact(spark, "graft_forget_gx"), isDd = false),
      () => timed("q216.counts") {
        // raw-location scans need every family's tables to exist first
        buildsDone.await()
        try beforeRef.set(heldAll(spark, overlapped, gone))
        finally countsDone.countDown()
      },
      () => timed("q216.lmcount") {
        ddDeleteDone.await()
        try lmRef.set(heldAll(spark,
          surfaces.filter(_._1 == "clu_labelmap"), gone))
        finally labelmapDone.countDown()
      }))
    val before: Map[String, Long] = beforeRef.get ++ lmRef.get
    val remaining: Map[String, Long] = {
      import scala.jdk.CollectionConverters._
      remainRef.asScala.toMap
    }
    val logsGone = Seq("dd", "lx", "an", "gx").forall(f =>
      !spark.catalog.tableExists(
        graft.sink.Tombstones.tableOf(s"graft_forget_$f")))
    // n_before is stated only for the structural surfaces (see scaladoc);
    // the boolean held_before carries the targeted-something proof on the
    // reference surfaces
    val referenceOnly = Set("graph_entries", "clu_labelmap")
    import spark.implicits._
    surfaces.map { case (surface, _, _) =>
      val (nBefore, nLeft) = (before(surface), remaining(surface))
      (surface,
        if (referenceOnly(surface)) None else Some(nBefore),
        nBefore > 0, nLeft, nLeft == 0L, logsGone)
    }.toDF("surface", "n_before", "held_before", "n_remaining",
        "forgotten", "log_cleared")
      .orderBy(col("surface"))
  }

  /** Distinct ids of `gone` physically present per surface — raw scans of
    * the managed locations, deliberately NOT `spark.table` (the report
    * must see bytes at rest, not the merge-on-read view). All surfaces
    * count in ONE union-all job (round-11 discipline — one count job EACH
    * is sequential driver latency for a 12-row report): each leg projects
    * its id column(s) to a shared `k`, semi-joins the broadcast deletion
    * batch BEFORE the distinct, so the shuffle carries only the batch's
    * share of each surface, never whole tables. */
  private def heldAll(spark: SparkSession,
      surfaces: Seq[(String, String, DataFrame => DataFrame)],
      gone: DataFrame): Map[String, Long] = {
    val legs = surfaces.map { case (surface, table, keyOf) =>
      val loc = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table)).location
      keyOf(spark.read.parquet(loc.toString))
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

    // lex surfaces: docs with ≥1 token are the population the index holds.
    // Materialized — three audit branches consume it (both id
    // reconciliations and the dl consistency join), and each would
    // otherwise re-tokenize the corpus (guide §1.2)
    val tokenful = graft.functions.Materialize(docs.select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tok"))
      .filter(col("n_tok") >= 1))
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
