package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Materialize
import graft.functions.VectorOps._
import graft.sink.{Bucketed, ManagedPaths, TableSwap, Tombstones}

/** PERSISTED graph-ANN index — the serving tier for [[AnnGraph]]'s
  * NN-Descent k-NN graph, with the same lifecycle verbs as the other two
  * persisted index families ([[AnnIndex]] cells, [[LexIndex]] postings):
  * build / serve / delete (merge-on-read) / purge-on-compact / generation
  * swap.
  *
  * Layout (all managed parquet):
  *  - `{name}_edges`   (src, dst, sim) — the SYMMETRIZED graph, bucketed
  *    by src: a serving hop probes it with the broadcast frontier, so the
  *    index side never shuffles and (at warehouse scale) only the
  *    frontier's buckets are opened.
  *  - `{name}_vectors` (vec_id, v, cid) — bucketed by vec_id: candidate
  *    scoring and the final re-rank fetch vectors by broadcast id probe.
  *  - `{name}_entries` (cid, cv, rep) — one row per cell: the centroid
  *    vector plus the cell's smallest-id member, the per-query IVF-guided
  *    entry points ([[AnnGraph.ivfEntriesOn]] persisted).
  *
  * Symmetrization is a BUILD-time decision here (the in-memory
  * [[AnnGraph.searchOn]] symmetrizes per search): serving then needs one
  * bucketed probe per hop instead of a union of two directions, and the
  * stored graph's degree bound is 2k, not k.
  *
  * Deletion semantics (merge-on-read): a delete appends ids to the
  * tombstone log and touches no index table. Serving inner-joins every
  * candidate through the tombstone-filtered vectors table, so a deleted
  * vector can never be RETURNED — but edges through it also stop
  * expanding (its row never re-enters the frontier), so heavy pending
  * deletion degrades graph connectivity (recall), never correctness;
  * the physical purge at [[compact]] rewrites both bucketed tables
  * without the tombstoned endpoints and re-derives each cell's entry rep
  * from the retained members. That trade is the right one at 100 TB: a
  * vector's edges live in up to 2k src-buckets, so a per-request
  * physical rewrite would touch the whole table.
  */
object AnnGraphIndex {

  private val Suffixes = Seq("_edges", "_vectors", "_entries")

  /** Build (or rebuild) the index over a corpus of (vec_id, v). */
  def build(vecs: DataFrame, name: String, k: Int = 8, rounds: Int = 2,
      numCentroids: Int = 16, buckets: Int = 32): Unit = {
    val spark = vecs.sparkSession
    val ids = vecs.select(col("vec_id"), col("v"))
    val cents = Materialize(Similarity.trainCentroidsOn(ids, numCentroids))
    val cells = Materialize(Similarity.assignCellsOn(ids, cents))
    val g = AnnGraph.buildGraphFromCells(cells, k, rounds)
    val und = g.unionByName(
        g.select(col("dst").as("src"), col("src").as("dst"), col("sim")))
      .groupBy(col("src"), col("dst")).agg(max(col("sim")).as("sim"))
    Bucketed.writeBucketed(und, s"${name}_edges", "src", buckets)
    Bucketed.writeBucketed(cells.select(col("vec_id"), col("v"), col("cid")),
      s"${name}_vectors", "vec_id", buckets)
    writeEntries(spark, name,
      cents.join(cells.groupBy(col("cid")).agg(min(col("vec_id")).as("rep")),
        Seq("cid")))
    Tombstones.clear(spark, name) // a rebuild has nothing to forget
  }

  /** The entries rewrite rides the staging-rename like every other table
    * replacement here — a bare DROP-then-write would lose the table to a
    * crash in the gap, and `_entries` is load-bearing for every serve
    * (entry points) and every [[extend]] (the stored quantizer). */
  private def writeEntries(spark: SparkSession, name: String,
      entries: DataFrame): Unit =
    Bucketed.replaceTable(spark, s"${name}_entries", staging =>
      entries.write.format("parquet").saveAsTable(staging))

  /** DELETE vectors — merge-on-read: O(batch) log append, no table
    * touched; [[topKAgainst]] filters from the next query on, the
    * physical purge rides [[compact]]. */
  def delete(ids: DataFrame, name: String): Unit =
    Tombstones.append(ids.select(col("vec_id")), name, "vec_id")

  /** Append a new batch of vectors into the existing graph — the
    * incremental graph-ANN insert, batched: each new vector's neighbor
    * list comes from (a) the index's own serving path (beam search with
    * the batch as the query set — the standard insert-by-search) unioned
    * with (b) same-cell pairs WITHIN the batch (two fresh near-dups must
    * link even though neither is indexed yet); the kept top-k edges append
    * to `_edges` in BOTH directions, so existing nodes immediately gain
    * reverse edges into the new vectors and serving reaches them with no
    * rebuild. Degree of old nodes grows past 2k as batches accrue — a
    * deliberate HNSW-style trade; the next full rebuild + [[swapIn]]
    * re-normalizes (and [[compact]] keeps the file counts flat
    * meanwhile). Cell reps in `_entries` stay as built: entry points only
    * need to EXIST, and extends never remove rows.
    *
    * Replay safety (the DedupIndexStream discipline): a crash between
    * this append and its stream marker can duplicate rows; serving
    * tolerates duplicates (the hop-loop groupBy dedups (query, neighbor)
    * before every rank), so at-least-once replay degrades nothing. */
  def extend(newVecs: DataFrame, name: String, k: Int = 8): Unit = {
    val spark = newVecs.sparkSession
    healedTables(spark, name)
    val ids = Materialize(newVecs.select(col("vec_id"), col("v")))
    val cents = spark.table(s"${name}_entries")
      .select(col("cid"), col("cv"))
    val assigned = Materialize(Similarity.assignCellsOn(ids, cents))
    // full-precision sims on BOTH legs (round-10 ADVICE): build/refresh
    // store unrounded cosines, and compact's max(sim) dedup would silently
    // prefer an unrounded weight over a rounded one for the same logical
    // edge on near-ties — rounding belongs at the serving output boundary
    // (topKAgainst's final select), never at rest
    val served = topKRawAgainst(spark, name,
      ids.select(col("vec_id").as("query_id"), col("v").as("qv")), k)
      .select(col("query_id").as("src"), col("neighbor_id").as("dst"),
        col("sim"))
    val a = assigned.select(col("cid"), col("vec_id").as("src"), col("v").as("sv"))
    val b = assigned.select(col("cid"), col("vec_id").as("dst"), col("v").as("dv"))
    val intra = a.join(b, Seq("cid")).filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"), cosine(col("sv"), col("dv")).as("sim"))
    val w = Window.partitionBy(col("src")).orderBy(col("sim").desc, col("dst").asc)
    val kept = Materialize(served.unionByName(intra)
      .groupBy(col("src"), col("dst")).agg(max(col("sim")).as("sim"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k).drop("rn"))
    // dedupe the bidirectional union: an intra-batch MUTUAL pair (a picks
    // b, b picks a) appears in kept both ways, so a bare union would
    // append the same (src, dst) twice
    val both = kept.unionByName(
        kept.select(col("dst").as("src"), col("src").as("dst"), col("sim")))
      .groupBy(col("src"), col("dst")).agg(max(col("sim")).as("sim"))
    val ne = bucketsOf(spark, s"${name}_edges")
    both.write.mode("append").bucketBy(ne, "src").sortBy("src")
      .format("parquet").saveAsTable(s"${name}_edges")
    val nv = bucketsOf(spark, s"${name}_vectors")
    assigned.select(col("vec_id"), col("v"), col("cid")).write.mode("append")
      .bucketBy(nv, "vec_id").sortBy("vec_id")
      .format("parquet").saveAsTable(s"${name}_vectors")
  }

  /** Beam-search serve from the persisted tables — same algorithm as
    * [[AnnGraph.searchOn]] (AnnGraphSpec pins the equivalence against the
    * in-memory path on an identical corpus): IVF-guided entries from the
    * tiny `_entries` table, then `hops` rounds of broadcast-frontier probe
    * into `_edges` + vector fetch from `_vectors`. Every index-side join
    * streams the bucketed table against a broadcast; pending deletions
    * drop out at the vector fetch (inner join through the filtered
    * table). */
  def topKAgainst(spark: SparkSession, name: String, queries: DataFrame,
      k: Int, beam: Int = 32, hops: Int = 3, nprobe: Int = 2): DataFrame =
    topKRawAgainst(spark, name, queries, k, beam, hops, nprobe)
      .select(col("query_id"), col("neighbor_id"),
        round(col("sim"), 4).as("cos_sim"), col("rn"))

  /** [[topKAgainst]] before the output-boundary rounding — [[extend]]
    * consumes this so stored edge weights stay full-precision on every
    * write path (build, refresh, extend). */
  private def topKRawAgainst(spark: SparkSession, name: String,
      queries: DataFrame, k: Int, beam: Int = 32, hops: Int = 3,
      nprobe: Int = 2): DataFrame = {
    healedTables(spark, name)
    val q = Materialize(queries.select(col("query_id"), col("qv")))
    val vectors = Tombstones.filter(
      spark.table(s"${name}_vectors")
        .select(col("vec_id").as("neighbor_id"), col("v").as("nv")),
      name, "neighbor_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    val wc = Window.partitionBy(col("query_id"))
      .orderBy(col("csim").desc, col("cid").asc)
    def score(cand: DataFrame): DataFrame = vectors
      .join(broadcast(cand.select(col("query_id"), col("neighbor_id"))),
        Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("nv")).as("sim"))
    def topBeam(scored: DataFrame): DataFrame = Materialize(
      scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= beam).drop("rn"))
    val seed = q.crossJoin(broadcast(entryPoints(spark, name)))
      .select(col("query_id"), col("cid"), col("rep"),
        cosine(col("qv"), col("cv")).as("csim"))
      .withColumn("rn", row_number().over(wc)).filter(col("rn") <= nprobe)
      .select(col("query_id"), col("rep").as("neighbor_id"))
    var bs = topBeam(score(seed))
    (1 to hops).foreach { _ =>
      val expanded = expandHopAgainst(spark, name, bs)
      bs = topBeam(bs.unionByName(score(expanded))
        .groupBy(col("query_id"), col("neighbor_id"))
        .agg(max(col("sim")).as("sim")))
    }
    bs.filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rn"))
  }

  /** Per-query entry points — `_entries` as stored, unless deletions are
    * pending: a cell rep awaiting deletion still EXISTS as an entry
    * coordinate, but [[topKAgainst]] scores seeds through the
    * tombstone-filtered vectors table, so a query whose every probed
    * cell's rep is pending deletion would get ZERO seeds and return empty
    * (not merely degraded) until compact re-derives reps (round-10
    * ADVICE). With a non-empty log, reps are filtered against it and each
    * orphaned cell falls back to its smallest RETAINED member — the same
    * rule compact's re-derivation applies, just computed merge-on-read. A
    * cell with no retained member drops out entirely (nothing to seed).
    * The fallback scan is log-gated: with no pending deletions (the
    * steady state) this is exactly the tiny `_entries` table. */
  private def entryPoints(spark: SparkSession, name: String): DataFrame = {
    val entries = spark.table(s"${name}_entries")
    if (Tombstones.of(spark, name).isEmpty) entries
    else {
      val clean = Tombstones.filter(entries, name, "rep")
      val orphaned = entries.join(clean.select(col("cid")), Seq("cid"), "left_anti")
        .select(col("cid"), col("cv"))
      val fallback = Tombstones.filter(
          spark.table(s"${name}_vectors").select(col("cid"), col("vec_id")),
          name, "vec_id")
        .join(broadcast(orphaned.select(col("cid"))), Seq("cid"))
        .groupBy(col("cid")).agg(min(col("vec_id")).as("rep"))
        .join(broadcast(orphaned), Seq("cid"))
        .select(col("cid"), col("cv"), col("rep"))
      clean.unionByName(fallback)
    }
  }

  /** One persisted-serving expansion hop, exposed for the plan pin: the
    * frontier broadcasts into the bucketed edges scan — the index side
    * never shuffles. */
  private[graft] def expandHopAgainst(spark: SparkSession, name: String,
      frontier: DataFrame): DataFrame =
    spark.table(s"${name}_edges")
      .join(broadcast(frontier.select(col("query_id"),
        col("neighbor_id").as("src"))), Seq("src"))
      .select(col("query_id"), col("dst").as("neighbor_id")).distinct()

  /** Physical purge — rewrite both bucketed tables without the tombstoned
    * endpoints (an edge dies if EITHER end is deleted), re-derive each
    * cell's entry rep from the retained members, then retire the log.
    * Both rewrites ride the crash-safe staging-rename ([[Bucketed
    * .replaceTable]]); the log clears last, so a crash anywhere replays
    * into the same end state. */
  def compact(spark: SparkSession, name: String): Unit = {
    healedTables(spark, name)
    val log = Tombstones.of(spark, name)
    def retained(df: DataFrame, idCol: String): DataFrame =
      Tombstones.filter(df, name, idCol)
    // the rewrite also collapses duplicate (src, dst) rows — the quantity
    // an at-least-once extend replay accrues (the audit's dup_edges
    // column); compaction is the documented remedy, so it must actually
    // remove them, not just re-write them
    val edges = Materialize(
      retained(retained(spark.table(s"${name}_edges"), "src"), "dst")
        .groupBy(col("src"), col("dst")).agg(max(col("sim")).as("sim")))
    val vectors = Materialize(retained(spark.table(s"${name}_vectors"), "vec_id"))
    val nb = bucketsOf(spark, s"${name}_edges")
    Bucketed.replaceTable(spark, s"${name}_edges", staging =>
      edges.repartition(nb, col("src")).write.bucketBy(nb, "src")
        .sortBy("src").format("parquet").saveAsTable(staging))
    val nv = bucketsOf(spark, s"${name}_vectors")
    Bucketed.replaceTable(spark, s"${name}_vectors", staging =>
      vectors.repartition(nv, col("vec_id")).write.bucketBy(nv, "vec_id")
        .sortBy("vec_id").format("parquet").saveAsTable(staging))
    if (log.isDefined) {
      // snapshot BEFORE writeEntries drops the table the plan reads from
      // (the drop-then-write self-reference trap — lazy plans must not
      // survive past the DROP of their own source)
      val cents = spark.table(s"${name}_entries").select(col("cid"), col("cv"))
      val newEntries = Materialize(cents.join(
        vectors.groupBy(col("cid")).agg(min(col("vec_id")).as("rep")),
        Seq("cid")))
      writeEntries(spark, name, newEntries)
      Tombstones.clear(spark, name)
    }
  }

  /** Graph-quality RENORMALIZATION — the rebuild-and-deploy loop that
    * [[extend]]'s scaladoc defers to (old nodes' degree grows past 2k as
    * batches accrue; descent quality decays as the corpus shifts): rebuild
    * the whole graph from the index's CURRENT vectors (tombstones
    * excluded — over-deletion-safe like every rebuild; pending requests
    * still carry across the swap) into a staging name while the live
    * index keeps serving, then deploy with [[swapIn]]. The graph twin of
    * [[AnnIndex.refreshQuantizer]]. */
  def refresh(spark: SparkSession, name: String, k: Int = 8,
      rounds: Int = 2, numCentroids: Int = 16): Unit = {
    healedTables(spark, name)
    val vecs = Materialize(Tombstones.filter(
      spark.table(s"${name}_vectors").select(col("vec_id"), col("v")),
      name, "vec_id"))
    val staging = name + "__refresh"
    val nb = bucketsOf(spark, s"${name}_edges")
    build(vecs, staging, k, rounds, numCentroids, nb)
    swapIn(spark, staging, name)
  }

  /** Deploy a rebuilt generation over the live name — the q217 pattern;
    * pending live deletions carry forward inside [[TableSwap.swapIn]].
    * Both generations heal FIRST: all three tables are replaceTable-
    * managed, so a compact that died in a DROP→RENAME gap on the staging
    * generation would otherwise read as "table absent" to TableSwap's
    * skip-if-done suffix loop and deploy a MIXED generation (old edges
    * against new vectors) with no error — the LexIndex.swapIn
    * discipline. */
  def swapIn(spark: SparkSession, staging: String, live: String): Unit = {
    healedTables(spark, staging)
    healedTables(spark, live)
    TableSwap.swapIn(spark, staging, live, Suffixes)
  }

  private def bucketsOf(spark: SparkSession, t: String): Int =
    spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(t))
      .bucketSpec.getOrElse(sys.error(s"$t is not a bucketed index table"))
      .numBuckets

  private def healedTables(spark: SparkSession, name: String): Unit =
    Suffixes.foreach(s => Bucketed.healInterruptedReplace(spark, name + s))

  /** q225: the oracle gate — planted-copy serving through the PERSISTED
    * index (build over corpus + plants, serve the 10 queries from the
    * tables): every plant must come back rank 1 at sim 1.0, the same
    * closed form as the in-memory tiers (q29/q51/q74/q85/q87/q97/q220/
    * q224). A broken bucketed layout, entry table, tombstone wiring, or
    * serve loop drops a plant and the hash mismatches. */
  /** Offline fsck for the graph surface — the [[IndexAudit]] discipline
    * applied to the fourth persisted family. Full-scan invariants (audits
    * are offline scans by design, like every fsck):
    *  - `orphan_endpoints`: edges whose src or dst has no vectors row —
    *    a torn extend (edges appended, vectors not) localizes here;
    *  - `asym_edges`: edges whose reverse row is missing — build and
    *    extend both write symmetrized, compact purges both directions,
    *    so ANY asymmetry is corruption;
    *  - `dup_edges`: (src, dst) stored more than once — the quantity an
    *    at-least-once extend replay accrues (serving tolerates it; the
    *    audit makes it visible so compaction can be scheduled);
    *  - `missing_reps`: entry points whose rep vector is gone — a purge
    *    that forgot to re-derive reps would strand serving;
    *  - `max_degree` / `p99_degree`: the out-degree distribution of the
    *    symmetrized graph (distinct neighbors per src — replay dups are
    *    counted separately). [[extend]] grows old-node degree past the
    *    build-time profile by design until rebuild; these columns make
    *    the rebuild cadence SCHEDULABLE from the audit artifact instead
    *    of discovered at serve-latency time (round-10 VERDICT item 6).
    * One row: (n_vectors, orphan_endpoints, asym_edges, dup_edges,
    * missing_reps, max_degree, p99_degree). */
  def audit(spark: SparkSession, name: String): DataFrame = {
    healedTables(spark, name)
    val v = spark.table(s"${name}_vectors").select(col("vec_id"))
    val e = spark.table(s"${name}_edges").select(col("src"), col("dst"))
    val orphan = e.join(v.withColumnRenamed("vec_id", "src"), Seq("src"), "left_anti")
      .unionByName(
        e.join(v.withColumnRenamed("vec_id", "dst"), Seq("dst"), "left_anti")
          .select(col("src"), col("dst")))
    val asym = e.join(
      e.select(col("dst").as("src"), col("src").as("dst")),
      Seq("src", "dst"), "left_anti")
    val dup = e.groupBy(col("src"), col("dst")).agg(count(lit(1)).as("c"))
      .filter(col("c") > 1)
    val reps = spark.table(s"${name}_entries").select(col("rep").as("vec_id"))
    val missingReps = reps.join(v, Seq("vec_id"), "left_anti")
    val deg = degreeProfile(spark, name)
    v.agg(countDistinct(col("vec_id")).as("n_vectors"))
      .crossJoin(orphan.agg(count(lit(1)).as("orphan_endpoints")))
      .crossJoin(asym.agg(count(lit(1)).as("asym_edges")))
      .crossJoin(dup.agg(count(lit(1)).as("dup_edges")))
      .crossJoin(missingReps.agg(count(lit(1)).as("missing_reps")))
      .crossJoin(deg)
  }

  /** The degree distribution of the symmetrized stored graph — exact
    * percentile (sort-based), not approx: the audit is an offline full
    * scan anyway, and the q227 restored-check needs both sides of the
    * comparison computed by the identical deterministic rule. Shared by
    * [[audit]] and the gate's pre-extend baseline (which needs ONLY this
    * profile — running the full invariant scans twice was a third of the
    * gate's cost). */
  private def degreeProfile(spark: SparkSession, name: String): DataFrame =
    spark.table(s"${name}_edges").select(col("src"), col("dst"))
      .groupBy(col("src")).agg(countDistinct(col("dst")).as("d"))
      .agg(max(col("d")).as("max_degree"),
        expr("cast(percentile(d, 0.99d) as double)").as("p99_degree"))

  /** q227: the audit gate over the FULL lifecycle — build on the corpus,
    * extend with plants, delete the plants, compact (physical purge),
    * then audit: n_vectors must equal the corpus count exactly (plants
    * arrived and were purged) and every invariant must read zero. The
    * degree columns gate as RESTORED booleans: every extend-appended edge
    * touches a plant (served pairs and intra-batch pairs are both
    * batch-anchored) and every plant is purged, so the post-compact edge
    * set provably equals the build edge set and the degree profile —
    * max and exact p99 — must match the pre-extend baseline bit for bit;
    * the raw degree numbers stay available on the production [[audit]].
    * The oracle states the whole row in closed form. A torn extend, a
    * one-directional append, a purge that misses an endpoint or forgets
    * the reps, an extend edge that survived the purge — each flips a
    * column and the hash mismatches. */
  def auditGate(spark: SparkSession, dir: String): DataFrame = {
    val name = "graft_graph_aidx"
    // bounded corpus slice (vec_id < 500, stated identically by the
    // oracle): the gate's cost is its JOB COUNT (build + extend's
    // insert-by-search + three staged rewrites + the fsck scans), not its
    // data volume — slicing keeps the lifecycle exercise identical at
    // every SF without making q227 the bench's dominant entry
    val e = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .filter(col("vec_id") < 500)
    val planted = e.filter(col("vec_id") < 10)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        expr("transform(v, x -> x * 2.0d)").as("v"))
    build(e, name, rounds = 1)
    // baseline degree profile, snapshotted BEFORE the lifecycle mutates
    // the tables (the plan is lazy over the very tables compact rewrites)
    val base = Materialize(degreeProfile(spark, name)
      .select(col("max_degree").as("bmax"), col("p99_degree").as("bp99")))
    extend(planted, name)
    delete(planted.select(col("vec_id")), name)
    compact(spark, name)
    audit(spark, name).crossJoin(base)
      .select(col("n_vectors"), col("orphan_endpoints"), col("asym_edges"),
        col("dup_edges"), col("missing_reps"),
        (col("max_degree") <=> col("bmax")).as("degree_restored"),
        (col("p99_degree") <=> col("bp99")).as("p99_restored"))
  }

  def indexGate(spark: SparkSession, dir: String): DataFrame =
    plantedGate(spark, dir, "graft_graph_idx", extendPlants = false)

  /** q226: the incremental-extend gate — build WITHOUT the plants, then
    * [[extend]] with them, then serve: every plant must come back rank 1
    * at sim 1.0 THROUGH the extended tables. This is the reachability
    * claim the reverse edges exist for: a fresh vector is findable
    * because its own insert-by-search edges were appended in both
    * directions (the plant's top-1 neighbor is its corpus twin, so the
    * twin's reverse edge leads the beam straight to the plant). A broken
    * extend — edges one-directional, vectors unappended, stored-quantizer
    * assignment wrong — drops plants and the hash mismatches. */
  def extendGate(spark: SparkSession, dir: String): DataFrame =
    plantedGate(spark, dir, "graft_graph_xidx", extendPlants = true)

  private def plantedGate(spark: SparkSession, dir: String, name: String,
      extendPlants: Boolean): DataFrame = {
    val e = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val q = e.filter(col("vec_id") < 10)
    val planted = q.select((col("vec_id") + 1000000L).as("vec_id"),
      expr("transform(v, x -> x * 2.0d)").as("v"))
    if (extendPlants) { build(e, name); extend(planted, name) }
    else build(e.unionByName(planted), name)
    val topk = topKAgainst(spark, name,
      q.select(col("vec_id").as("query_id"), col("v").as("qv")), k = 5)
    topk.groupBy(col("query_id"))
      .agg(min(when(col("neighbor_id") === col("query_id") + 1000000L,
          col("rn"))).as("rk"),
        max(when(col("neighbor_id") === col("query_id") + 1000000L,
          col("cos_sim"))).as("ps"))
      .select(col("query_id"), col("rk").cast("long").as("plant_rank"),
        col("ps").cast("double").as("plant_sim"))
  }
}
