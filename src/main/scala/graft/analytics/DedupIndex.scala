package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.documents
import graft.analytics.TextStats.wordShingles
import graft.functions.Materialize
import graft.sink.{Bucketed, Tombstones}

/** Persisted MinHash near-dup INDEX + incremental new-batch dedup — the
  * production shape of corpus dedup at 100 TB: the corpus's signatures and
  * LSH band keys are written ONCE as bucketed tables, and each new ingest
  * batch (a day of crawl) is deduplicated against the whole corpus by
  * joining only its own band keys — no corpus re-signature, no corpus
  * self-join, no shuffle of the index side.
  *
  * Layout:
  *  - `<name>_sigs`  (doc_id, mhs)              bucketed by doc_id
  *  - `<name>_bands` (doc_id, band, band_key)   bucketed by band_key
  *
  * Query plan: every join in [[nearDupsAgainst]] broadcasts the BATCH side
  * (a daily batch is MBs against a corpus of TBs), so both index tables are
  * each read by exactly one exchange-free scan; the only shuffle in the
  * whole job is the candidate-pair distinct, whose input is band-collision
  * pairs (bounded by true near-dups + LSH false positives), not corpus
  * rows. [[extend]] appends a processed batch into the same bucket layout,
  * so the index grows with ingest instead of being rebuilt — together the
  * two calls are the standing dedup loop: dedup today's batch against the
  * index, keep the survivors, extend the index with them.
  */
object DedupIndex {

  private[analytics] def sigsOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      Dedup.minhashSignature(wordShingles(col("text"))).as("mhs"))

  /** Build (or rebuild) the index over a corpus of (doc_id, text). */
  def build(docs: DataFrame, name: String, buckets: Int = 32): Unit =
    buildFromSigs(Materialize(sigsOf(docs)), name, buckets)

  /** [[build]] from a precomputed signature frame — lets the q212/q216
    * gate twins share ONE memoized signature pass where independent-build
    * semantics are not the thing under test (round-9 VERDICT item 4). */
  private[analytics] def buildFromSigs(sigs: DataFrame, name: String,
      buckets: Int): Unit = {
    Bucketed.writeBucketed(sigs, s"${name}_sigs", "doc_id", buckets)
    Bucketed.writeBucketed(Dedup.bandsOf(sigs), s"${name}_bands", "band_key", buckets)
    Tombstones.clear(sigs.sparkSession, name) // a rebuild has nothing to forget
  }

  /** DELETE docs from the index — merge-on-read ([[graft.sink.Tombstones]]):
    * the request appends its ids to the log and touches neither index
    * table (a doc's band rows are scattered across every band bucket — a
    * physical rewrite per request is exactly the wrong cost at 100 TB).
    * [[nearDupsAgainst]] anti-joins the log from the next query on; the
    * physical purge rides the next [[compact]]. */
  def delete(ids: DataFrame, name: String): Unit =
    Tombstones.append(ids.select(org.apache.spark.sql.functions.col("doc_id")),
      name, "doc_id")

  /** Deploy a rebuilt generation over the live name — the q217 pattern for
    * the bucketed family: the bucket spec is table metadata and travels
    * with the rename, so the exchange-free probe plans survive the swap
    * (RetentionSpec pins spec + answers). */
  def swapIn(spark: SparkSession, staging: String, live: String): Unit =
    graft.sink.TableSwap.swapIn(spark, staging, live, Seq("_sigs", "_bands"))

  /** Append a new batch into the existing index — the bucket spec is read
    * from the catalog (whatever [[build]] chose), so the appended files
    * land in the established layout and every later [[nearDupsAgainst]]
    * sees old + new corpus through the same exchange-free scans. On a
    * CLUSTERED index ([[buildClustered]]) the batch also merges into the
    * persisted cluster map — see [[extendClusters]]. */
  def extend(docs: DataFrame, name: String, threshold: Double = 0.6): Unit = {
    val spark = docs.sparkSession
    healedTables(spark, name)
    def bucketsOf(t: String): Int = DedupIndex.bucketsOf(spark, t)
    val sigs = Materialize(sigsOf(docs))
    sigs.write.mode("append").bucketBy(bucketsOf(s"${name}_sigs"), "doc_id")
      .sortBy("doc_id").format("parquet").saveAsTable(s"${name}_sigs")
    Dedup.bandsOf(sigs).write.mode("append")
      .bucketBy(bucketsOf(s"${name}_bands"), "band_key")
      .sortBy("band_key").format("parquet").saveAsTable(s"${name}_bands")
    if (isClustered(spark, name)) extendClusters(docs, name, threshold)
  }

  private def bucketsOf(spark: SparkSession, t: String): Int =
    spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(t))
      .bucketSpec.getOrElse(sys.error(s"$t is not a bucketed index table"))
      .numBuckets

  /** Heal any interrupted staging-rename before reading or appending —
    * the [[graft.analytics.LexIndex]] discipline applied to this family's
    * two tables (a compact crashed in its DROP→RENAME gap must not make
    * the next probe throw, or the next extend create-and-orphan). */
  private def healedTables(spark: SparkSession, name: String): Unit =
    Seq("_sigs", "_bands").foreach(s =>
      Bucketed.healInterruptedReplace(spark, name + s))

  /** Compaction for the bucketed index tables — the dedup twin of
    * [[AnnIndex.compact]]: every [[extend]] (and every DedupIndexStream
    * micro-batch) appends one file per touched bucket, so after N extends
    * each index scan opens N files per bucket. Rewrites each table to ONE
    * file per bucket under the same spec via
    * [[Bucketed.compactBucketed]] (the snapshot-before-repartition trap
    * and the warehouse-scale swap story live there); DedupIndexSpec pins
    * answers-unchanged + file-count collapse + preserved bucket spec. */
  def compact(spark: SparkSession, name: String): Unit = {
    healedTables(spark, name)
    // the physical purge point: the rewrite drops tombstoned rows from both
    // tables, then the log resets — answers unchanged, because every read
    // path already merge-on-read-filtered the same rows
    for ((t, key) <- Seq((s"${name}_sigs", "doc_id"), (s"${name}_bands", "band_key")))
      Bucketed.compactBucketed(spark, t, key, Tombstones.filter(_, name, "doc_id"))
    Tombstones.clear(spark, name)
  }

  /** Candidate (corpus_id, new_id) pairs: the batch's band keys probed into
    * the persisted band table. Batch side broadcast; index side pure scan. */
  private[graft] def candidatesAgainst(spark: SparkSession, name: String,
      newSigs: DataFrame): DataFrame = {
    healedTables(spark, name)
    val newBands = Dedup.bandsOf(newSigs)
      .select(col("band"), col("band_key"), col("doc_id").as("new_id"))
    // merge-on-read: pending deletions drop out of the candidate source
    // (the sigs join downstream is inner on corpus_id, so filtering the
    // band side alone suffices); identity when no deletions are pending
    Tombstones.filter(spark.table(s"${name}_bands"), name, "doc_id")
      .join(broadcast(newBands), Seq("band", "band_key"))
      .select(col("doc_id").as("corpus_id"), col("new_id"))
      .distinct()
  }

  /** Verified near-dups of a new (doc_id, text) batch against the indexed
    * corpus: band-collision candidates, then signature-agreement estimate
    * ≥ `estThreshold` — same verify rule as the batch [[Dedup.minhashLsh]],
    * so incremental ≡ recompute restricted to (corpus × batch) pairs
    * (DedupIndexSpec pins the equivalence). */
  def nearDupsAgainst(spark: SparkSession, name: String, newDocs: DataFrame,
      estThreshold: Double = 0.5): DataFrame = {
    val newSigs = Materialize(sigsOf(newDocs))
    val cand = candidatesAgainst(spark, name, newSigs)
    spark.table(s"${name}_sigs")
      .select(col("doc_id").as("corpus_id"), col("mhs").as("mhs_c"))
      .join(broadcast(cand), "corpus_id")
      .join(broadcast(newSigs.select(col("doc_id").as("new_id"),
        col("mhs").as("mhs_n"))), "new_id")
      .withColumn("est_jaccard", Dedup.estJaccard(col("mhs_c"), col("mhs_n")))
      .filter(col("est_jaccard") >= estThreshold)
      .select(col("corpus_id"), col("new_id"),
        round(col("est_jaccard"), 4).as("est_jaccard"))
      // distinct on the (small) verified pair set: an index row duplicated
      // by an at-least-once extend replay (DedupIndexStream's documented
      // trade) then cannot duplicate output pairs
      .distinct()
  }

  /** q160: the oracle gate, planted-recall form (q48/q49 pattern) gating
    * BOTH index legs in one query. Corpus = documents with content bucket
    * ≥ 20; the index is [[build]]t on it, then [[extend]]ed with the
    * bucket-[10,20) slice. The probe batch is the organic bucket-<10 slice
    * plus a PLANTED verbatim copy (doc_id + 10⁷) of every doc in bucket
    * [10,30) — half hitting the built leg, half the extended leg. A
    * verbatim copy has an identical signature, so every band collides and
    * the estimate is exactly 1.0: each planted row MUST come back paired
    * with its original. Output is the planted join-back (ids + found
    * boolean), which DuckDB states verbatim from the bucket formula. */
  def incrementalGate(spark: SparkSession, dir: String): DataFrame =
    incrementalGateImpl(spark, dir, "graft_dedup_idx", compactFirst = false)

  /** q171: the q160 gate re-run through a COMPACTED index — build, extend
    * (leaving one small file per touched bucket per write), then
    * [[compact]] both index tables to one file per bucket before probing.
    * Same oracle statement as q160: compaction must not change a single
    * answer (the q47/q167 no-answer-change pattern); the file-count
    * collapse itself is pinned by DedupIndexSpec. */
  def compactedGate(spark: SparkSession, dir: String): DataFrame =
    incrementalGateImpl(spark, dir, "graft_dedup_cidx", compactFirst = true)

  /** q206: the DELETE gate, planted-recall form through BOTH delete paths.
    * The index is built on the full corpus, then every doc with content
    * bucket < 20 is deleted. The probe batch plants a verbatim copy
    * (doc_id + 10⁷) of every doc in bucket [0, 40): plants of DELETED
    * docs (bucket < 20) must come back unfound, plants of retained docs
    * found at estimate exactly 1.0 — first through the merge-on-read path
    * (tombstone log only, index files untouched), then again through the
    * physically purged index after [[compact]]. Both verdicts must agree
    * with the retention rule, which the oracle states from the bucket
    * formula. The join-back keys on corpus_id = new_id − 10⁷, so an
    * organic exact-duplicate of a deleted doc elsewhere in the corpus
    * can't fake a find. */
  def deleteGate(spark: SparkSession, dir: String): DataFrame = {
    val Stride = 10000000L
    val name = "graft_dedup_didx"
    val docs = documents(spark, dir).select(col("doc_id"), col("text"),
      Sampling.contentBucket(col("text")).as("cb"))
    build(docs.select(col("doc_id"), col("text")), name, buckets = 8)
    delete(docs.filter(col("cb") < 20).select(col("doc_id")), name)
    val planted = Materialize(docs.filter(col("cb") < 40)
      .select((col("doc_id") + lit(Stride)).as("doc_id"), col("text")))
    def foundCol(res: DataFrame): DataFrame =
      planted.select(col("doc_id").as("new_id"))
        .join(res.filter(col("corpus_id") === col("new_id") - Stride),
          Seq("new_id"), "left")
        .select(col("new_id"),
          coalesce(col("est_jaccard") === 1.0, lit(false)).as("found"))
    val mor = Materialize(foundCol(nearDupsAgainst(spark, name, planted, 0.9)))
    compact(spark, name) // physical purge; tombstone log resets
    val purged = foundCol(nearDupsAgainst(spark, name, planted, 0.9))
    mor.withColumnRenamed("found", "found_mor")
      .join(purged.withColumnRenamed("found", "found_purged"), Seq("new_id"))
      .select(col("new_id"), (col("new_id") - Stride).as("orig_id"),
        col("found_mor"), col("found_purged"))
  }

  private def incrementalGateImpl(spark: SparkSession, dir: String,
      name: String, compactFirst: Boolean): DataFrame = {
    val Stride = 10000000L
    val docs = documents(spark, dir).select(col("doc_id"), col("text"),
      Sampling.contentBucket(col("text")).as("cb"))
    build(docs.filter(col("cb") >= 20).select(col("doc_id"), col("text")),
      name, buckets = 8)
    extend(docs.filter(col("cb") >= 10 && col("cb") < 20)
      .select(col("doc_id"), col("text")), name)
    if (compactFirst) compact(spark, name)
    val planted = docs.filter(col("cb") >= 10 && col("cb") < 30)
      .select((col("doc_id") + lit(Stride)).as("doc_id"), col("text"))
    val batch = docs.filter(col("cb") < 10).select(col("doc_id"), col("text"))
      .unionByName(planted)
    val found = nearDupsAgainst(spark, name, batch, 0.9)
    planted.select(col("doc_id").as("new_id"))
      .join(found.filter(col("corpus_id") === col("new_id") - Stride),
        Seq("new_id"), "left")
      .select(col("new_id"), (col("new_id") - Stride).as("orig_id"),
        coalesce(col("est_jaccard") === 1.0, lit(false)).as("found"))
  }
}

