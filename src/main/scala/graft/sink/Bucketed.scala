package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed table layout for co-located joins (100 TB posture).
  *
  * A fact⋈fact join (e.g. lineitem ⋈ orders on the order key) shuffles BOTH
  * sides every query. Writing each side bucketed by the join key — same
  * bucket count — makes the join a per-bucket zip with NO exchange on either
  * side: Spark's physical planner recognizes matching
  * `HashPartitioning(key, n)` output partitioning from bucketed scans. At
  * warehouse scale this turns the dominant recurring shuffle (terabytes per
  * query) into a one-time layout cost at ingest.
  *
  * Bucketing requires the table catalog (`saveAsTable`); a Hive metastore is
  * not needed — Spark's built-in in-memory/derby catalog suffices.
  */
object Bucketed {

  /** Bucket-count auto-sizing — the [[graft.analytics.DedupIndex]]
    * `derivedParts` discipline applied to the bucketed families: target
    * ≤ `spark.graft.rows.per.bucket` rows per bucket (default 1M — a few
    * hundred MB for the widest rows here, one task's comfortable write),
    * clamped to [8, 4096]. A fixed default width is wrong at BOTH ends:
    * 32 buckets over a warehouse-scale corpus puts terabytes in every
    * bucket file (one writer task each), and 32 buckets over a gate-sized
    * corpus pays 32 file opens per scan of a table that fits in one. The
    * input is a count of an already-materialized frame — no extra source
    * scan. Probes/appends/compacts always read the width from the catalog
    * (`bucketSpec`), so a derived build changes nothing downstream. */
  def derivedBuckets(spark: SparkSession, rows: Long): Int = {
    val target = spark.conf.getOption("spark.graft.rows.per.bucket")
      .map(_.toLong).getOrElse(1L << 20)
    math.max(8L, math.min(4096L, (rows + target - 1) / target)).toInt
  }

  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int = 32): Unit = {
    import org.apache.spark.sql.functions.col
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    ManagedPaths.clearStale(spark, table)
    // align tasks with the bucket grid (same Murmur3 — the
    // [[compactBucketed]] trick) so the build writes exactly ONE file per
    // bucket: a bucketed write does NOT shuffle on its own, so a
    // many-task input writes one file per (task, bucket) and every later
    // scan pays the multiplied open cost. One file per bucket is
    // right-sized by construction when the width is derived
    // ([[derivedBuckets]] targets one task's comfortable rows per
    // bucket). */
    df.repartition(buckets, col(key)).write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key — plans with zero
    * Exchange nodes (verify with `.explain`). */
  def colocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  private[graft] def stagingOf(table: String): String = table + "__staging"

  /** If a previous [[replaceTable]] crashed between its DROP and RENAME,
    * the completed snapshot sits under the staging name and the live name
    * is gone — finish the swap. Called at the top of every replace so the
    * crash heals on the next maintenance pass. Returns true if it healed. */
  def healInterruptedReplace(spark: SparkSession, table: String): Boolean = {
    val staging = stagingOf(table)
    if (!spark.catalog.tableExists(table) && spark.catalog.tableExists(staging)) {
      // [[completeReplacement]]'s sub-window can leave stale prior-session
      // files at the live default path (the DROP no-op'd on an in-memory
      // catalog but the explicit fs.delete hadn't run): a RENAME into a
      // non-empty destination can fail or nest the moved directory. Clear
      // first — safe, the live table is known absent from the catalog
      // here (round-9 ADVICE).
      ManagedPaths.clearStale(spark, table)
      CrashPoints.reached("heal.cleared-live")
      spark.sql(s"ALTER TABLE $staging RENAME TO $table")
      CrashPoints.reached("heal.renamed")
      true
    } else false
  }

  /** Crash-safe full-table replacement: `write` builds the new generation
    * under a STAGING name while the live table keeps serving, then the
    * swap is two catalog ops (DROP live, RENAME staging) — the pattern
    * [[TableSwap]] uses for whole-index generations, applied to a single
    * table. No window destroys the data: before the staging write
    * completes the live table is untouched; after it, a crash between the
    * two catalog ops leaves the complete snapshot under the staging name,
    * which [[healInterruptedReplace]] finishes on the next call. (The old
    * shape — drop, delete files, then write from a localCheckpoint
    * snapshot — permanently destroyed the table if the process died
    * mid-write; round-8 ADVICE.) */
  def replaceTable(spark: SparkSession, table: String,
      write: String => Unit): Unit = {
    stageReplacement(spark, table, write)
    completeReplacement(spark, table)
  }

  /** First half of [[replaceTable]]: build the new generation under the
    * staging name while the live table keeps serving. Callable on its own
    * when the swap must be deferred past other work (LexIndex stages the
    * rebased retention log before the generation's table renames and
    * flips it with [[completeReplacement]] after) — the staged table then
    * waits under exactly the name [[healInterruptedReplace]] covers. */
  def stageReplacement(spark: SparkSession, table: String,
      write: String => Unit): Unit = {
    healInterruptedReplace(spark, table)
    val staging = stagingOf(table)
    spark.sql(s"DROP TABLE IF EXISTS $staging")
    ManagedPaths.clearStale(spark, staging)
    CrashPoints.reached("stage.cleared")
    write(staging)
    CrashPoints.reached("stage.written")
  }

  /** Second half of [[replaceTable]]: the two catalog ops. A crash in the
    * gap leaves the complete snapshot under the staging name, healed by
    * the next [[healInterruptedReplace]] (which every Tombstones accessor
    * runs, so even a table whose ABSENCE reads as a valid state — the
    * retention log — cannot silently lose its staged generation). */
  def completeReplacement(spark: SparkSession, table: String): Unit = {
    val staging = stagingOf(table)
    if (spark.catalog.tableExists(staging)) {
      val liveLoc = ManagedPaths.pathOf(spark, table)
      spark.sql(s"DROP TABLE IF EXISTS $table")
      CrashPoints.reached("complete.dropped-live")
      val fs = liveLoc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(liveLoc)) fs.delete(liveLoc, true)
      CrashPoints.reached("complete.cleared-live")
      spark.sql(s"ALTER TABLE $staging RENAME TO $table")
      CrashPoints.reached("complete.renamed")
    }
  }

  /** Rewrite a bucketed table to exactly ONE file per bucket, preserving
    * the bucket spec — the small-file compaction every append-mode index
    * table eventually needs (each `extend`/micro-batch append leaves one
    * file per touched bucket). Shared by [[graft.analytics.DedupIndex]]
    * and [[graft.analytics.LexIndex]]. Runs through [[replaceTable]], so
    * a crash anywhere leaves either the old generation serving or the
    * complete new one recoverable — never neither.
    *
    * Snapshot FIRST, repartition AFTER: the table relation advertises
    * `HashPartitioning(key, n)` from its bucket spec, so a repartition over
    * the raw table scan is optimized away as redundant — while the physical
    * scan runs UNbucketed (file splits; "disabled by query planner"),
    * leaving partitions misaligned with bucket ids and the writer emitting
    * one file per (task, bucket) instead of one per bucket. The checkpoint
    * severs the bucketing claim, so the repartition survives and task i
    * holds exactly bucket i (repartition and the bucketed writer share
    * Murmur3 hashing). The bucket spec travels with the closing RENAME
    * (same property the generation swap relies on). */
  def compactBucketed(spark: SparkSession, table: String, key: String,
      transform: DataFrame => DataFrame = identity): Unit = {
    import org.apache.spark.sql.functions.col
    healInterruptedReplace(spark, table)
    val n = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
      .bucketSpec.getOrElse(sys.error(s"$table is not a bucketed table"))
      .numBuckets
    // `transform` lets the rewrite fold in answer-preserving maintenance the
    // caller already owes — the indexes pass their tombstone anti-join here,
    // making compaction the physical purge point (Tombstones' copy-on-write
    // half). It runs BEFORE the snapshot so the rewrite never materializes
    // rows it is about to drop.
    val snap = graft.functions.Materialize(transform(spark.table(table)))
      .repartition(n, col(key))
    CrashPoints.reached("compact.snapshotted")
    replaceTable(spark, table, staging =>
      snap.write.bucketBy(n, key).sortBy(key).format("parquet")
        .saveAsTable(staging))
  }

  // ==================================================================
  // PARTITIONED index tables — the layout behind dynamically
  // partition-pruned probes (the AnnIndex `_cells` pattern generalized):
  // a hash-derived partition column turns a broadcast probe batch into a
  // runtime partition filter on the scan, so a daily batch reads only the
  // slices its keys hash into instead of the whole 100 TB table.
  // ==================================================================

  /** Create (or replace) a hash-partitioned index table. `partCol` must
    * already be on `df` (derived from the probe key, e.g.
    * `pmod(xxhash64(key), parts)` — the SAME derivation the probe side
    * applies at query time); the modulus is stamped as the `graft.parts`
    * table property so probes and appends read it from the catalog
    * instead of trusting callers to agree ([[TableProps]]).
    *
    * Write width = ONE TASK PER SLICE (round-14: the wall of a dynamic
    * partitioned write is per-FILE task-side cost — parquet open/close,
    * task setup/commit — and `repartition(partCol)` at the session's
    * default shuffle width bunches dozens of slices into each task, which
    * writes their files SEQUENTIALLY; AppendProbe measured 23 s → 7.6 s on
    * a 1958-slice append by widening. NOT the job-commit renames — the v2
    * committer measured identical). `repartition(parts, partCol)` keeps
    * the one-file-per-slice layout and parallelizes the per-file cost; a
    * build populates ~every slice, so `parts` is the natural width. */
  def writePartitioned(df: DataFrame, table: String, partCol: String,
      parts: Int): Unit = {
    import org.apache.spark.sql.functions.col
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    ManagedPaths.clearStale(spark, table)
    df.repartition(parts, col(partCol)).write.mode("overwrite")
      .format("parquet").partitionBy(partCol).saveAsTable(table)
    TableProps.set(spark, table, PartsProp -> parts.toString)
  }

  /** Per-partition physical file counts from `_metadata` provenance —
    * the scan itself reports the layout, no filesystem walk (the
    * [[graft.analytics.AnnIndex.compactionPlan]] discipline for
    * [[writePartitioned]] tables): the decision input of a targeted
    * compaction policy. O(#partitions) driver metadata. */
  def partitionedCompactionPlan(spark: SparkSession, table: String,
      partCol: String, threshold: Int): DataFrame = {
    import org.apache.spark.sql.functions.{col, countDistinct}
    spark.table(table)
      .select(col(partCol).as("part"), col("_metadata.file_path").as("fp"))
      .groupBy(col("part"))
      .agg(countDistinct(col("fp")).as("n_files"))
      .withColumn("needs_compaction", col("n_files") > threshold)
  }

  /** The stored partition modulus of a [[writePartitioned]] table. */
  def partsOf(spark: SparkSession, table: String): Int =
    TableProps.required(spark, table, PartsProp).toInt

  val PartsProp = "graft.parts"

  /** Append a batch into an existing partitioned index table, one file
    * per touched partition (`partCol` must already be derived with the
    * stored modulus — see [[partsOf]]).
    *
    * Width = one task per TOUCHED slice (see [[writePartitioned]] — the
    * round-14 measured fix; at a warehouse-scale grid a batch's band keys
    * touch O(min(batch keys, parts)) slices, and the old session-width
    * bunching serialized ~dozens of per-file costs per task: 3.6/12/25 s
    * at 256/1024/4096 parts for one fixed batch, ~13 ms per slice, all of
    * it task-side). The batch is materialized once — the distinct-count
    * decides the width, the write reuses the snapshot. */
  def appendPartitioned(df: DataFrame, table: String, partCol: String): Unit = {
    import org.apache.spark.sql.functions.col
    val snap = graft.functions.Materialize(df)
    val touched = snap.select(col(partCol)).distinct().count().toInt.max(1)
    snap.repartition(touched, col(partCol)).write.mode("append")
      .format("parquet").partitionBy(partCol).saveAsTable(table)
  }

  /** In-layout compaction of a partitioned index table — the
    * [[graft.analytics.AnnIndex.compact]] discipline shared: snapshot
    * through Materialize (the read must not race its own overwrite),
    * rewrite every partition present in the snapshot to ONE file via
    * DYNAMIC partition overwrite (commits at job commit — all-or-nothing
    * from the sweep's point of view), then explicitly drop partitions the
    * `transform` EMPTIED (a partition whose every row was tombstoned
    * produces no snapshot rows, so the dynamic overwrite never touches it
    * and its at-rest bytes would survive the purge). Each step is
    * idempotent, so a crash anywhere replays into the same end state; no
    * rename is involved, so partition locations never strand. */
  def compactPartitioned(spark: SparkSession, table: String, partCol: String,
      transform: DataFrame => DataFrame = identity,
      only: Option[Seq[Long]] = None): Unit = {
    import org.apache.spark.sql.functions.col
    val t0 = spark.table(table)
    // `only` scopes the pass to chosen partition values (the AnnIndex
    // cid-scoping production shape: compact the slices today's ingest
    // touched, leave the other 99% of a 100 TB table unread) — static
    // partition pruning on the read, dynamic overwrite on the write, and
    // the emptied-partition drop below restricted to the SELECTED set
    // (an unselected partition is absent from the snapshot by
    // construction, not emptied).
    val t = only.map(vs => t0.filter(col(partCol).isin(vs: _*))).getOrElse(t0)
    val snap0 = graft.functions.Materialize(
      transform(t).select(t0.columns.toIndexedSeq.map(col): _*))
    // one task per rewritten slice (the round-14 write-width fix — see
    // [[writePartitioned]]); the width comes from the snapshot itself, so
    // a threshold-scoped pass stays exactly as wide as its selection
    val width = snap0.select(col(partCol)).distinct().count().toInt.max(1)
    val snap = snap0.repartition(width, col(partCol))
    CrashPoints.reached("pcompact.snapshotted")
    // conf-isolated dynamic overwrite: concurrent Par legs (DedupIndex
    // .compact fans _bands/_pfx through here while the forget gate fans
    // AnnIndex.compact) would race a session-level set/restore dance —
    // see DynamicOverwrite's scaladoc for the truncation window.
    DynamicOverwrite.insertInto(snap, table)
    CrashPoints.reached("pcompact.rewritten")
    val kept = snap.select(col(partCol)).distinct().collect()
      .map(_.get(0).toString).toSet
    val selected = only.map(_.map(_.toString).toSet)
    val cat = spark.sessionState.catalog
    val ti = org.apache.spark.sql.catalyst.TableIdentifier(table)
    val emptied = cat.listPartitions(ti)
      .filter(p => selected.forall(_(p.spec(partCol))))
      .filterNot(p => kept(p.spec(partCol)))
    if (emptied.nonEmpty) {
      // catalog drop first, then the at-rest bytes (the in-memory catalog's
      // drop does not purge managed files); both idempotent under replay
      cat.dropPartitions(ti, emptied.map(_.spec), ignoreIfNotExists = true,
        purge = false, retainData = true)
      val root = new org.apache.hadoop.fs.Path(cat.getTableMetadata(ti).location)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      emptied.foreach { p =>
        val dir = new org.apache.hadoop.fs.Path(root,
          s"$partCol=${p.spec(partCol)}")
        if (fs.exists(dir)) fs.delete(dir, true)
      }
    }
    CrashPoints.reached("pcompact.dropped")
  }
}

