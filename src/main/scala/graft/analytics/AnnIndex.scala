package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.embeddings
import graft.functions.VectorOps.cosine

/** Persisted IVF ANN index — the production shape of similarity search at
  * 100 TB, where the corpus is indexed ONCE and every retrieval reads only
  * the cells it probes:
  *
  *  - `<name>_centroids` (cid, cv): the trained quantizer, kilobytes.
  *  - `<name>_cells` (vec_id, v) PARTITIONED BY cid: one directory per
  *    cell, so a probe is a partition-pruned scan.
  *
  * The pruning is DYNAMIC (no driver collect, no literal cell list): the
  * per-query probed cells come out of a broadcast window over the centroid
  * table, and Spark's dynamic partition pruning turns that broadcast into
  * a runtime `cid IN (…)` partition filter on the cells scan — the scan
  * reads ≈ |distinct probed cells| / K of the index, verified by
  * AnnIndexSpec against the scan's partition count. Exact cosine re-rank
  * runs only on the scanned cells (same verify rule as the in-memory
  * [[Similarity.ivfTopKOn]], trained by the same
  * [[Similarity.trainCentroidsOn]], so index ≡ in-memory results).
  *
  * [[extend]] assigns new vectors with the STORED quantizer and appends
  * into the same partition layout — ingest grows the index without
  * retraining or rewriting (re-train+rebuild is a deliberate, separate
  * [[build]] call, the usual index-maintenance split).
  */
object AnnIndex {

  /** Build (or rebuild) the index over (vec_id, v) vectors. */
  def build(vecs: DataFrame, name: String, numCentroids: Int = 32): Unit = {
    val spark = vecs.sparkSession
    val centroids = Similarity.trainCentroidsOn(vecs, numCentroids)
    for (t <- Seq(s"${name}_centroids", s"${name}_cells")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), t.toLowerCase)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    centroids.write.format("parquet").saveAsTable(s"${name}_centroids")
    Similarity.assignCellsOn(vecs, centroids)
      .select(col("vec_id"), col("v"), col("cid"))
      .write.format("parquet").partitionBy("cid")
      .saveAsTable(s"${name}_cells")
  }

  /** Append new vectors, assigned with the stored quantizer. */
  def extend(vecs: DataFrame, name: String): Unit = {
    val spark = vecs.sparkSession
    Similarity.assignCellsOn(vecs, spark.table(s"${name}_centroids"))
      .select(col("vec_id"), col("v"), col("cid"))
      .write.mode("append").format("parquet").partitionBy("cid")
      .saveAsTable(s"${name}_cells")
  }

  /** Top-k cosine neighbors of (query_id, qv) queries against the index:
    * nprobe nearest cells per query from the broadcast centroid table,
    * then an exact re-rank over a partition-pruned cells scan. */
  def topKAgainst(spark: SparkSession, name: String, queries: DataFrame,
      k: Int = 5, nprobe: Int = 4): DataFrame = {
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("sim_c").desc, col("cid").asc)
    val probes = queries.crossJoin(broadcast(spark.table(s"${name}_centroids")))
      .withColumn("sim_c", cosine(col("qv"), col("cv")))
      .withColumn("rk", row_number().over(wq))
      .filter(col("rk") <= nprobe)
      .select(col("query_id"), col("qv"), col("cid"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    spark.table(s"${name}_cells")
      .join(broadcast(probes), Seq("cid"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("qv"), col("v")).as("sim"))
      // dedup on the candidate set (per-query cells content, not the
      // corpus): an index row duplicated by an at-least-once streaming
      // extend replay (AnnIndexStream's documented trade) must not occupy
      // two top-k slots; duplicate rows are value-identical, so the drop
      // is deterministic
      .dropDuplicates(Seq("query_id", "neighbor_id"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("sim"), 4).as("cos_sim"), col("rn"))
  }

  /** q161: oracle gate, planted-recall form through BOTH index legs — the
    * index is [[build]]t on the corpus, then [[extend]]ed with a scaled
    * copy (vec_id + 10⁶, ×2 magnitude — same direction, so cosine exactly
    * 1.0 and the same nearest cell as the query's own vector) of every
    * query vector. Each query's top-1 through the pruned-scan path MUST be
    * its planted copy at similarity 1.0; any breakage in training,
    * assignment, the stored layout, dynamic pruning, or the probe window
    * falsifies it. */
  def plantedRecallGate(spark: SparkSession, dir: String): DataFrame = {
    val e = embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    build(e, "graft_ann_idx", numCentroids = 32)
    val q = e.filter(col("vec_id") < 10)
    extend(q.select((col("vec_id") + 1000000L).as("vec_id"),
      expr("transform(v, x -> x * 2.0d)").as("v")), "graft_ann_idx")
    val top = topKAgainst(spark, "graft_ann_idx",
      q.select(col("vec_id").as("query_id"), col("v").as("qv")), k = 5)
    q.select(col("vec_id").as("query_id"))
      .join(top.filter(col("rn") === 1), Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("neighbor_id") === col("query_id") + 1000000L &&
          col("cos_sim") === 1.0, lit(false)).as("found"))
  }
}
