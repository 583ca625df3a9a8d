package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.documents

/** Deterministic sampling / dataset-split operators for training pipelines.
  *
  * Splits are a pure function of CONTENT (md5), not of row order or
  * partitioning — re-running on a reshuffled, repartitioned, or appended
  * corpus keeps every existing document in the same split. That property is
  * what makes train/test contamination auditable at 100 TB, and is exactly
  * what `df.sample`/`randomSplit` (seeded per-partition RNG — layout-
  * dependent) cannot give.
  */
object Sampling {

  /** Content-derived bucket in [0, 100): two hex chars of md5 → 0..255,
    * mod 100. Engine-portable (ascii/substring/md5 only), so the assignment
    * is oracle-checkable. */
  def contentBucket(c: Column): Column =
    pmod(ascii(substring(md5(c.cast("binary")), 1, 1)) * 256 +
      ascii(substring(md5(c.cast("binary")), 2, 1)), lit(100))

  def splitOf(c: Column, trainPct: Int = 90, valPct: Int = 5): Column = {
    val b = contentBucket(c)
    when(b < trainPct, lit("train"))
      .when(b < trainPct + valPct, lit("val"))
      .otherwise(lit("test"))
  }

  /** q38: per-document deterministic train/val/test assignment. */
  def trainSplit(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir).select(
      col("doc_id"),
      contentBucket(col("text")).as("bucket"),
      splitOf(col("text")).as("split"))

  /** q39: split sizes per language — the contamination/balance audit view. */
  def splitCounts(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .groupBy(splitOf(col("text")).as("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"))

  /** Deterministic fractional sample: keep documents whose content bucket
    * falls below `pct`. Stable under re-partitioning and appends. */
  def deterministicSample(df: DataFrame, textCol: String, pct: Int): DataFrame =
    df.filter(contentBucket(col(textCol)) < pct)

  /** q53: train/test contamination audit — near-duplicate pairs (the exact
    * Jaccard graph, q25) that STRADDLE split boundaries. A test document
    * with a train-side near-duplicate is leakage: eval scores measure
    * memorization, not generalization. This is the audit every serious
    * training pipeline runs before an eval split ships; composing it from
    * the gated dedup + split operators keeps it oracle-checkable end-to-end.
    * One extra broadcast-able join over the (tiny) pair graph. */
  def splitContamination(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.jaccardNearDup(spark, dir)
    val splits = documents(spark, dir)
      .select(col("doc_id"), splitOf(col("text")).as("split"))
    pairs
      .join(splits.select(col("doc_id").as("doc_a"), col("split").as("split_a")), "doc_a")
      .join(splits.select(col("doc_id").as("doc_b"), col("split").as("split_b")), "doc_b")
      .filter(col("split_a") =!= col("split_b"))
      .select(col("doc_a"), col("doc_b"), col("split_a"), col("split_b"), col("jaccard"))
  }
}
