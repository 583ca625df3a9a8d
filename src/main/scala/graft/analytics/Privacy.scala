package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.documents

/** PII detection and redaction for pre-training corpora — the scrub pass
  * every published data pipeline runs before tokenization (emails, phone
  * numbers, URLs are the standard regex-detectable classes; see e.g. the
  * BigScience/ROOTS and RefinedWeb data cards for the pattern family).
  *
  * Pure per-row column expressions (codegen'd regexes) — a narrow map fused
  * into the scan, so at 100 TB the scrub costs exactly one corpus read and
  * composes with the filter family (q66/q73) for free.
  *
  * Patterns are deliberately restricted to syntax valid in BOTH Java regex
  * and RE2 (no lookarounds, no backrefs) so the operator is oracle-checkable
  * and portable to RE2-based engines.
  */
object Privacy {

  val EmailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** Dashed international-ish form: optional +CC, 3-4 digit groups. */
  val PhoneRe: String = "\\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
  val UrlRe: String   = "https?://[^\\s]+"

  /** Detection counts + redacted text over any (doc_id, <textCol>) frame.
    * Redaction order (email → phone → URL) is part of the contract: the
    * placeholders contain no digits or scheme, so later passes can't match
    * inside earlier replacements. */
  def piiScrubOn(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs.select(
      col("doc_id"),
      size(regexp_extract_all(t, lit(EmailRe), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(t, lit(PhoneRe), lit(0))).cast("long").as("n_phones"),
      size(regexp_extract_all(t, lit(UrlRe), lit(0))).cast("long").as("n_urls"),
      regexp_replace(
        regexp_replace(
          regexp_replace(t, EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>"),
        UrlRe, "<URL>").as("scrubbed"))
  }

  /** The synthetic-PII corpus: the driver testdata contains no PII (by
    * design), so the gated query derives a contact line per document from
    * doc_id — deterministic, engine-portable, and non-degenerate (every row
    * exercises every pattern, and the base text proves the patterns don't
    * false-positive on plain words). Production callers use [[piiScrubOn]]
    * directly on raw text. */
  def withSyntheticPii(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      concat(
        col("text"),
        lit(" Contact: user"), col("doc_id"), lit("@example.com or +1-555-"),
        lpad(pmod(col("doc_id"), lit(10000)), 4, "0"),
        lit(" at https://example.com/u/"), col("doc_id")).as("text"))

  /** q77: PII scrub over the documents table (synthetic contact lines). */
  def piiScrub(spark: SparkSession, dir: String): DataFrame =
    piiScrubOn(withSyntheticPii(
      documents(spark, dir).select(col("doc_id"), col("text"))))

  /** q218: k-ANONYMITY generalization audit — the re-identification check a
    * dataset release runs over its metadata: with quasi-identifiers
    * (source, lang, length-bucket), a document whose QI combination is
    * shared by fewer than k others is linkable. Rather than a bare
    * flag, each document gets the FINEST generalization level at which
    * its group reaches k (the standard generalization lattice, cut to a
    * chain): 0 = full QI ok, 1 = drop the length bucket, 2 = keep source
    * only, 3 = suppress (even the source slice is smaller than k).
    * Plan: three aggregates over BOUNDED group spaces (|sources|×|langs|×
    * buckets at worst), each broadcast back onto the docs scan — group
    * sizes are metadata-sized, the corpus shuffles nothing. Emitted
    * per-group (group sizes + level), so the gate stays stable and the
    * release decision ("publish levels ≤ 2, suppress 3") is one filter. */
  def kAnonymity(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val q = documents(spark, dir).select(col("doc_id"), col("source"),
      col("lang"), expr("cast(n_chars as bigint) div 500").as("lb"))
    val g0 = q.groupBy(col("source"), col("lang"), col("lb"))
      .agg(count(lit(1)).as("n0"))
    val g1 = q.groupBy(col("source"), col("lang")).agg(count(lit(1)).as("n1"))
    val g2 = q.groupBy(col("source")).agg(count(lit(1)).as("n2"))
    g0.join(broadcast(g1), Seq("source", "lang"))
      .join(broadcast(g2), Seq("source"))
      .select(col("source"), col("lang"), col("lb"),
        col("n0"), col("n1"), col("n2"),
        when(col("n0") >= k, lit(0))
          .when(col("n1") >= k, lit(1))
          .when(col("n2") >= k, lit(2))
          .otherwise(lit(3)).as("level"))
      .orderBy(col("source"), col("lang"), col("lb"))
  }
}
