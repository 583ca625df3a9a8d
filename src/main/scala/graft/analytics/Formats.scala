package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.documents

/** Semi-structured (Spark 4 VARIANT) and columnar-format interop.
  *
  * The reference ingests JSON envelopes off a wire and lands columnar
  * files (kafka_cc/consumer/kafka_to_hdfs_consumer.py:95-133); these
  * operators cover the two engine surfaces that generalizes to: schemaless
  * envelope consumption without a pre-declared struct (VARIANT — parse
  * once, extract typed paths lazily), and lossless interop with the other
  * mainstream columnar format (ORC). Both are gated against oracles that
  * never touch the converted form, so the round-trips prove themselves.
  */
object Formats {

  /** q210: parquet FOOTER-STATISTICS aggregation — COUNT/MIN/MAX answered
    * from row-group metadata without decoding a single data page. At
    * 100 TB this is the difference between a stats query that touches
    * kilobytes of footers and one that scans the table: the DSv2 parquet
    * scan (aggregate pushdown is a V2-only rule, so the gate lifts parquet
    * out of `useV1SourceList` for the duration) rewrites the whole
    * aggregate into `PushedAggregation: [COUNT(*), MIN(..), MAX(..)]` —
    * FormatsSpec pins that plan shape. The result is materialized INSIDE
    * the conf scope (the pushdown decision happens at physical planning,
    * which a lazily returned frame would defer past the conf restore), and
    * the oracle computes the same aggregate the ordinary way — footer
    * statistics must agree with the data they describe. */
  def aggPushdown(spark: SparkSession, dir: String): DataFrame =
    withAggPushdown(spark) {
      graft.functions.Materialize(aggPushdownQuery(spark, dir))
    }

  private[graft] def aggPushdownQuery(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/lineitem.parquet")
      .agg(count(lit(1)).as("n_rows"),
        min(col("l_orderkey")).as("min_okey"),
        max(col("l_orderkey")).as("max_okey"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"))

  private[graft] def withAggPushdown[A](spark: SparkSession)(body: => A): A = {
    val prevV1 = spark.conf.get("spark.sql.sources.useV1SourceList")
    val prevAgg = spark.conf.getOption("spark.sql.parquet.aggregatePushdown")
    spark.conf.set("spark.sql.sources.useV1SourceList",
      prevV1.split(",").map(_.trim).filter(s => s.nonEmpty && s != "parquet")
        .mkString(","))
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    try body
    finally {
      spark.conf.set("spark.sql.sources.useV1SourceList", prevV1)
      prevAgg match {
        case Some(v) => spark.conf.set("spark.sql.parquet.aggregatePushdown", v)
        case None => spark.conf.unset("spark.sql.parquet.aggregatePushdown")
      }
    }
  }

  /** q200: VARIANT round-trip — documents serialized to JSON envelopes
    * (the wire shape of an ingest feed: nested `meta` struct + a token
    * array), parsed into Spark 4's VARIANT type, and consumed via typed
    * `variant_get` path extraction — nested paths and array indexing
    * included. The gate aggregates the EXTRACTED fields per
    * (source, lang): doc count, char sum, and how many envelopes carry a
    * non-empty first token. The oracle computes the same statistics
    * straight from the typed parquet columns, so any loss in the
    * serialize → parse_json → variant_get loop (unicode escaping, numeric
    * widening, null vs missing path) flips the gate. Scale: one scan;
    * parse/extract are per-row expressions inside codegen, the aggregate
    * is source×lang-keyed (bounded groups). */
  def variantExtract(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .select(to_json(struct(
        col("doc_id"),
        struct(col("lang"), col("source"), col("n_chars")).as("meta"),
        slice(TextStats.tokens(col("text")), 1, 3).as("toks"))).as("js"))
      .select(expr("parse_json(js)").as("vj"))
      .select(
        expr("variant_get(vj, '$.meta.source', 'string')").as("source"),
        expr("variant_get(vj, '$.meta.lang', 'string')").as("lang"),
        expr("variant_get(vj, '$.meta.n_chars', 'long')").as("n_chars"),
        expr("variant_get(vj, '$.toks[0]', 'string')").as("tok0"))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
        sum(when(col("tok0").isNotNull, 1L).otherwise(0L)).as("n_with_tok"),
        // order-insensitive checksum of the EXTRACTED token bytes (q110
        // discipline) — this is what catches byte-level mangling the
        // counts can't see (e.g. a platform-charset decode inside the
        // variant parser replacing non-ASCII with U+FFFD; see build.sbt's
        // -Dfile.encoding pin)
        coalesce(sum(conv(substring(md5(col("tok0").cast("binary")), 1, 12), 16, 10)
          .cast("decimal(38,0)")), lit(0).cast("decimal(38,0)"))
          .cast("decimal(38,0)").as("tok_checksum"))
      .withColumn("tok_checksum", col("tok_checksum").cast("string"))

  /** q201: ORC round-trip fidelity — the corpus rewritten as ORC (the
    * second columnar format a lakehouse interops with) and read back; the
    * gate recomputes the per-source manifest — doc count, exact token
    * total, and the order-insensitive 48-bit-md5-prefix content checksum
    * in exact decimal (the q110/q186 discipline) — FROM THE ORC COPY,
    * while the oracle computes it from the original parquet. One lost
    * row, one duplicated row, or one mangled unicode byte of text flips
    * the checksum. Scale: the conversion is an embarrassingly parallel
    * per-file rewrite (no shuffle); the manifest is one source-keyed
    * aggregate on each side. */
  def orcRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    val path = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
      "graft_orc_documents").toString
    documents(spark, dir).select("doc_id", "text", "lang", "source")
      .write.mode("overwrite").format("orc").save(path)
    spark.read.orc(path)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TextStats.tokens(col("text"))).cast("long")).as("n_tokens"),
        sum(conv(substring(md5(concat_ws("|", col("doc_id"), col("text"))), 1, 12), 16, 10)
          .cast("decimal(38,0)")).cast("decimal(38,0)").as("checksum"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("checksum").cast("string").as("checksum"))
  }

  /** q202: SCHEMA-EVOLUTION read — the lakehouse migration reality: a table
    * whose early files predate two columns. Generation 1 (even doc_ids) is
    * written with (doc_id, text, source) only; generation 2 (odd doc_ids)
    * adds (lang, n_chars). The union view comes from ONE
    * `mergeSchema=true` read over the partitioned layout — no manual
    * per-file casting — and the gate states, per generation: row count,
    * how many rows carry a null late-added column (all of gen 1, none of
    * gen 2), the late column's sum, and the content checksum. The oracle
    * recomputes each generation from the ORIGINAL typed table, so a row
    * routed to the wrong generation, a late column backfilled where it
    * should be null, or a dropped file flips the gate. Scale: schema merge
    * is a footer-only planning step (file count, not data); the read
    * itself stays one pruned columnar scan. */
  def schemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    val root = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
      "graft_evo_documents").toString
    val d = documents(spark, dir)
    d.filter(col("doc_id") % 2 === 0).select("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$root/gen=1")
    d.filter(col("doc_id") % 2 === 1)
      .select("doc_id", "text", "source", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$root/gen=2")
    spark.read.option("mergeSchema", "true").parquet(root)
      .groupBy(col("gen").cast("long").as("gen"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("lang").isNull, 1L).otherwise(0L)).as("n_lang_null"),
        coalesce(sum(col("n_chars")), lit(0L)).as("sum_chars"),
        sum(conv(substring(md5(concat_ws("|", col("doc_id"), col("text"))), 1, 12), 16, 10)
          .cast("decimal(38,0)")).cast("decimal(38,0)").as("checksum"))
      .select(col("gen"), col("n_docs"), col("n_lang_null"), col("sum_chars"),
        col("checksum").cast("string").as("checksum"))
  }

  /** q205: corrupt-file RESILIENCE — at 100 TB some file in a
    * million-file table is eventually truncated mid-upload or plain
    * garbage, and one bad file must cost a warning, not the job (a
    * 1000-executor scan that dies at 99% on a torn footer re-runs hours).
    * The gate stages a copy of the corpus alongside two planted poison
    * files — pure garbage (no parquet magic) and a torn copy (valid PAR1
    * header, amputated footer) — and reads the directory with an explicit
    * schema + `ignoreCorruptFiles=true`. The per-source manifest (count,
    * token total, content checksum — the q110/q201 discipline) must equal
    * the oracle's clean-table manifest exactly: the poison skipped, every
    * healthy row kept, none double-read. The explicit schema matters at
    * scale for a second reason: no footer-sampling schema inference pass
    * over a million files before planning. */
  def corruptResilientRead(spark: SparkSession, dir: String): DataFrame = {
    val root = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
      "graft_corrupt_documents")
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val rootPath = new org.apache.hadoop.fs.Path(root.toString)
    fs.delete(rootPath, true)
    val clean = documents(spark, dir).select("doc_id", "text", "source")
    clean.write.mode("overwrite").parquet(root.toString)
    // poison 1: garbage bytes, no PAR1 magic
    val junk = new java.io.FileOutputStream(new java.io.File(root, "zz_junk.parquet"))
    junk.write(Array.fill[Byte](4096)(0x5a)); junk.close()
    // poison 2: a torn copy — header intact, footer gone
    val good = root.listFiles().filter(f =>
      f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).head
    val bytes = java.nio.file.Files.readAllBytes(good.toPath)
    java.nio.file.Files.write(
      new java.io.File(root, "zz_torn.parquet").toPath,
      bytes.take(math.max(bytes.length / 3, 8)))
    spark.read.schema(clean.schema)
      .option("ignoreCorruptFiles", "true")
      .parquet(root.toString)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TextStats.tokens(col("text"))).cast("long")).as("n_tokens"),
        sum(conv(substring(md5(concat_ws("|", col("doc_id"), col("text"))), 1, 12), 16, 10)
          .cast("decimal(38,0)")).cast("decimal(38,0)").as("checksum"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("checksum").cast("string").as("checksum"))
  }
}

