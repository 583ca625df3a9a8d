package graft

import org.apache.spark.sql.functions._
import graft.analytics.{Formats, TextStats}

/** q200/q201 — VARIANT envelope round-trip and ORC interop. The oracle
  * gates pin the statistics against DuckDB; these specs pin the local
  * semantics the aggregate could mask: missing-path vs null extraction,
  * typed numeric extraction, and engine-internal ORC ≡ parquet equality
  * row-by-row (not just per-source sums). */
class FormatsSpec extends SparkSpec {

  test("variant_get: missing path and empty array give null; typed paths extract exactly") {
    import spark.implicits._
    val rows = Seq(
      """{"meta":{"lang":"vi","n_chars":5},"toks":["xin","chào"]}""",
      """{"meta":{"lang":"en"},"toks":[]}""",
      """{"meta":{"n_chars":7}}""")
    val out = rows.toDF("js")
      .select(
        expr("variant_get(parse_json(js), '$.meta.lang', 'string')").as("lang"),
        expr("variant_get(parse_json(js), '$.meta.n_chars', 'long')").as("nc"),
        expr("variant_get(parse_json(js), '$.toks[0]', 'string')").as("tok0"))
      .collect().map(r => (r.getString(0), if (r.isNullAt(1)) -1L else r.getLong(1), r.getString(2)))
    assert(out(0) == (("vi", 5L, "xin")), s"row0: ${out(0)}")
    assert(out(1) == (("en", -1L, null)), s"row1: ${out(1)}")   // absent n_chars, empty toks
    assert(out(2) == ((null, 7L, null)), s"row2: ${out(2)}")    // absent lang and toks entirely
  }

  test("variant round-trip preserves unicode text tokens") {
    import spark.implicits._
    val texts = Seq("tiếng Việt có dấu", "naïve — café", "日本語 テスト")
    val out = texts.toDF("text")
      .select(to_json(struct(slice(TextStats.tokens(col("text")), 1, 3).as("toks"))).as("js"))
      .select(expr("variant_get(parse_json(js), '$.toks[0]', 'string')").as("t0"))
      .collect().map(_.getString(0))
    assert(out.sameElements(Array("tiếng", "naïve", "日本語")), out.mkString(","))
  }

  test("orc round-trip: the ORC copy is row-for-row identical to the parquet source") {
    val src = graft.Tables.documents(spark, sf("sf0.001"))
      .select("doc_id", "text", "lang", "source")
    Formats.orcRoundTrip(spark, sf("sf0.001"))   // writes the copy as a side effect
    val path = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
      "graft_orc_documents").toString
    val back = spark.read.orc(path)
    assert(back.count() == src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty,
      "ORC copy differs from the parquet source")
  }

  test("schema evolution: late columns null exactly on the old generation; nothing lost") {
    val out = Formats.schemaEvolution(spark, sf("sf0.001")).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 2L))
    val total = Tables.documents(spark, sf("sf0.001")).count()
    assert(out(1L).getAs[Long]("n_docs") + out(2L).getAs[Long]("n_docs") == total)
    assert(out(1L).getAs[Long]("n_lang_null") == out(1L).getAs[Long]("n_docs"),
      "gen 1 must be entirely null in the late-added column")
    assert(out(2L).getAs[Long]("n_lang_null") == 0L, "gen 2 must have no late-column nulls")
    assert(out(1L).getAs[Long]("sum_chars") == 0L && out(2L).getAs[Long]("sum_chars") > 0L)
    // the merged view exposes the union schema
    val root = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
      "graft_evo_documents").toString
    val cols = spark.read.option("mergeSchema", "true").parquet(root).columns.toSet
    assert(Set("doc_id", "text", "source", "lang", "n_chars", "gen").subsetOf(cols), cols)
  }

  test("corrupt resilience: poison skipped with the option, fatal without it") {
    val clean = Tables.documents(spark, sf("sf0.001"))
    val out = Formats.corruptResilientRead(spark, sf("sf0.001")).collect()
    assert(out.map(_.getAs[Long]("n_docs")).sum == clean.count(),
      "resilient read must see exactly the healthy rows")
    // the poison must be real: the same directory without the option dies
    val root = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
      "graft_corrupt_documents").toString
    assert(new java.io.File(root, "zz_junk.parquet").exists() &&
      new java.io.File(root, "zz_torn.parquet").exists())
    val schema = clean.select("doc_id", "text", "source").schema
    val thrown = intercept[org.apache.spark.SparkException] {
      spark.read.schema(schema).parquet(root).groupBy("source").count().collect()
    }
    assert(thrown.getMessage != null)
  }

  test("agg pushdown: COUNT/MIN/MAX answered by the scan (PushedAggregation), values unchanged") {
    val dir = sf("sf0.001")
    // plan pin: under the gate's conf scope the DSv2 parquet scan carries
    // the whole aggregate — the query reads footers, not data pages
    Formats.withAggPushdown(spark) {
      val q = Formats.aggPushdownQuery(spark, dir)
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("PushedAggregation"),
        s"aggregate not pushed into the parquet scan:\n$plan")
      assert(plan.contains("COUNT(*)") && plan.contains("MIN(l_orderkey)"),
        s"pushed aggregate list incomplete:\n$plan")
    }
    // value pin: footer statistics must agree with the ordinary scan
    val pushed = Formats.aggPushdown(spark, dir).collect()(0).toSeq
    val plain = Formats.aggPushdownQuery(spark, dir).collect()(0).toSeq
    assert(pushed == plain, s"pushed $pushed != plain $plain")
  }
}
