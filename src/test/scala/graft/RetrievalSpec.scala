package graft

import org.apache.spark.sql.functions._
import graft.analytics.TextStats

/** Ranked retrieval (q176 BM25, q177 hybrid RRF): scoring semantics pinned
  * on hand-built corpora, fusion arithmetic re-derived from the output. */
class RetrievalSpec extends SparkSpec {

  test("q176 BM25: coverage, idf rarity, and length normalization order the ranking") {
    import spark.implicits._
    // 'cat' appears in 3 docs (common), 'dog' in 1 (rare); doc 4 is doc 2's
    // text padded with filler, so it matches the same terms at greater length
    val docs = Seq(
      (1L, "cat dog x y"),
      (2L, "cat x y z"),
      (3L, "cat a b c"),
      (4L, "cat x y z f f f f f f f f"),
      (5L, "a b c d")).toDF("doc_id", "text")
    val q = Seq((0, "cat"), (0, "dog")).toDF("query_id", "term")
    val out = TextStats.bm25On(docs, q, 10).collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getDouble(3), r.getInt(4))).toMap
    assert(!out.contains(5L), "a doc with no query term never scores")
    assert(out(1L)._1 == 2 && out(2L)._1 == 1, "n_hit_terms counts matched terms")
    assert(out(1L)._3 == 1, "both-term doc outranks every single-term doc")
    // same tf, same term: shorter doc wins on length normalization
    assert(out(2L)._2 > out(4L)._2, "b>0 must penalize the padded doc")
    // the rare term's idf exceeds the common term's: dog's contribution
    // alone dwarfs cat's, so doc 1 scores well past doc 2 doubled
    assert(out(1L)._2 > 2 * out(2L)._2)
  }

  test("q176 BM25 over the corpus: dense per-query ranks, scores non-increasing") {
    val r = TextStats.bm25TopK(spark, sf("sf0.001")).collect()
    val byQ = r.groupBy(_.getInt(0))
    assert(byQ.keySet == Set(0, 1, 2))
    byQ.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getInt(4))
      assert(sorted.map(_.getInt(4)).toSeq == (1 to rows.length), "ranks dense from 1")
      val scores = sorted.map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        "scores non-increasing in rank")
    }
  }

  test("q178 MMR: an exact duplicate of the top pick loses round 2 to a diverse doc") {
    import spark.implicits._
    // query [1,0,0,0]; docs 10 and 11 are EXACT copies (rel ≈ .902); doc 12
    // has the same relevance but overlaps the query in a different
    // direction, so its max-sim to the selected set is ~.81 vs the copy's
    // 1.0 — at λ=0.7 diversity flips the round-2 pick
    val e = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)),
      (10L, Seq(0.9f, 0.43f, 0f, 0f)),
      (11L, Seq(0.9f, 0.43f, 0f, 0f)),
      (12L, Seq(0.9f, 0f, 0.43f, 0f))).toDF("vec_id", "embedding")
    val picks = TextStats.mmrRerankOn(e, 1, 3, 10).collect()
      .sortBy(_.getInt(2)).map(_.getLong(1)).toSeq
    assert(picks == Seq(10L, 12L, 11L),
      s"expected copy demoted to pick 3, got $picks")
    // pure relevance would have ordered 10, 11 (copy) first
  }

  test("q177 RRF: fused score re-derives from the emitted leg ranks") {
    val r = TextStats.hybridRrf(spark, sf("sf0.001")).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (lex, sem, rrf) = (row.getInt(2), row.getInt(3), row.getDouble(4))
      val want = (if (lex > 0) 1.0 / (60 + lex) else 0.0) +
        (if (sem > 0) 1.0 / (60 + sem) else 0.0)
      assert(math.abs(rrf - want) < 1e-6, s"rrf $rrf != 1/(60+$lex)+1/(60+$sem)")
      assert(lex > 0 || sem > 0, "a fused doc must come from at least one leg")
    }
    val byQ = r.groupBy(_.getInt(0))
    byQ.foreach { case (_, rows) =>
      assert(rows.map(_.getInt(5)).sorted.toSeq == (1 to rows.length))
      val sorted = rows.sortBy(_.getInt(5))
      val f = sorted.map(_.getDouble(4))
      assert(f.zip(f.tail).forall { case (a, b) => a >= b })
    }
  }

  test("q196 agreement: set bounds hold, overlap re-derives from the leg top-10s") {
    import graft.analytics.TextStats
    val d = sf("sf0.01")
    val out = TextStats.retrievalAgreement(spark, d).collect()
    assert(out.length == 3, "one row per retrieval query")
    out.foreach { r =>
      val (nl, ns, nb, bp) = (r.getAs[Long]("n_lex"), r.getAs[Long]("n_sem"),
        r.getAs[Long]("n_both"), r.getAs[Long]("overlap_bp"))
      assert(nl <= 10 && ns == 10, s"legs must self-bound to k: $r")
      assert(nb <= math.min(nl, ns) && bp == nb * 1000, s"overlap must be the exact ratio: $r")
    }
    // cross-check n_both against an independent recompute of the lex leg
    val lexSets = TextStats.bm25TopK(spark, d, 10).collect()
      .groupBy(_.getAs[Int]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("doc_id")).toSet).toMap
    out.foreach { r =>
      val qid = r.getAs[Int]("query_id")
      assert(r.getAs[Long]("n_lex") == lexSets(qid).size.toLong)
    }
  }

  test("q204 eval: metrics re-derive from the run and an independent ground truth") {
    import graft.analytics.TextStats
    val d = sf("sf0.001")
    val out = TextStats.retrievalEval(spark, d).collect()
      .map(r => r.getAs[Int]("query_id") -> r).toMap
    assert(out.keySet == Set(0, 1, 2))
    // independent ground truth: driver-side containment over the raw text
    val docs = Tables.documents(spark, d).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split("\\s+").filter(_.nonEmpty).toSet)
    val run = TextStats.bm25TopK(spark, d, 10).collect()
      .groupBy(_.getAs[Int]("query_id"))
      .view.mapValues(_.sortBy(_.getAs[Int]("rn")).map(_.getAs[Long]("doc_id"))).toMap
    for ((qid, qs) <- TextStats.RetrievalQueries) {
      val terms = qs.split(" ").toSet
      val rel = docs.filter { case (_, ts) => terms.subsetOf(ts) }.map(_._1).toSet
      val ranked = run(qid)
      val hits = ranked.count(rel)
      val first = ranked.zipWithIndex.collectFirst { case (id, i) if rel(id) => i + 1 }
      val r = out(qid)
      assert(r.getAs[Long]("n_rel") == rel.size.toLong, s"q$qid n_rel")
      assert(r.getAs[Long]("hits_at_k") == hits.toLong, s"q$qid hits")
      assert(r.getAs[Long]("mrr_bp") == first.map(10000L / _).getOrElse(0L), s"q$qid mrr")
      assert(r.getAs[Long]("recall_bp") == hits.toLong * 10000L / rel.size, s"q$qid recall")
      assert(rel.nonEmpty && r.getAs[Long]("recall_bp") <= 10000L)
    }
  }
}
