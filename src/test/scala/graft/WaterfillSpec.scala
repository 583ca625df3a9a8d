package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.analytics.Sampling

/** q197/q198/q199 — token-budget waterfilling and covariate-matched
  * downsampling. The solve is closed-form integer arithmetic; these specs
  * pin the three arms of the CASE (feasible level, balanced corpus,
  * budget ≥ total), the optimality property (allocation fits the budget,
  * cap+1 would not), and the feasibility contracts of the applied forms. */
class WaterfillSpec extends SparkSpec {

  private def solve(rows: Seq[(String, Long)], budget: Long): Map[String, (Long, Long, Long, Boolean)] = {
    import spark.implicits._
    Sampling.waterfillOn(rows.toDF("source", "n_tokens"), lit(budget))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toMap
  }

  test("skewed corpus: cap binds the heavy sources; allocation is maximal") {
    val out = solve(Seq(("a", 10L), ("b", 20L), ("c", 100L), ("d", 1000L)), 130L)
    // t asc: 10,20,100,1000; g(2)=70 ≤ 130 < g(3)=230 → C = 20 + 60/2 = 50
    assert(out.values.forall(_._2 == 50L), s"cap: $out")
    assert(out("a") == ((10L, 50L, 10L, false)) && out("b") == ((20L, 50L, 20L, false)))
    assert(out("c") == ((100L, 50L, 50L, true)) && out("d") == ((1000L, 50L, 50L, true)))
    assert(out.values.map(_._3).sum == 130L)   // exactly exhausts the budget here
  }

  test("balanced corpus: no feasible level — cap = floor(B/n)") {
    val out = solve(Seq(("a", 100L), ("b", 100L), ("c", 100L), ("d", 100L)), 130L)
    assert(out.values.forall(_._2 == 32L), s"cap: $out")        // 130/4
    assert(out.values.map(_._3).sum == 128L)                    // ≤ 130; 4·33 = 132 > 130
    assert(out.values.forall(_._4), "every source must be capped")
  }

  test("budget covers the corpus: nothing capped, cap = max source") {
    val out = solve(Seq(("a", 10L), ("b", 20L), ("c", 30L)), 100L)
    assert(out.values.forall(_._2 == 30L), s"cap: $out")
    assert(out.values.forall(!_._4) && out.values.map(_._3).sum == 60L)
  }

  test("optimality property: Σ min(t, C) ≤ B < Σ min(t, C+1), seeded corpora") {
    for (seed <- Seq(1, 7, 42, 99)) {
      val rnd = new scala.util.Random(seed)
      val n = 3 + rnd.nextInt(12)
      val rows = (0 until n).map(i => (s"s$i", 1L + rnd.nextInt(5000).toLong))
      val total = rows.map(_._2).sum
      val b = 1L + (math.abs(rnd.nextLong()) % total)
      val out = solve(rows, b)
      val cap = out.values.head._2
      assert(out.values.forall(_._2 == cap), s"seed $seed: cap not constant")
      def allocAt(c: Long) = rows.map(r => math.min(r._2, c)).sum
      assert(allocAt(cap) <= b, s"seed $seed: allocation ${allocAt(cap)} over budget $b at cap $cap")
      if (b < total)
        assert(allocAt(cap + 1) > b, s"seed $seed: cap $cap not maximal for budget $b")
      for ((s, t) <- rows)
        assert(out(s)._3 == math.min(t, cap) && out(s)._4 == (t > cap), s"seed $seed: row $s")
    }
  }

  test("q198 apply: per-source tokens kept never exceed the cap; kept set is the maximal hash prefix") {
    val out = Sampling.waterfillApply(spark, sf("sf0.001")).collect()
    assert(out.nonEmpty)
    for (r <- out) {
      val (cap, nKept, tokKept, utilBp) =
        (r.getAs[Long]("cap"), r.getAs[Long]("n_kept"), r.getAs[Long]("tok_kept"), r.getAs[Long]("util_bp"))
      assert(tokKept <= cap, s"${r.getString(0)}: kept $tokKept > cap $cap")
      assert(utilBp <= 10000L && nKept >= 1L)
    }
    // maximality of the prefix: for one source, the first excluded doc
    // (hash order) would push the running total past the cap
    val caps = Sampling.waterfillCaps(spark, sf("sf0.001"))
      .select("source", "cap").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
      .select(col("source"), col("doc_id"),
        size(graft.analytics.TextStats.tokens(col("text"))).cast("long").as("n_tok"),
        md5(col("text").cast("binary")).as("h"))
      .collect()
      .groupBy(_.getString(0))
    val kept = out.map(r => r.getString(0) -> r.getAs[Long]("tok_kept")).toMap
    for ((src, rows) <- docs; cap <- caps.get(src)) {
      var cum = 0L; var keptTok = 0L; var done = false
      for (r <- rows.sortBy(x => (x.getString(3), x.getLong(1)))) {
        cum += r.getLong(2)
        if (cum <= cap) keptTok = cum else done = true
      }
      assert(kept.getOrElse(src, 0L) == keptTok,
        s"$src: engine kept ${kept.get(src)}, reference prefix kept $keptTok")
    }
  }

  test("q199 matched resample: quotas feasible, proportional to test profile, selection sums verified") {
    val out = Sampling.matchedResample(spark, sf("sf0.001")).collect()
    assert(out.nonEmpty)
    val tTot = out.map(_.getAs[Long]("n_test")).sum
    for (r <- out) {
      val (nTrain, nTest, pBp, k) = (r.getAs[Long]("n_train"), r.getAs[Long]("n_test"),
        r.getAs[Long]("p_bp"), r.getAs[Long]("k_quota"))
      assert(pBp == nTest * 10000L / tTot)
      assert(k <= nTrain, s"bucket ${r.getAs[Long]("bucket")}: quota $k exceeds train pool $nTrain")
    }
    // the binding bucket (min feasibility ratio) is filled to its pool's
    // proportional limit: k_quota = floor(p_bp * M / 10000) with
    // M = min_b floor(n_train_b * 10000 / p_bp_b)
    val m = out.map(r => r.getAs[Long]("n_train") * 10000L / r.getAs[Long]("p_bp")).min
    for (r <- out)
      assert(r.getAs[Long]("k_quota") == r.getAs[Long]("p_bp") * m / 10000L)
  }
}
