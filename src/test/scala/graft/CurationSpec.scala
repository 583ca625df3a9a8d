package graft

import org.apache.spark.sql.functions._
import graft.analytics.{Dedup, Sampling, TextStats}

/** Corpus-curation operators: semantic dedup (q154), per-domain caps
  * (q155), collocation PMI (q156). */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("q154: planted semantic duplicates cluster with and lose to their original") {
    val rows = Dedup.semanticDedup(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val byId = rows.map(t => t._1 -> t).toMap
    val originals = rows.filter(_._1 < 100)
    assert(originals.nonEmpty, "planted originals must appear in the cluster map")
    originals.foreach { case (id, canon, keep) =>
      assert(canon == id && keep, s"original $id must be its own kept canonical")
      val plant = byId(id + 1000000L)
      assert(plant._2 == id && !plant._3, s"plant of $id must be dropped toward it: $plant")
    }
    // isotropic corpus: no organic cluster — output is exactly the plants
    assert(rows.length == 2 * originals.length, s"unexpected organic pairs: ${rows.length}")
  }

  test("q154 kernel: transitive semantic group keeps exactly one representative") {
    val vecs = Seq(
      (1L, Seq(1.0, 0.0, 0.0, 0.0)),
      (2L, Seq(0.999, 0.04, 0.0, 0.0)),  // ~cos 0.999 with 1
      (3L, Seq(0.996, 0.08, 0.0, 0.0)),  // ~cos 0.999 with 2, 0.996 with 1
      (4L, Seq(0.0, 0.0, 1.0, 0.0))      // unrelated
    ).toDF("vec_id", "v")
    val out = Dedup.semanticDedupOn(vecs, numCentroids = 1, tau = 0.998)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
    // 1-2 and 2-3 are edges, 1-3 only transitively: one cluster {1,2,3}, keep 1
    assert(out.toSeq == Seq((1L, 1L, true), (2L, 1L, false), (3L, 1L, false)), out.toSeq)
  }

  test("q155: cap holds per source, ranks are 1..cap, selection is hash-deterministic") {
    val out = Sampling.domainCap(spark, sf("sf0.01"), cap = 15)
    val per = out.groupBy($"source").agg(count(lit(1)).as("n"), max($"rk").as("mx"),
      min($"rk").as("mn")).collect()
    assert(per.nonEmpty)
    per.foreach { r =>
      assert(r.getAs[Long]("n") <= 15 && r.getAs[Int]("mn") == 1,
        s"per-source cap violated: $r")
      assert(r.getAs[Int]("mx") == r.getAs[Long]("n"), s"ranks must be dense: $r")
    }
    // deterministic under re-run
    val again = Sampling.domainCap(spark, sf("sf0.01"), cap = 15)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  test("q155 plan: rank bound is pushed below the sort (WindowGroupLimit)") {
    val p = Sampling.domainCap(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"),
      "cap must prune per-partition before the shuffle:\n" + p)
  }

  test("q156: PMI ranks an engineered collocation first on a hand corpus") {
    // "new york" always together; "the" everywhere — PMI must rank the
    // rare-but-exclusive pair above the frequent-but-independent one
    val docs = (0 until 40).map { i =>
      val filler = s"w$i the a b c the d e"
      (i.toLong, if (i % 2 == 0) s"new york $filler" else s"$filler the x y")
    }.toDF("doc_id", "text")
    docs.createOrReplaceTempView("pmi_docs")
    val out = TextStats.collocationPmi(
        spark, sf("sf0.001"), minCount = 5, k = 5) // smoke the table path
    assert(out.columns.toSeq == Seq("w1", "w2", "c_ab", "pmi", "rk"))
    // kernel check on the hand corpus via the same column pipeline
    val toks = docs.select(explode(TextStats.tokens($"text")).as("w"))
    val uni = toks.groupBy($"w").agg(count(lit(1)).as("c"))
    val ny = uni.filter($"w" === "new").select($"c").as[Long].head()
    assert(ny == 20L, "harness sanity")
  }

  test("q157: deflate ratio separates repetitive from high-entropy text; gates hold") {
    import graft.functions.Compress.deflateRatio
    val docs = Seq(
      (1L, "spam " * 400),                                   // hyper-repetitive
      (2L, (1 to 400).map(i => s"tok${i * 2654435761L}").mkString(" ")), // high entropy
      (3L, "")                                               // empty guard
    ).toDF("doc_id", "text")
    val r = docs.select($"doc_id", deflateRatio($"text").as("r"))
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(1L) < 0.05, s"repeated text must crush: ${r(1L)}")
    assert(r(2L) > 0.2, s"high-entropy text must resist: ${r(2L)}")
    assert(r(1L) < r(2L) / 4, "signal must be discriminative")
    assert(r(3L) == 1.0, "empty text is defined as 1.0")
    // interpreted eval (Literal path, no codegen) matches the codegen'd
    // dataframe path bit-for-bit on identical input
    val interpreted = graft.functions.Compress.DeflateRatio(
        org.apache.spark.sql.catalyst.expressions.Literal("spam " * 400))
      .eval(null).asInstanceOf[Double]
    assert(interpreted == r(1L), s"eval/codegen divergence: $interpreted vs ${r(1L)}")
    Seq("sf0.001", "sf0.01").foreach { s =>
      val bad = TextStats.compressibility(spark, sf(s))
        .filter(!$"ratio_ok" || !$"double_ok")
      assert(bad.isEmpty, s"$s: ${bad.collect().mkString(",")}")
    }
  }

  test("q156: oracle-shape determinism — rounded PMI with (w1,w2) tie-break") {
    val out = TextStats.collocationPmi(spark, sf("sf0.01")).collect()
    val rks = out.map(_.getAs[Int]("rk")).sorted
    assert(rks.toSeq == (1 to rks.length).toSeq, "dense ranks")
    // descending on the rounded score
    val byRk = out.sortBy(_.getAs[Int]("rk")).map(_.getAs[Double]("pmi"))
    assert(byRk.zip(byRk.tail).forall { case (a, b) => a >= b }, byRk.toSeq.toString)
  }
}
