package graft

import org.apache.spark.sql.functions._
import graft.analytics.Similarity
import graft.functions.VectorOps._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("vector ops: dot / norm / cosine semantics") {
    val df = Seq((Seq(1.0, 0.0, 2.0), Seq(3.0, 4.0, 0.5))).toDF("a", "b")
    val r = df.select(
      dot($"a", $"b").as("d"),
      norm2($"a").as("na"),
      cosine($"a", $"a").as("self"),
      cosine($"a", typedLit(Seq(0.0, 0.0, 0.0))).as("zero")).head()
    assert(r.getDouble(0) == 4.0)
    assert(math.abs(r.getDouble(1) - math.sqrt(5.0)) < 1e-12)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
    assert(r.isNullAt(3)) // zero-norm → null, not div-by-zero
  }

  test("l2Normalize produces unit vectors") {
    val r = Seq(Seq(3.0, 4.0)).toDF("v")
      .select(l2Normalize($"v")).head().getSeq[Double](0)
    assert(r == Seq(0.6, 0.8))
  }

  test("brute-force top-k: deterministic, k rows per query, self excluded") {
    val got = Similarity.bruteForceTopK(spark, sf("sf0.001")).collect()
    val byQuery = got.groupBy(_.getLong(0))
    assert(byQuery.keySet == (0L until 10L).toSet)
    byQuery.values.foreach { rows =>
      assert(rows.length == 5)
      assert(rows.map(_.getInt(3)).sorted.toSeq == Seq(1, 2, 3, 4, 5))
      rows.foreach(r => assert(r.getLong(0) != r.getLong(1)))
    }
  }

  test("LSH top-k: planted high-similarity neighbors are retrieved") {
    // The driver testdata embeddings are isotropic noise (max pairwise cosine
    // ≈ 0.35) — LSH is specified to find NEAR things, so recall is asserted
    // on planted near-duplicates, not on noise top-k.
    val rnd = new scala.util.Random(7)
    def vec() = Seq.fill(64)(rnd.nextGaussian())
    val corpus = (0L until 200L).map(i => (i, vec()))
    val queries = corpus.take(5).map { case (i, v) =>
      (1000L + i, v.map(x => x + rnd.nextGaussian() * 0.05)) // cos ≈ 0.999
    }
    val c = corpus.toDF("vec_id", "v")
    val q = queries.toDF("query_id", "qv")
    val got = Similarity.lshTopKOn(c, q, 3).filter($"rn" === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hits = (0 until 5).count(i => got.get(1000L + i).contains(i.toLong))
    assert(hits >= 4, s"planted neighbor found for only $hits/5 queries: $got")
  }

  test("LSH near-dup: empty on isotropic data, finds planted duplicate pair") {
    assert(Similarity.embeddingNearDup(spark, sf("sf0.001")).count() == 0)
  }

  test("IVF top-k: planted near-duplicates retrieved through probed cells") {
    val rnd = new scala.util.Random(11)
    def vec() = Seq.fill(64)(rnd.nextGaussian())
    val corpus = (0L until 200L).map(i => (i, vec()))
    val queries = corpus.take(5).map { case (i, v) =>
      (1000L + i, v.map(x => x + rnd.nextGaussian() * 0.05)) // cos ≈ 0.999
    }
    val c = corpus.toDF("vec_id", "v")
    val q = queries.toDF("query_id", "qv")
    val got = Similarity.ivfTopKOn(c, q, k = 3, numCentroids = 16, nprobe = 4)
      .filter($"rn" === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the near-twin shares its base vector's cell assignment with high prob;
    // nprobe=4 of 16 cells gives slack for boundary cases
    val hits = (0 until 5).count(i => got.get(1000L + i).contains(i.toLong))
    assert(hits >= 4, s"planted neighbor found for only $hits/5 queries: $got")
  }

  test("IVF returns k rows per query with exact re-ranked similarities") {
    val got = Similarity.ivfTopK(spark, sf("sf0.001")).collect()
    val byQuery = got.groupBy(_.getLong(0))
    assert(byQuery.keySet == (0L until 10L).toSet)
    byQuery.values.foreach { rows =>
      assert(rows.length == 5)
      rows.foreach(r => assert(r.getLong(0) != r.getLong(1)))
    }
    // every IVF similarity must equal the exact cosine for that pair (IVF
    // approximates by SKIPPING pairs, never by changing scores) — recomputed
    // here with the same left-to-right FP order as the codegen'd kernel
    val vecs = graft.Tables.embeddings(spark, sf("sf0.001"))
      .select($"vec_id", $"embedding".cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cosRound4(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    got.foreach { r =>
      val expect = cosRound4(vecs(r.getLong(0)), vecs(r.getLong(1)))
      assert(expect == r.getDouble(2),
        s"IVF score for (${r.getLong(0)},${r.getLong(1)}) diverges from exact: $expect vs ${r.getDouble(2)}")
    }
  }

  test("IVF k-means refinement flag: planted recall still holds, output shape intact") {
    spark.conf.set("spark.graft.ivf.kmeans.iters", "2")
    try {
      val rec = graft.analytics.Accuracy.ivfPlantedRecall(spark, sf("sf0.001")).head()
      assert(rec.getAs[Boolean]("planted_ok"),
        "refined quantizer must still probe every planted duplicate's cell")
      val topk = graft.analytics.Similarity.ivfTopK(spark, sf("sf0.001"))
      assert(topk.count() == 50) // 10 queries × k=5 regardless of quantizer
    } finally spark.conf.unset("spark.graft.ivf.kmeans.iters")
  }
}
