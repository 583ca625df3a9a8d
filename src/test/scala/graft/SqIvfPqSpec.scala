package graft

import org.apache.spark.sql.functions._
import graft.analytics.Similarity
import graft.functions.Sketches

/** int8 scalar quantization (q85/q86) and the IVF-PQ composition (q87/q88):
  * kernel semantics on hand vectors, planted-copy retrieval on the corpus. */
class SqIvfPqSpec extends SparkSpec {
  import spark.implicits._

  test("sq kernels: scale/encode/adc round-trip, zero-vector guard") {
    val rows = Seq(
      (1L, Seq(1.0, -0.5, 0.25, 0.0)),
      (2L, Seq(0.0, 0.0, 0.0, 0.0)), // zero vector: scale 1, codes 0, sim 0
      (3L, Seq(-2.0, 2.0, 1.0, -1.0))
    ).toDF("id", "v")
    val got = rows.select($"id",
        Sketches.sqScale($"v").as("s"),
        Sketches.sqEncode($"v").as("c"),
        Sketches.sqAdcSim($"v", Sketches.sqEncode($"v"), Sketches.sqScale($"v")).as("self"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Int](2), r.getDouble(3))).toList

    val r1 = got.find(_._1 == 1L).get
    assert(r1._2 == 1.0 / 127.0)
    // Java Math.round rounds half toward +infinity: round(-63.5) = -63
    assert(r1._3 == Seq(127, -63, 32, 0), s"got ${r1._3}")
    val r2 = got.find(_._1 == 2L).get
    assert(r2._2 == 1.0 && r2._3 == Seq(0, 0, 0, 0) && r2._4 == 0.0,
      "zero vector must encode to zeros with scale 1 and sim 0")
    val r3 = got.find(_._1 == 3L).get
    assert(r3._3 == Seq(-127, 127, 64, -63), s"got ${r3._3}")
    // self-ADC approximates the true squared norm within quantization error
    val trueNorm1 = 1.0 + 0.25 + 0.0625
    assert(math.abs(r1._4 - trueNorm1) < 0.01, s"self sim ${r1._4} vs $trueNorm1")
  }

  test("sq encode: reconstruction error bounded by scale/2 per component") {
    val e = graft.Tables.embeddings(spark, sf("sf0.001"))
      .select($"vec_id", $"embedding".cast("array<double>").as("v")).limit(20)
    val bad = e.select(
        Sketches.sqScale($"v").as("s"), Sketches.sqEncode($"v").as("c"), $"v")
      .select(expr("aggregate(zip_with(v, c, (x, y) -> abs(x - y * s)), 0.0d, (a, x) -> greatest(a, x))").as("maxerr"),
        $"s")
      .filter($"maxerr" > $"s" * 0.5 + 1e-12)
    assert(bad.count() == 0, "quantization error must stay within scale/2")
  }

  test("q85/q86: SQ planted scaled copy retrieved at rank 1, cos 1.0") {
    val e = graft.Tables.embeddings(spark, sf("sf0.001"))
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val q = e.filter($"vec_id" < 3)
    val planted = q.select(($"vec_id" + 1000000L).as("vec_id"),
      expr("transform(v, x -> x * 2.0d)").as("v"))
    val topk = Similarity.sqTopKOn(e.unionByName(planted),
      q.select($"vec_id".as("query_id"), $"v".as("qv")), k = 5)
    val rank1 = topk.filter($"rn" === 1).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    (0L until 3L).foreach { qid =>
      assert(rank1(qid) == (qid + 1000000L, 1.0),
        s"query $qid: planted copy must be rank 1 at cos 1.0, got ${rank1(qid)}")
    }
    // k rows per query, deterministic across runs
    val counts = topk.groupBy($"query_id").count().collect().map(_.getLong(1))
    assert(counts.forall(_ == 5L))
  }

  test("q87/q88: IVF-PQ composition retrieves planted copies; no nested loop on corpus") {
    val e = graft.Tables.embeddings(spark, sf("sf0.001"))
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val q = e.filter($"vec_id" < 3)
    val planted = q.select(($"vec_id" + 1000000L).as("vec_id"),
      expr("transform(v, x -> x * 2.0d)").as("v"))
    val topk = Similarity.ivfPqTopKOn(e.unionByName(planted),
      q.select($"vec_id".as("query_id"), $"v".as("qv")), k = 5)
    val rank1 = topk.filter($"rn" === 1).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    (0L until 3L).foreach { qid =>
      assert(rank1(qid) == (qid + 1000000L, 1.0),
        s"query $qid: planted copy must survive cell pruning + ADC, got ${rank1(qid)}")
    }
    // candidate generation must stay an equi-join on cell id: the corpus
    // side must never enter a nested-loop/cartesian against the queries
    val p = Similarity.ivfPqTopK(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    val corpusNested = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    // single-row codebook/centroid broadcasts are legitimate nested-loop
    // sides; the corpus-cell candidate join itself must be hash/sort-merge
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"), p)
    // every codebook/query attach must be an explicit broadcast NLJ — an
    // unpinned crossJoin would surface as CartesianProduct and shuffle
    // the corpus side
    assert(!p.contains("CartesianProduct"),
      "codebook crossJoins must broadcast their small side:\n" + p)
  }

  test("q97/q98: IVF-SQ composition retrieves planted copies; equi-join candidates") {
    val e = graft.Tables.embeddings(spark, sf("sf0.001"))
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val q = e.filter($"vec_id" < 3)
    val planted = q.select(($"vec_id" + 1000000L).as("vec_id"),
      expr("transform(v, x -> x * 2.0d)").as("v"))
    val topk = Similarity.ivfSqTopKOn(e.unionByName(planted),
      q.select($"vec_id".as("query_id"), $"v".as("qv")), k = 5)
    val rank1 = topk.filter($"rn" === 1).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    (0L until 3L).foreach { qid =>
      assert(rank1(qid) == (qid + 1000000L, 1.0),
        s"query $qid: planted copy must survive cell pruning + SQ ADC, got ${rank1(qid)}")
    }
    // the corpus-cell candidate join must be hash/sort-merge, not nested loop
    val p = Similarity.ivfSqTopK(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"), p)
  }
}
