package graft

import org.apache.spark.sql.functions._
import graft.analytics.QualityProbe

/** Trained linear quality probe (q163) — exact-integer GD. */
class QualityProbeSpec extends SparkSpec {
  import spark.implicits._

  test("label rule and feature scales on a hand corpus") {
    val docs = Seq(
      (1L, "the cat sat of the mat and then came back in again"), // clean → 1
      (2L, "000 111 222 333 444 555 666 777 888 999"),            // digits → 0
      (3L, "word"),                                               // too short → 0
      (4L, "aaaa bbbb cccc dddd eeee ffff gggg hhhh")              // no stopword → 0
    ).toDF("doc_id", "text")
    val f = QualityProbe.features(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(f(1L).getAs[Long]("y") == 1000000L)
    assert(f(2L).getAs[Long]("y") == 0L)
    assert(f(3L).getAs[Long]("y") == 0L)
    assert(f(4L).getAs[Long]("y") == 0L)
    assert(f.values.forall(r => (0 to 4).forall(j =>
      r.getAs[Long](s"f$j") >= 0L && r.getAs[Long](s"f$j") <= 1000000L)))
  }

  test("training reduces squared error; scores separate the classes") {
    val out = QualityProbe.trainedScores(spark, sf("sf0.01")).cache()
    val agg = out.agg(
      avg(when(col("label") === 1000000L, col("score_micro"))).as("pos"),
      avg(when(col("label") === 0L, col("score_micro"))).as("neg"),
      // SSR with w=0 is Σ y²; final SSR from the residuals
      sum((col("score_micro") - col("label")) * (col("score_micro") - col("label"))).as("ssr"),
      sum(col("label") * col("label")).as("ssr0")).collect()(0)
    assert(agg.getAs[Double]("pos") > agg.getAs[Double]("neg"),
      s"no separation: pos ${agg.getAs[Double]("pos")} vs neg ${agg.getAs[Double]("neg")}")
    assert(agg.getAs[Long]("ssr") < agg.getAs[Long]("ssr0"),
      "GD did not reduce the loss below the w=0 start")
    out.unpersist()
  }

  test("weights are layout-independent (integer sums, any partitioning)") {
    val f = QualityProbe.features(
      Tables.documents(spark, sf("sf0.01")).select(col("doc_id"), col("text")))
    val w1 = QualityProbe.trainOn(f, 8).collect()(0).toSeq
    val w2 = QualityProbe.trainOn(f.repartition(13, col("doc_id")), 8).collect()(0).toSeq
    assert(w1 == w2, s"$w1 vs $w2")
  }

  test("decimalGrads mode is bitwise-identical below the Long cliff") {
    // spark.graft.quality.decimalGrads=true moves the gradient sums to
    // DECIMAL(38,0) — the >4.6M-row overflow headroom. Below the cliff the
    // exact decimal sum equals the Long sum and both div paths truncate
    // toward zero, so every weight AND every score must match bit for bit.
    val d = sf("sf0.01")
    val longScores = QualityProbe.trainedScores(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    spark.conf.set("spark.graft.quality.decimalGrads", "true")
    try {
      val decScores = QualityProbe.trainedScores(spark, d)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(decScores == longScores,
        s"decimal-grad scores diverge: ${decScores.size} vs ${longScores.size}")
    } finally spark.conf.unset("spark.graft.quality.decimalGrads")
  }
}
