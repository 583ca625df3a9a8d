package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import graft.analytics.{AnnIndex, Similarity}

/** Persisted IVF ANN index (q161). */
class AnnIndexSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private def vecs = Tables.embeddings(spark, sf("sf0.01"))
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  private def queries = vecs.filter(col("vec_id") < 10)
    .select(col("vec_id").as("query_id"), col("v").as("qv"))

  test("index results ≡ in-memory ivfTopKOn (same quantizer)") {
    AnnIndex.build(vecs, "spec_ann_eq", numCentroids = 16)
    val viaIndex = AnnIndex.topKAgainst(spark, "spec_ann_eq", queries, k = 5, nprobe = 4)
      .collect().map(_.toSeq).toSet
    val inMemory = Similarity.ivfTopKOn(vecs, queries, k = 5,
      numCentroids = 16, nprobe = 4)
      .collect().map(_.toSeq).toSet
    assert(viaIndex == inMemory)
  }

  test("plan: cells scan is dynamically partition-pruned by the probes") {
    AnnIndex.build(vecs, "spec_ann_dpp", numCentroids = 16)
    val q = AnnIndex.topKAgainst(spark, "spec_ann_dpp", queries, k = 5, nprobe = 2)
    q.count() // execute so AQE + DPP finalize
    val scans = collectWithSubqueries(q.queryExecution.executedPlan) {
      case s: FileSourceScanExec if s.toString.contains("spec_ann_dpp_cells") => s
    }
    assert(scans.nonEmpty, "cells scan not found")
    assert(scans.exists(_.toString.contains("dynamicpruning")),
      s"cells scan lacks a dynamic pruning filter:\n${scans.map(_.toString).mkString}")
  }

  test("q161 gate: planted copies found through build + extend + pruned scan") {
    val out = AnnIndex.plantedRecallGate(spark, sf("sf0.01")).collect()
    assert(out.length == 10)
    assert(out.forall(_.getAs[Boolean]("found")),
      s"queries missing their plant: ${out.filterNot(_.getAs[Boolean]("found")).mkString(",")}")
  }

  test("streaming extend: fresh vectors retrievable next batch; replay no-op") {
    import spark.implicits._
    import graft.streaming.AnnIndexStream
    AnnIndex.build(vecs, "spec_ann_stream", numCentroids = 16)
    val tmp = java.nio.file.Files.createTempDirectory("ann_stream").toString

    // batch 0 plants a scaled copy of query vector 3 through the stream path
    implicit val sqlCtx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[AnnIndexStream.VecArrival]
    val qv3 = vecs.filter(col("vec_id") === 3L).collect()(0).getSeq[Double](1)
    in.addData(AnnIndexStream.VecArrival(2000003L, qv3.map(_ * 2.0)))
    val q = AnnIndexStream.run(in.toDS(), "spec_ann_stream", tmp)
      .option("checkpointLocation", s"$tmp/_cp").start()
    try q.processAllAvailable() finally q.stop()

    val top = AnnIndex.topKAgainst(spark, "spec_ann_stream",
      vecs.filter(col("vec_id") === 3L)
        .select(col("vec_id").as("query_id"), col("v").as("qv")), k = 2)
      .collect().sortBy(_.getAs[Int]("rn"))
    assert(top(0).getAs[Long]("neighbor_id") == 2000003L)
    assert(top(0).getAs[Double]("cos_sim") == 1.0)

    // duplicate append (simulated crash-replay past the marker guard) must
    // not let the plant occupy two top-k slots
    AnnIndex.extend(Seq((2000003L, qv3.map(_ * 2.0))).toDF("vec_id", "v"), "spec_ann_stream")
    val top2 = AnnIndex.topKAgainst(spark, "spec_ann_stream",
      vecs.filter(col("vec_id") === 3L)
        .select(col("vec_id").as("query_id"), col("v").as("qv")), k = 2)
      .collect().sortBy(_.getAs[Int]("rn"))
    assert(top2(0).getAs[Long]("neighbor_id") == 2000003L)
    assert(top2(1).getAs[Long]("neighbor_id") != 2000003L,
      "duplicated index row occupied two top-k slots")

    // and a replay guarded by the marker really is a no-op
    val before = spark.table("spec_ann_stream_cells").count()
    AnnIndexStream.processBatch(spark, "spec_ann_stream",
      Seq((2000003L, qv3.map(_ * 2.0))).toDF("vec_id", "v"), 0L, tmp)
    assert(spark.table("spec_ann_stream_cells").count() == before)
  }
}
