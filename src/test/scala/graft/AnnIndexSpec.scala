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
}
