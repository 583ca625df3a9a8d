package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.analytics.Multimodal
import graft.sink.BatchViews

class SinkMultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("raw-zone sink: ingest_date partition layout + pruning") {
    val tmp = Files.createTempDirectory("graft_sink").toString
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    BatchViews.writeRawZone(df, tmp, "2025-04-24")
    BatchViews.writeRawZone(Seq((3L, "c")).toDF("id", "v"), tmp, "2025-04-25")
    assert(new java.io.File(s"$tmp/ingest_date=2025-04-24").exists())
    val read = spark.read.parquet(tmp)
    assert(read.count() == 3)
    // partition pruning: only one partition's files scanned
    val pruned = read.filter($"ingest_date" === "2025-04-25")
    assert(pruned.count() == 1)
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("ingest_date"), "partition filter should reach the scan")
  }

  test("csv sink round-trips with header") {
    val tmp = Files.createTempDirectory("graft_csv").toString
    BatchViews.writeCsv(Seq((1L, "x")).toDF("id", "v"), tmp)
    val back = spark.read.option("header", "true").csv(tmp)
    assert(back.columns.toSeq == Seq("id", "v") && back.count() == 1)
  }

  test("multimodal decode: deterministic stub over binary payloads") {
    val meta = Multimodal.decodeMeta(spark, sf("sf0.001"))
    val r = meta.filter($"doc_id" === 0L).head()
    val nb = r.getAs[Int]("n_bytes")
    assert(r.getAs[Int]("width") == nb % 640 + 32)
    assert(r.getAs[Int]("height") == (nb * 7) % 480 + 32)
    assert(r.getAs[String]("fmt") == "jpg")
    assert(r.getAs[Int]("n_frames") == 1)
    assert(meta.count() == 500)
  }

  test("q118/q119: perceptual hash — single-byte edit stays within 2 bits, planted found") {
    import Multimodal.PerceptualHash
    // tile/hash determinism and locality on hand bytes
    val p = Array.tabulate(720)(i => ((i * 37) % 251).toByte)
    val h1 = PerceptualHash.of(p)
    val p2 = p.clone(); p2(719) = (p2(719) ^ 0x7F).toByte // big flip, last cell only
    val h2 = PerceptualHash.of(p2)
    assert(java.lang.Long.bitCount(h1 ^ h2) <= 2,
      "a last-byte edit may move only the final cell's two comparisons")
    // unrelated payloads should differ widely (sanity, not a guarantee)
    val q = Array.tabulate(720)(i => ((i * 101 + 7) % 249).toByte)
    assert(java.lang.Long.bitCount(h1 ^ PerceptualHash.of(q)) > 8)

    // planted perturbed copies are retrieved on the corpus
    val row = Multimodal.phashPlantedRecall(spark, sf("sf0.001")).head()
    assert(row.getLong(0) == 10 && row.getBoolean(1),
      s"planted recall failed: $row")

    // candidate generation is an equi-join (no nested loop over media)
    val plan = Multimodal.phashNearDup(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") || plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
