package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import graft.analytics.Sampling
import graft.functions.Observed

/** Operational observability surfaces: observed metrics (one-pass gate
  * counters) and `_metadata` file provenance on the shard layout. */
class ObservabilitySpec extends SparkSpec {

  test("observe: gate metrics collected during the action, no second scan") {
    val d = sf("sf0.01")
    val docs = Tables.documents(spark, d)
      .withColumn("lang2", when(col("doc_id") % 50 === 0, lit(null: String))
        .otherwise(col("lang")))
    val obs = Observation("gate")
    val observed = Observed.withGateMetrics(docs, obs, Seq("lang2", "text"))
    val n = observed.count()
    val m = obs.get
    assert(m("n_rows") == n, s"observed row count must equal the action's: $m")
    assert(m("null_lang2") == docs.filter(col("doc_id") % 50 === 0).count(),
      s"null-violation counter must match a direct recount: $m")
    assert(m("null_text") == 0L)
  }

  test("_metadata provenance: every physical file holds exactly one shard; counts match the manifest") {
    val d = sf("sf0.01")
    val manifest = Sampling.shardedWriteGate(spark, d).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_docs")).toMap
    // _metadata.file_path ties each row to the parquet file that holds it —
    // the lineage audit a trainer runs when a shard checksum mismatches
    val byFile = spark.table("graft_shards")
      .select(col("shard_id"), col("_metadata.file_path").as("f"))
      .groupBy(col("f"))
      .agg(countDistinct(col("shard_id")).as("n_shards"),
        first(col("shard_id")).as("shard_id"), count(lit(1)).as("n_rows"))
      .collect()
    assert(byFile.nonEmpty)
    byFile.foreach { r =>
      assert(r.getAs[Long]("n_shards") == 1L,
        s"a physical file must belong to exactly one shard partition: $r")
      assert(r.getAs[String]("f").contains(s"shard_id=${r.getAs[Long]("shard_id")}"),
        s"file path must live under its shard's partition directory: $r")
    }
    val perShard = byFile.groupBy(_.getAs[Long]("shard_id"))
      .view.mapValues(_.map(_.getAs[Long]("n_rows")).sum).toMap
    assert(perShard == manifest,
      "file-level row counts must reconcile with the shard manifest")
  }
}
