package graft.analytics

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Materialize

/** Dev-only dissection of the partitioned-append commit path (round-13
  * VERDICT item 2): the rehearsal measured ~13 ms per touched slice on a
  * fixed batch appended into a high-parts band grid — this probe separates
  * the WRITE JOB, the COMMITTER's driver-serial merge, and the CATALOG
  * partition refresh, by timing the same frame through (a) a plain
  * partitioned parquet write to a fresh dir (committer only, empty dest),
  * (b) the catalog append (committer into existing dirs + partition
  * refresh), and (c) the same append under the v2 task-side committer
  * (renames distributed — NOT a production option, see SCALING.md; here
  * purely to isolate where the serial wall lives).
  * Usage: runMain graft.analytics.AppendProbe <docsParquetDir> <parts> */
object AppendProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scale/x20")
    val parts = args.lift(1).map(_.toInt).getOrElse(4096)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"APPENDPROBE $name%-40s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    graft.functions.PhaseTimer.arm()
    t(s"build parts=$parts")(
      DedupIndex.build(docs, "probe_hp", buckets = 8, parts = parts))
    println("APPENDPROBE build legs: " + graft.functions.PhaseTimer.drain()
      .toSeq.sortBy(-_._2).map { case (k, v) => f"$k=$v%.2f" }.mkString(" "))
    val batch = docs
      .filter(col("doc_id") < 10000000L &&
        Sampling.contentBucket(col("text")) < 2)
      .select((col("doc_id") + lit(900000000L)).as("doc_id"), col("text"))
    val sigs = Materialize(batch.select(col("doc_id"),
      Dedup.minhashSignature(graft.analytics.TextStats.wordShingles(
        col("text"))).as("mhs")))
    val bands = Materialize(Dedup.bandsOf(sigs).withColumn("pb",
      pmod(xxhash64(col("band"), col("band_key")), lit(parts.toLong))))
    val touched = bands.select(col("pb")).distinct().count()
    println(s"APPENDPROBE touched=$touched of $parts")

    t("plain partitioned write, fresh dir")(
      bands.repartition(col("pb")).write.mode("overwrite")
        .partitionBy("pb").parquet("target/probe_hp_plain"))
    t("plain write, one task per touched slice")(
      bands.repartition(touched.toInt, col("pb")).write.mode("overwrite")
        .partitionBy("pb").parquet("target/probe_hp_plain2"))
    t("plain write, maxRecordsPerFile instead of repartition")(
      bands.write.mode("overwrite")
        .partitionBy("pb").parquet("target/probe_hp_plain3"))
    t("catalog append (production path)")(
      graft.sink.Bucketed.appendPartitioned(bands, "probe_hp_bands", "pb"))
    val hc = spark.sparkContext.hadoopConfiguration
    hc.setInt("mapreduce.fileoutputcommitter.algorithm.version", 2)
    try t("catalog append, v2 committer")(
      graft.sink.Bucketed.appendPartitioned(bands, "probe_hp_bands", "pb"))
    finally hc.setInt("mapreduce.fileoutputcommitter.algorithm.version", 1)
    spark.stop()
  }
}
