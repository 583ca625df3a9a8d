package graft.analytics

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Materialize

/** Dev-only stage-timing probe (not part of the public surface). */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
      println(f"PROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }

    // warm table read
    graft.Tables.lineitem(spark, dir).count()

    val und = t("edges_build+mat") {
      Materialize(Graph.supportedEdges(spark, dir, 2))
    }
    val edges = t("double+mat") {
      Materialize(und.select(col("pa").as("src"), col("pb").as("dst"))
        .unionByName(und.select(col("pb").as("src"), col("pa").as("dst"))))
    }
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val outEdges = t("outEdges+mat") { Materialize(edges.join(deg, "src")) }
    val nodes = t("nodes+mat") { Materialize(deg.select(col("src").as("node"))) }
    var ranks = nodes.select(col("node"), lit(1000000L).as("r"))
    (1 to 5).foreach { i =>
      val contrib = outEdges.join(ranks, col("src") === col("node"))
        .select(col("dst"), expr("r div deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      ranks = nodes
        .join(contrib, col("node") === col("dst"), "left")
        .selectExpr("node", "150000 + (850 * coalesce(s, 0)) div 1000 AS r")
    }
    t("unrolled_5iters_noop") { ranks.write.format("noop").mode("overwrite").save() }
    t("full_pagerank_noop") {
      Graph.pageRank(spark, dir).write.format("noop").mode("overwrite").save()
    }
    t("full_pagerank_noop2") {
      Graph.pageRank(spark, dir).write.format("noop").mode("overwrite").save()
    }
    t("edges_build_noop2") {
      Graph.supportedEdges(spark, dir, 2).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
