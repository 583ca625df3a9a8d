package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.lineitem
import graft.functions.Materialize

/** Distributed graph analytics over derived edge lists. The iterative
  * member of the family (connected components) lives in [[Dedup]]; this
  * object holds the non-iterative whole-graph statistics.
  *
  * Scale posture: everything is equi-joins and partial+final aggregates on
  * the EDGE list (never the raw fact table), and triangle enumeration uses
  * the degree-ordered orientation — the standard trick that bounds wedge
  * fan-out by graph arboricity instead of max degree, which is the
  * difference between "finishes" and "hot-key explosion" on power-law
  * graphs at warehouse scale. */
object Graph {

  /** q130: triangle count + global clustering coefficient of the
    * co-purchase graph (parts linked when ≥ minSupport orders contain
    * both — q124's edge rule). Output is one row: node/edge/wedge/triangle
    * counts and the global clustering coefficient 3·T / W.
    *
    * Triangle enumeration orients each undirected edge from the
    * (degree, id)-smaller endpoint to the larger; under that total order
    * every triangle has exactly one directed path a→b→c plus the closing
    * edge a→c, so two equi-joins count each triangle once. All counts are
    * exact integers; the only division is the final coefficient, rounded
    * at the edge. */
  def triangleCount(spark: SparkSession, dir: String, minSupport: Long = 2): DataFrame = {
    val op = lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val a = op.select(col("l_orderkey"), col("l_partkey").as("pa"))
    val b = op.select(col("l_orderkey"), col("l_partkey").as("pb"))
    val edges = a.join(b, Seq("l_orderkey"))
      .filter(col("pa") < col("pb"))
      .groupBy(col("pa"), col("pb"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= minSupport)
      .select(col("pa"), col("pb"))
    triangleStatsOn(edges)
  }

  /** Core of q130 over an explicit undirected edge frame (pa < pb, no
    * duplicates) — unit-testable with hand-built graphs. The edge list is
    * materialized once: it feeds five plan branches (degrees, both wedge
    * sides, the closing probe, the edge count) and Spark does not share
    * identical subtrees. */
  def triangleStatsOn(edgesRaw: DataFrame): DataFrame = {
    val edges = Materialize(edgesRaw.select(col("pa"), col("pb")))
    val deg = edges.select(col("pa").as("node"))
      .union(edges.select(col("pb").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))

    val nNodes = deg.agg(count(lit(1)).as("n_nodes"))
    val nEdges = edges.agg(count(lit(1)).as("n_edges"))
    // wedges (paths of length 2) = Σ C(deg, 2), exact in integers
    val nWedges = deg.agg(sum(col("deg") * (col("deg") - 1) / 2).cast("long").as("n_wedges"))

    // orient: src = (deg, id)-smaller endpoint. Broadcast-join the tiny
    // degree table onto both endpoints, then flip where needed.
    val da = deg.select(col("node").as("pa"), col("deg").as("deg_a"))
    val db = deg.select(col("node").as("pb"), col("deg").as("deg_b"))
    val oriented = edges
      .join(broadcast(da), "pa").join(broadcast(db), "pb")
      .select(
        when(col("deg_a") < col("deg_b") ||
          (col("deg_a") === col("deg_b") && col("pa") < col("pb")), col("pa"))
          .otherwise(col("pb")).as("src"),
        when(col("deg_a") < col("deg_b") ||
          (col("deg_a") === col("deg_b") && col("pa") < col("pb")), col("pb"))
          .otherwise(col("pa")).as("dst"))

    val paths = oriented.as("e1").join(oriented.as("e2"),
        col("e1.dst") === col("e2.src"))
      .select(col("e1.src").as("x"), col("e1.dst").as("y"), col("e2.dst").as("z"))
    val nTriangles = paths.join(oriented.as("e3"),
        col("x") === col("e3.src") && col("z") === col("e3.dst"))
      .agg(count(lit(1)).as("n_triangles"))

    nNodes.crossJoin(broadcast(nEdges))
      .crossJoin(broadcast(nWedges))
      .crossJoin(broadcast(nTriangles))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"), col("n_triangles"),
        round(lit(3.0) * col("n_triangles") / col("n_wedges"), 4).as("global_clustering"))
  }
}
