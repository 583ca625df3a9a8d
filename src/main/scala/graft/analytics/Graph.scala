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

  /** Round-boundary materialization policy for MULTI-CONSUMER iteration
    * state (k-core's edge frame feeds three plan branches per round):
    * checkpoint every second round and always the last — between cuts at
    * most two rounds nest, so recompute fan-out stays 3^2-bounded and
    * plan size O(1), at half the eager checkpoint jobs. */
  private def materializeEvery2(i: Int, rounds: Int, df: DataFrame): DataFrame =
    if (i % 2 == 0 || i == rounds) Materialize(df) else df

  /** Materialization policy for LINEAR iteration chains (PageRank ranks,
    * LPA labels: each round's frame is consumed exactly ONCE by the next
    * round, so an unmaterialized chain recomputes NOTHING — it just unrolls
    * into one multi-join plan that executes as a single job against the
    * checkpointed edge inputs). Skipping per-round cuts removes the
    * per-round job-launch latency that dominates small-state iteration
    * (measured: 5 materialized PageRank rounds ≈ 2.1 s of mostly job
    * overhead at sf0.1; unrolled, one job). A stride-8 cut keeps plan
    * depth O(1) for large round counts; on a cluster the same cut is the
    * fault-tolerance boundary (see Materialize / SCALING.md). */
  private def materializeStride8(i: Int, df: DataFrame): DataFrame =
    if (i % 8 == 0) Materialize(df) else df

  /** One row per order: the sorted distinct part set ("basket"). The
    * single wide shuffle behind the whole co-purchase family. */
  private[analytics] def orderBaskets(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(array_sort(collect_set(col("l_partkey"))).as("ps"))

  /** Undirected co-purchase edge list: (pa < pb, n = orders containing
    * both). Pairs are expanded IN-ROW from each order's sorted basket
    * (flatten/transform over the array) instead of a distinct + self-join —
    * that shape costs three shuffles of the fact projection (the distinct,
    * then both join sides repartitioned by order key); this one costs ONE
    * wide shuffle (the basket groupBy) plus the pair-key aggregate that
    * both shapes share. Fan-out per order is C(basket, 2) either way —
    * bounded by order size (≤ 7 lineitems in TPC-H; retail baskets are
    * similarly capped). For domains with unbounded baskets, cap or
    * pre-split the basket array before expansion — the join formulation
    * has the identical quadratic blowup, just spread across rows. */
  private[analytics] def coPurchaseEdges(spark: SparkSession, dir: String): DataFrame =
    // the weighted edge table feeds the ENTIRE graph family (q124/q125/
    // q130/q132/q133/q136/q138-q141/q147/q150/q168) — under the default-ON
    // session memo it is built once per (session, dir), the "edge list as
    // a materialized view" a graph warehouse maintains; Bench charges the
    // build in its shared-build entry, ScaleRehearsal/PlanShapeSpec opt out
    graft.functions.SessionMemo(spark, s"copurchase:$dir")(
      orderBaskets(spark, dir)
        .select(explode(expr(
          """flatten(transform(ps, (x, i) ->
            |  transform(slice(ps, i + 2, size(ps)), y -> named_struct('pa', x, 'pb', y))))"""
            .stripMargin)).as("e"))
        .select(col("e.pa").as("pa"), col("e.pb").as("pb"))
        .groupBy(col("pa"), col("pb"))
        .agg(count(lit(1)).as("n")))

  /** Eagerly build the memoized edge table (Bench's shared-build entry). */
  def warmSharedEdges(spark: SparkSession, dir: String): Unit = {
    coPurchaseEdges(spark, dir); ()
  }

  /** [[coPurchaseEdges]] with the support filter applied and only the pair
    * columns kept — the form every unweighted graph query consumes. */
  private[analytics] def supportedEdges(spark: SparkSession, dir: String,
      minSupport: Long): DataFrame =
    coPurchaseEdges(spark, dir)
      .filter(col("n") >= minSupport)
      .select(col("pa"), col("pb"))

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
  def triangleCount(spark: SparkSession, dir: String, minSupport: Long = 2): DataFrame =
    triangleStatsOn(supportedEdges(spark, dir, minSupport))

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
    // wedges (paths of length 2) = Σ C(deg, 2), exact in integers: `div`
    // (integer floor division) keeps every per-row term and the sum in
    // longs — Spark's `/` is double division, which silently loses
    // exactness past 2^53 on power-law degree distributions
    val nWedges = deg.agg(sum(expr("(deg * (deg - 1)) div 2")).cast("long").as("n_wedges"))

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

  /** q132: PageRank over the co-purchase graph (q124/q130's edge rule,
    * each undirected edge emitted in BOTH directions, so every node has
    * out-degree ≥ 1 and there is no dangling mass to redistribute).
    *
    * Arithmetic is exact INTEGER fixed point — ranks in micro-units
    * (r₀ = 1 000 000), per-edge contribution `r div deg`, update
    * `150 000 + (850 · Σ contrib) div 1000` (damping 0.85). Integer
    * addition is associative and floor division is deterministic, so the
    * result is bitwise identical across any partitioning, cluster layout,
    * or engine — which is exactly why the double-precision formulation was
    * rejected (TODO.md: FP sum order diverges between engines) and this
    * one gates against DuckDB hash-exact.
    *
    * Scale posture: the degree is pre-joined onto the edge list ONCE and
    * the result materialized — each of the `iters` rounds is then a single
    * shuffle join (small rank table onto the edge layout) plus one
    * partial+final sum, with [[Materialize]] cutting lineage per round so
    * plan size stays O(1) in iteration count. On a cluster, pre-partition
    * `outEdges` by src and the rank table inherits that layout from the
    * groupBy(dst) of the previous round — the classic Pregel join shape. */
  def pageRank(spark: SparkSession, dir: String, iters: Int = 5,
      minSupport: Long = 2): DataFrame = {
    val und = supportedEdges(spark, dir, minSupport)
    val edges = und.select(col("pa").as("src"), col("pb").as("dst"))
      .unionByName(und.select(col("pb").as("src"), col("pa").as("dst")))
    pageRankOn(edges, iters)
  }

  /** Core of q132 over an explicit directed edge frame (src, dst) where
    * every src has ≥ 1 out-edge — unit-testable with hand graphs. Returns
    * (node, rank_micro). */
  def pageRankOn(edgesRaw: DataFrame, iters: Int): DataFrame = {
    val edges = Materialize(edgesRaw.select(col("src"), col("dst")))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // degree attached once, reused by every iteration
    val outEdges = Materialize(edges.join(deg, "src"))
    val nodes = Materialize(deg.select(col("src").as("node")))
    var ranks = nodes.select(col("node"), lit(1000000L).as("r"))
    (1 to iters).foreach { i =>
      val contrib = outEdges.join(ranks, col("src") === col("node"))
        .select(col("dst"), expr("r div deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      ranks = materializeStride8(i, nodes
        .join(contrib, col("node") === col("dst"), "left")
        .selectExpr("node", "150000 + (850 * coalesce(s, 0)) div 1000 AS r"))
    }
    ranks.select(col("node"), col("r").as("rank_micro"))
  }

  /** q136: WEIGHTED PageRank — q132 with the co-purchase support count as
    * the edge weight, so heavily co-bought pairs carry proportionally more
    * rank. Same exact integer fixed point: per-edge contribution is
    * `(r · w) div W_u` (W_u = total out-weight of u), update unchanged.
    * Magnitudes stay far from Long range: r ≤ n·10⁶ total mass, w is a
    * support count — the product tops out around 10¹⁰ at bench scale. */
  def pageRankWeighted(spark: SparkSession, dir: String, iters: Int = 5,
      minSupport: Long = 2): DataFrame = {
    val und = coPurchaseEdges(spark, dir)
      .filter(col("n") >= minSupport)
      .select(col("pa"), col("pb"), col("n").as("w"))
    val edges = und.select(col("pa").as("src"), col("pb").as("dst"), col("w"))
      .unionByName(und.select(col("pb").as("src"), col("pa").as("dst"), col("w")))
    pageRankWeightedOn(edges, iters)
  }

  /** Core of q136 over an explicit weighted directed edge frame
    * (src, dst, w); every src needs ≥ 1 out-edge. Returns (node,
    * rank_micro). With all weights equal it reduces to [[pageRankOn]]
    * up to flooring — MarketBasketSpec pins the uniform-weight case. */
  def pageRankWeightedOn(edgesRaw: DataFrame, iters: Int): DataFrame = {
    val edges = Materialize(edgesRaw.select(col("src"), col("dst"), col("w")))
    val wsum = edges.groupBy(col("src")).agg(sum(col("w")).as("wsum"))
    val outEdges = Materialize(edges.join(wsum, "src"))
    val nodes = Materialize(wsum.select(col("src").as("node")))
    var ranks = nodes.select(col("node"), lit(1000000L).as("r"))
    (1 to iters).foreach { i =>
      val contrib = outEdges.join(ranks, col("src") === col("node"))
        .select(col("dst"), expr("(r * w) div wsum").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      ranks = materializeStride8(i, nodes
        .join(contrib, col("node") === col("dst"), "left")
        .selectExpr("node", "150000 + (850 * coalesce(s, 0)) div 1000 AS r"))
    }
    ranks.select(col("node"), col("r").as("rank_micro"))
  }

  /** q138: PERSONALIZED PageRank — the restart mass lands on a SEED set
    * (parts of one brand) instead of uniformly, so ranks measure proximity
    * to the seeds: "what else does this brand's buyer graph orbit". Same
    * exact integer fixed point as q132; the per-node restart term is
    * `(150 000 · n) div |S|` for seeds and 0 otherwise (initial mass
    * likewise concentrated on seeds), so components containing no seed
    * correctly drain to rank 0. Seed membership is one broadcast-able
    * left join onto the node list, computed once outside the loop. */
  def pageRankPersonalized(spark: SparkSession, dir: String,
      brand: String = "Brand#1", iters: Int = 5, minSupport: Long = 2): DataFrame = {
    val und = supportedEdges(spark, dir, minSupport)
    val edges = und.select(col("pa").as("src"), col("pb").as("dst"))
      .unionByName(und.select(col("pb").as("src"), col("pa").as("dst")))
    val seeds = graft.Tables.part(spark, dir)
      .filter(col("p_brand") === brand)
      .select(col("p_partkey").as("node"), lit(true).as("is_seed"))
    pageRankPersonalizedOn(edges, seeds, iters)
  }

  /** Core of q138: edges (src, dst) + a seed frame (node, is_seed=true).
    * Returns (node, rank_micro); nodes outside any seed's component end
    * at 0. */
  def pageRankPersonalizedOn(edgesRaw: DataFrame, seeds: DataFrame,
      iters: Int): DataFrame = {
    val edges = Materialize(edgesRaw.select(col("src"), col("dst")))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val outEdges = Materialize(edges.join(deg, "src"))
    val flagged = deg.select(col("src").as("node"))
      .join(seeds, Seq("node"), "left")
      .select(col("node"), coalesce(col("is_seed"), lit(false)).as("is_seed"))
    val counts = flagged.agg(count(lit(1)).as("nn"),
      sum(when(col("is_seed"), 1L).otherwise(0L)).as("ns"))
    val based = Materialize(flagged.crossJoin(broadcast(counts))
      .selectExpr("node",
        "CASE WHEN is_seed THEN (150000 * nn) div ns ELSE 0 END AS base_r",
        "CASE WHEN is_seed THEN (1000000 * nn) div ns ELSE 0 END AS r"))
    var ranks = based.select(col("node"), col("r"))
    (1 to iters).foreach { i =>
      val contrib = outEdges.join(ranks, col("src") === col("node"))
        .select(col("dst"), expr("r div deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      ranks = materializeStride8(i, based
        .join(contrib, col("node") === col("dst"), "left")
        .selectExpr("node", "base_r + (850 * coalesce(s, 0)) div 1000 AS r"))
    }
    ranks.select(col("node"), col("r").as("rank_micro"))
  }

  /** q133: k-core decomposition by fixed-round degree peel — each round
    * drops every node whose degree in the SURVIVING subgraph is < k, and
    * the edges incident to it. Peeling is monotone, so once the fixpoint
    * is reached every further round is a no-op: running a FIXED `rounds`
    * count (rather than loop-until-converged) costs a few empty rounds but
    * makes the semantics engine-independent and exactly unrollable in the
    * DuckDB oracle — same fixed-round trick as q132, and like q132 the
    * arithmetic is pure integers/set logic, so the gate is hash-exact.
    * KCoreSpec pins that `rounds` = 12 reaches the fixpoint on the test
    * corpus (rounds 12 ≡ rounds 14).
    *
    * Scale posture: one partial+final degree agg plus two left-semi joins
    * per round — the keep-list is at most the node set (shrinking every
    * round, broadcast-able long before the edge list is small), and
    * [[Materialize]] caps lineage at O(1) per round. Output: surviving
    * (node, core_deg), core_deg ≥ k at the fixpoint. */
  def kCore(spark: SparkSession, dir: String, k: Int = 3, rounds: Int = 12,
      minSupport: Long = 2): DataFrame =
    kCoreOn(supportedEdges(spark, dir, minSupport), k, rounds)

  /** q139: label-propagation communities — every node starts as its own
    * label; each SYNCHRONOUS round it adopts the most frequent label among
    * its neighbors, ties broken by smallest label. The tie-break makes
    * each round a pure function of the previous labeling, so a FIXED
    * round count is engine-independent and unrolls exactly in the oracle
    * (q132/q133's trick — convergence detection never has to be expressed
    * in SQL; LPA's known oscillation modes don't matter for the gate
    * because both sides run the identical round count). CC (q37) answers
    * reachability; LPA splits dense regions connected by thin bridges —
    * the complementary community question.
    *
    * Scale posture per round: one shuffle join (labels onto the edge
    * layout), one (dst, label) count aggregate, one argmax via
    * max(struct) partial+final — no window over the full node set — and
    * Materialize caps lineage. */
  def labelPropagation(spark: SparkSession, dir: String, rounds: Int = 4,
      minSupport: Long = 2): DataFrame = {
    val und = supportedEdges(spark, dir, minSupport)
    val edges = und.select(col("pa").as("src"), col("pb").as("dst"))
      .unionByName(und.select(col("pb").as("src"), col("pa").as("dst")))
    labelPropagationOn(edges, rounds)
  }

  /** q141: modularity of the q139 community partition — the standard
    * quality score Q = Σ_c [in_c/m − (tot_c/2m)²] stated over the COMMON
    * DENOMINATOR 4m²: Q = Σ_c (4·m·in_c − tot_c²) / 4m², where m is the
    * undirected edge count, in_c the edges internal to community c and
    * tot_c its total degree. Numerator and denominator are exact integers
    * (the only division happens once, at the output edge), so the score
    * gates hash-exact like the rest of the graph family. Output is one
    * row: community count, m, the exact fraction, and the rounded score.
    * Cost: the LPA labeling plus two broadcast-joined aggregates over the
    * edge list — no new shuffle shape. */
  def modularity(spark: SparkSession, dir: String, rounds: Int = 4,
      minSupport: Long = 2): DataFrame = {
    val und = Materialize(supportedEdges(spark, dir, minSupport))
    val edges = und.select(col("pa").as("src"), col("pb").as("dst"))
      .unionByName(und.select(col("pb").as("src"), col("pa").as("dst")))
    // the labeling feeds THREE plan branches (both endpoint joins of in_c
    // and the degree join of tot_c); unmaterialized, the final job re-runs
    // the whole `rounds`-deep LPA chain once per branch — Spark does not
    // share identical subtrees (guide §1.2: don't compute things twice)
    val labels = Materialize(labelPropagationOn(edges, rounds)
      .select(col("node"), col("community")))
    val la = labels.select(col("node").as("pa"), col("community").as("ca"))
    val lb = labels.select(col("node").as("pb"), col("community").as("cb"))
    val inC = und.join(la, "pa").join(lb, "pb")
      .filter(col("ca") === col("cb"))
      .groupBy(col("ca").as("community")).agg(count(lit(1)).as("in_c"))
    val totC = edges.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
      .join(labels, "node")
      .groupBy(col("community")).agg(sum(col("deg")).as("tot_c"))
    val m = und.agg(count(lit(1)).as("m"))
    totC.join(inC, Seq("community"), "left")
      .select(col("community"), col("tot_c"),
        coalesce(col("in_c"), lit(0L)).as("in_c"))
      .crossJoin(broadcast(m))
      .agg(count(lit(1)).as("n_communities"),
        max(col("m")).as("m"),
        sum(lit(4L) * col("m") * col("in_c") - col("tot_c") * col("tot_c")).as("q_num"))
      .select(col("n_communities"), col("m"), col("q_num"),
        (lit(4L) * col("m") * col("m")).as("q_den"),
        round(col("q_num").cast("double") / (lit(4.0) * col("m") * col("m")), 6)
          .as("modularity"))
  }

  /** q140: bounded-depth BFS reach — for every node, the count of DISTINCT
    * nodes within ≤ 2 hops (self excluded): the "friend-of-friend audience"
    * metric, and the exact-integer fixed-depth slice of BFS that gates
    * hash-exact where full shortest-paths can't. One self-join builds the
    * 2-hop pairs (fan-out bounded by the wedge count — tame here because
    * the support filter already bounds degree), a union-distinct dedups
    * overlapping 1-hop/2-hop paths, and a partial+final count finishes.
    * Deeper horizons unroll the same way (k−1 self-joins). */
  def reach2(spark: SparkSession, dir: String, minSupport: Long = 2): DataFrame = {
    val und = supportedEdges(spark, dir, minSupport)
    val edges = und.select(col("pa").as("src"), col("pb").as("dst"))
      .unionByName(und.select(col("pb").as("src"), col("pa").as("dst")))
    val hop2 = edges.as("x").join(edges.as("y"), col("x.dst") === col("y.src"))
      .filter(col("y.dst") =!= col("x.src"))
      .select(col("x.src").as("src"), col("y.dst").as("dst"))
    edges.unionByName(hop2).distinct()
      .groupBy(col("src")).agg(count(lit(1)).as("n_reach2"))
      .select(col("src").as("node"), col("n_reach2"))
  }

  /** q147: pivot-sampled harmonic closeness — the scalable stand-in for
    * exact closeness centrality (all-pairs BFS is O(V·E): out of the
    * question at warehouse scale). The standard estimator runs BFS from a
    * small pivot set and scores each node by its harmonic sum over the
    * pivots that reach it; here the pivot set is DETERMINISTIC (the
    * `nPivots` smallest node ids) and the horizon is bounded at `depth`,
    * which is what lets an approximation algorithm gate hash-exact against
    * an independent engine — the approximation is in the pivot/horizon
    * CHOICE, fixed up front, not in any runtime randomness.
    *
    * Output per node: how many pivots reach it within `depth` hops and the
    * harmonic sum Σ 1/d in exact micro-units (10^6 div d — integers
    * end-to-end, no FP merge-order hazard). Pivots score each other like
    * any other node; dist-0 self rows are excluded.
    *
    * Plan: per round, one equi-join of the frontier against the doubled
    * edge list + an anti-join against the visited set, Materialize capping
    * lineage — the Pregel shape shared with PageRank/k-core/LPA. Frontier
    * size is bounded by nPivots · V, and every join keys on node id, so
    * parallelism scales with the graph, not the pivot count. */
  def closenessPivots(spark: SparkSession, dir: String, nPivots: Int = 8,
      depth: Int = 3, minSupport: Long = 2): DataFrame =
    closenessPivotsOn(supportedEdges(spark, dir, minSupport), nPivots, depth)

  /** Core of q147 over an explicit undirected edge frame (pa < pb, no
    * duplicates) — unit-testable with hand graphs. */
  def closenessPivotsOn(und: DataFrame, nPivots: Int, depth: Int): DataFrame = {
    val edges = Materialize(und.select(col("pa").as("src"), col("pb").as("dst"))
      .unionByName(und.select(col("pb").as("src"), col("pa").as("dst"))))
    val pivots = edges.select(col("src")).distinct()
      .orderBy(col("src")).limit(nPivots)
      .select(col("src").as("pivot"))
    var reached = Materialize(pivots
      .select(col("pivot"), col("pivot").as("node"), lit(0).as("dist")))
    var frontier = reached
    (1 to depth).foreach { d =>
      frontier = Materialize(frontier
        .join(edges, frontier("node") === edges("src"))
        .select(col("pivot"), col("dst").as("node")).distinct()
        .join(reached, Seq("pivot", "node"), "left_anti")
        .withColumn("dist", lit(d)))
      // lazy union: every input is already a checkpoint, so the anti-join
      // rescans materialized blocks — no extra eager job per round
      reached = reached.unionByName(frontier)
    }
    reached.filter(col("dist") > 0)
      .groupBy(col("node"))
      .agg(count(lit(1)).as("n_pivots_reached"),
        sum(expr("1000000 div dist")).as("harmonic_micro"))
  }

  /** Core of q139 over a directed edge frame where every node appears as a
    * dst (true for doubled undirected edges) — unit-testable with hand
    * graphs. Returns (node, community). */
  def labelPropagationOn(edgesRaw: DataFrame, rounds: Int): DataFrame = {
    val edges = Materialize(edgesRaw.select(col("src"), col("dst")))
    val nodes = Materialize(edges.select(col("dst").as("node")).distinct())
    var labels = nodes.select(col("node"), col("node").as("lbl"))
    (1 to rounds).foreach { i =>
      labels = materializeStride8(i, edges
        .join(labels, col("src") === col("node"))
        .groupBy(col("dst"), col("lbl")).agg(count(lit(1)).as("c"))
        .groupBy(col("dst"))
        .agg(max(struct(col("c"), (-col("lbl")).as("nl"))).as("m"))
        .select(col("dst").as("node"), (-col("m.nl")).as("lbl")))
    }
    labels.select(col("node"), col("lbl").as("community"))
  }

  /** q168: pivot-sampled BETWEENNESS centrality — Brandes' algorithm
    * (Brandes 2001, "A faster algorithm for betweenness centrality")
    * restricted to a deterministic pivot set and a bounded horizon, the
    * same fixed-up-front approximation contract as q147's closeness:
    * exact betweenness is O(V·E) all-sources; the standard estimator runs
    * Brandes from `nPivots` sources, and pinning the pivot CHOICE (the
    * smallest node ids) and horizon depth makes the estimate a pure
    * function of the graph that an independent engine restates exactly.
    *
    * Per pivot, two sweeps over the BFS level structure:
    *  - forward: level d's shortest-path counts σ(v) = Σ σ(u) over
    *    neighbors u at level d−1 — the q147 frontier join with a SUM
    *    aggregate instead of a distinct;
    *  - backward (the dependency accumulation): for d = depth−1 … 1,
    *    δ(v) = Σ_{w ∈ succ(v)} σ(v)·(1 + δ(w))/σ(w), with nodes on the
    *    horizon shell contributing δ = 0 (paths longer than the horizon
    *    are ignored — that is the approximation, not a numeric hazard).
    *
    * δ is kept in exact integer micro-units: each term is
    * (σ_v · (10⁶ + δ_w_micro)) div σ_w — integer multiply and truncating
    * div (Spark `div` ≡ DuckDB `//` on non-negatives), summed as integers
    * (associative, layout-independent) — so every score is bitwise
    * reproducible and the q168 oracle unrolls both sweeps in SQL and
    * hash-matches. Output (node, n_pivots_reached, betweenness_micro),
    * pivots' own dist-0 rows excluded.
    *
    * Plan: forward rounds are the Pregel shape shared with the rest of the
    * family (frontier ⋈ doubled edges, per-(pivot, node) partial+final
    * sum, anti-join vs the reached set, Materialize capping lineage);
    * backward rounds are level-d ⋈ edges ⋈ level-(d+1) equi-joins whose
    * size is bounded by the forward frontier volume. Everything keys on
    * node ids, so parallelism scales with the graph, not the pivot count. */
  def betweennessPivots(spark: SparkSession, dir: String, nPivots: Int = 8,
      depth: Int = 3, minSupport: Long = 2): DataFrame =
    betweennessPivotsOn(supportedEdges(spark, dir, minSupport), nPivots, depth)

  /** Core of q168 over an explicit undirected edge frame (pa < pb, no
    * duplicates) — unit-testable with hand graphs. */
  def betweennessPivotsOn(und: DataFrame, nPivots: Int, depth: Int): DataFrame = {
    val edges = Materialize(und.select(col("pa").as("src"), col("pb").as("dst"))
      .unionByName(und.select(col("pb").as("src"), col("pa").as("dst"))))
    brandesSweep(edges,
      edges.select(col("src")).distinct().orderBy(col("src")).limit(nPivots)
        .select(col("src").as("pivot")),
      depth)
  }

  /** q219 core: EXACT Brandes — every node a pivot. Exact whenever `depth`
    * ≥ the graph's diameter (the caller's contract; q219's planted motifs
    * have diameter ≤ 4 by construction). O(V·E) total frontier volume —
    * the estimator [[betweennessPivotsOn]] stays the 100 TB default; exact
    * all-sources is for bounded subgraphs (a brand's co-purchase
    * neighborhood, a dedup cluster's internal structure), where V·E is a
    * task, not a cluster-week. Parallelism note: all pivots advance in ONE
    * DataFrame per BFS round (pivot is just a key column), so the sweep is
    * |pivots| independent Brandes runs for the price of `depth` joins. */
  def betweennessExactOn(und: DataFrame, depth: Int): DataFrame = {
    val edges = Materialize(und.select(col("pa").as("src"), col("pb").as("dst"))
      .unionByName(und.select(col("pb").as("src"), col("pa").as("dst"))))
    brandesSweep(edges,
      edges.select(col("src")).distinct().select(col("src").as("pivot")),
      depth)
  }

  /** q219: exact betweenness gated on a PLANTED motif graph — the oracle
    * problem that kept exact Brandes out of rounds 4–8 (unrolling the
    * backward sweep for all sources in SQL is unreadable and slow) is
    * dissolved by planting: docs group into consecutive-id 5-node motifs
    * (g = doc_id div 5, position = doc_id mod 5, motif = g mod 4 — path /
    * star / 5-cycle / 4-cycle+pendant), so every node's exact score is a
    * CLOSED-FORM constant of its (motif, position) role, which the DuckDB
    * oracle states as a CASE table. The 4-cycle's σ=2 shortest-path pairs
    * exercise the truncating-div micro semantics; constants derived by an
    * independent reference implementation and spec-pinned (GraphSpec).
    * Only complete 5-groups enter the graph, so the gate is
    * SF-independent. */
  def betweennessExact(spark: SparkSession, dir: String): DataFrame =
    betweennessExactOn(plantedMotifEdges(spark, dir), depth = 4)

  /** The planted motif edge table (see [[betweennessExact]]): built from
    * group ids alone — no global window, no rank; group completeness is a
    * 5-row-per-key aggregate. */
  private[graft] def plantedMotifEdges(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val motifEdges = Seq(
      (0, 0, 1), (0, 1, 2), (0, 2, 3), (0, 3, 4),            // path
      (1, 0, 1), (1, 0, 2), (1, 0, 3), (1, 0, 4),            // star
      (2, 0, 1), (2, 1, 2), (2, 2, 3), (2, 3, 4), (2, 4, 0), // 5-cycle
      (3, 0, 1), (3, 1, 2), (3, 2, 3), (3, 3, 0), (3, 0, 4)  // 4-cycle + pendant
    ).toDF("m", "pa_pos", "pb_pos")
    val fullGroups = graft.Tables.documents(spark, dir)
      .select(expr("doc_id div 5").as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("n"))
      .filter(col("n") === 5)
      .select(col("g"), (col("g") % 4).cast("int").as("m"))
    fullGroups.join(broadcast(motifEdges), "m")
      .select((col("g") * 5 + col("pa_pos")).as("pa"),
        (col("g") * 5 + col("pb_pos")).as("pb"))
  }

  /** Shared Brandes machinery of q168/q219 (see [[betweennessPivots]] for
    * the sweep-by-sweep contract and the integer-micro δ discipline). */
  private def brandesSweep(edges: DataFrame, pivots: DataFrame,
      depth: Int): DataFrame = {
    // forward sweep: levels(d) = (pivot, node, sigma) at BFS distance d
    var levels = Vector(Materialize(pivots
      .select(col("pivot"), col("pivot").as("node"), lit(1L).as("sigma"))))
    var reached = levels(0).select(col("pivot"), col("node"))
    for (_ <- 1 to depth) {
      val next = Materialize(levels.last
        .join(edges, levels.last("node") === edges("src"))
        .select(col("pivot"), col("dst").as("nxt"), col("sigma"))
        .groupBy(col("pivot"), col("nxt")).agg(sum(col("sigma")).as("sigma"))
        .withColumnRenamed("nxt", "node")
        .join(reached, Seq("pivot", "node"), "left_anti"))
      levels = levels :+ next
      reached = reached.unionByName(next.select(col("pivot"), col("node")))
    }
    // backward sweep: horizon shell seeds delta = 0
    var delta = Materialize(levels(depth)
      .select(col("pivot"), col("node"), lit(0L).as("delta")))
    var out = delta
    for (d <- (depth - 1) to 1 by -1) {
      val w = levels(d + 1)
        .select(col("pivot").as("wpivot"), col("node").as("wnode"),
          col("sigma").as("wsigma"))
        .join(delta.select(col("pivot").as("wpivot"), col("node").as("wnode"),
          col("delta").as("wdelta")), Seq("wpivot", "wnode"))
      val contrib = levels(d)
        .join(edges, levels(d)("node") === edges("src"))
        .join(w, col("pivot") === col("wpivot") && col("dst") === col("wnode"))
        .select(col("pivot"), col("node"),
          expr("(sigma * (1000000 + wdelta)) div wsigma").as("c"))
        .groupBy(col("pivot"), col("node")).agg(sum(col("c")).as("delta"))
      delta = Materialize(levels(d).select(col("pivot"), col("node"))
        .join(contrib, Seq("pivot", "node"), "left")
        .select(col("pivot"), col("node"),
          coalesce(col("delta"), lit(0L)).as("delta")))
      out = out.unionByName(delta)
    }
    out.groupBy(col("node"))
      .agg(count(lit(1)).as("n_pivots_reached"),
        sum(col("delta")).as("betweenness_micro"))
  }

  /** Core of q133 over an explicit undirected edge frame (pa < pb, no
    * duplicates) — unit-testable with hand graphs. */
  def kCoreOn(edgesRaw: DataFrame, k: Int, rounds: Int): DataFrame = {
    var edges = Materialize(edgesRaw.select(col("pa"), col("pb")))
    (1 to rounds).foreach { i =>
      val keep = edges.select(col("pa").as("node"))
        .unionByName(edges.select(col("pb").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select(col("node"))
      edges = materializeEvery2(i, rounds, edges
        .join(keep.withColumnRenamed("node", "pa"), Seq("pa"), "left_semi")
        .join(keep.withColumnRenamed("node", "pb"), Seq("pb"), "left_semi")
        .select(col("pa"), col("pb")))
    }
    edges.select(col("pa").as("node"))
      .unionByName(edges.select(col("pb").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("core_deg"))
  }
}
