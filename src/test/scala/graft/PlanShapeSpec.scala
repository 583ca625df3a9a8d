package graft

import graft.analytics.{Relational, Similarity}

/** Plan-shape regression guards: the optimizations SCALING.md promises are
  * asserted against the executed plans, so a refactor that silently loses a
  * pushdown, a broadcast, or map-side partial aggregation fails CI rather
  * than shipping a 100 TB regression. */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf("sf0.001"))
    df.queryExecution.executedPlan.toString
  }

  test("q01: shipdate predicate and column pruning reach the parquet scan") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
    assert(!p.contains("l_orderkey"), "unused columns must be pruned from the scan")
  }

  test("q03: both filters push down; scan reads only 3 columns") {
    val p = plan("q03_filter_project")
    assert(p.contains("GreaterThan(n_chars,200)"), p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,lang:string,n_chars:bigint>"), p)
  }

  test("q04: dimension joins broadcast; no cartesian anywhere") {
    val p = plan("q04_revenue_by_nation")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q09: aggregation is partial+final (map-side combine), one exchange") {
    val p = plan("q09_hourly_events")
    assert("HashAggregate".r.findAllIn(p).size >= 2, "expected partial+final HashAggregate\n" + p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("q08: global top-N plans as TakeOrderedAndProject, not a full sort") {
    val p = plan("q08_top_orders")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q28: brute-force ANN broadcasts the query side only") {
    val p = plan("q28_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin"), p) // intentional: tiny broadcast side
    assert(p.contains("BroadcastExchange"), p)
  }

  test("similarity/dedup candidate joins are equi-joins (no nested loop)") {
    Seq("q25_jaccard_neardup", "q26_minhash_lsh", "q27_simhash_neardup",
      "q29_lsh_topk", "q30_embedding_neardup").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q has a nested-loop join")
    }
  }
}
