package graft

import graft.analytics.{Relational, Similarity}

/** Plan-shape regression guards: the optimizations SCALING.md promises are
  * asserted against the executed plans, so a refactor that silently loses a
  * pushdown, a broadcast, or map-side partial aggregation fails CI rather
  * than shipping a 100 TB regression. */
class PlanShapeSpec extends SparkSpec {

  /** Plan pins must see the UNDERLYING computation: the default-ON
    * SessionMemo hands back a materialized (LogicalRDD) frame whose plan is
    * just a scan, which would make every shape assertion vacuous. */
  private def withMemoOff[A](f: => A): A = {
    val prev = spark.conf.getOption("spark.graft.pairgraph.cache")
    spark.conf.set("spark.graft.pairgraph.cache", "false")
    try f finally prev match {
      case Some(v) => spark.conf.set("spark.graft.pairgraph.cache", v)
      case None => spark.conf.unset("spark.graft.pairgraph.cache")
    }
  }

  private def plan(name: String): String = withMemoOff {
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

  test("q220: RP candidate scan broadcasts the query side; projection is a narrow map") {
    val p = plan("q220_rp_topk")
    assert(p.contains("BroadcastNestedLoopJoin"), p) // intentional: tiny query side, q28's shape
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Generate"), "projection must not expand rows\n" + p)
  }

  test("q219: planted motif edges broadcast the 18-row motif table, no cartesian") {
    // the Brandes sweep itself runs through eager Materialize barriers
    // (lineage control), so the load-bearing plan is the edge build:
    // group-completeness aggregate + ONE broadcast of the motif table
    val p = graft.analytics.Graph.plantedMotifEdges(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("similarity/dedup candidate joins are equi-joins (no nested loop)") {
    Seq("q25_jaccard_neardup", "q26_minhash_lsh", "q27_simhash_neardup",
      "q29_lsh_topk", "q30_embedding_neardup", "q63_simhash128_neardup",
      "q95_fuzzy_neardup").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q has a nested-loop join")
    }
  }

  test("q25: prefix generation has no df-join, no window — narrow until the candidate join") {
    val p = plan("q25_jaccard_neardup")
    // hash-ordered prefixes: the only wide ops are the candidate equi-join
    // and distinct — the global-frequency ranking (window over doc_id) is gone
    assert(!p.contains("Window"), "prefix ranking window crept back into q25\n" + p)
    assert(p.contains("sort_by_hash") || p.contains("SortByHash") || p.contains("slice"),
      "expected hash-ordered prefix slice in the scan project\n" + p)
  }

  test("q44: bucketed co-located join has no shuffle exchange on either side") {
    import graft.analytics.LayoutOps
    // write the bucketed layout, then assert on the bare join's plan
    LayoutOps.bucketedCustomerOrders(spark, sf("sf0.001")).count()
    val p = LayoutOps.bucketedJoinPlan(spark).queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), p)
    assert(!p.contains("Exchange hashpartitioning"),
      "bucketed join must consume bucket layout with zero shuffle\n" + p)
    assert(p.contains("SelectedBucketsCount"), p)
  }

  test("q55/q61: top-k windows carry WindowGroupLimit (k-bound below the sort)") {
    Seq("q55_tfidf_terms", "q61_stratified_sample").foreach { q =>
      val p = plan(q)
      assert(p.contains("WindowGroupLimit"),
        s"$q must push its rank bound below the window sort\n" + p)
    }
  }

  test("q58/q59/q60: per-group stats join back via broadcast, not a corpus shuffle") {
    Seq("q58_length_outliers", "q59_quality_normalized").foreach { q =>
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q stats join must broadcast\n" + p)
    }
    // q60's total is a single scalar — broadcast nested loop of 1 row is the
    // intended shape; the vocabulary join must still be a hash join
    val p60 = plan("q60_unigram_logprob")
    assert(p60.contains("BroadcastHashJoin") || p60.contains("SortMergeJoin"), p60)
  }

  test("q67/q68: mixture spec and boilerplate set join back via broadcast") {
    // the corpus side must meet the small side through a broadcast hash
    // join — never by shuffling the corpus on the join key
    val p67 = plan("q67_mixture_sample")
    assert(p67.contains("BroadcastHashJoin"), "q67 spec join must broadcast\n" + p67)
    val p68 = plan("q68_boilerplate_ngrams")
    assert(p68.contains("BroadcastHashJoin"), "q68 boiler join must broadcast\n" + p68)
    assert(!p68.contains("CartesianProduct"), "q68 has a cartesian product")
  }

  test("q65/q66: per-row corpus filters are scan-fused (zero exchange)") {
    Seq("q65_repetition_ratio", "q66_gopher_filter").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Exchange"), s"$q must not shuffle\n" + p)
    }
  }

  test("q62: packing shuffles once on the bucket key") {
    val p = plan("q62_token_packing")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      "token packing should shuffle exactly once (bucket window)\n" + p)
  }

  test("q56: range join plans as an equi-join on (user, bin), not a nested loop") {
    val p = plan("q56_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin"), "range join fell back to nested loop\n" + p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), "expected a hash-keyed equi-join\n" + p)
  }

  test("q131: interval overlap join is day-keyed, not a nested loop") {
    val p = plan("q131_maintenance_overlap")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "interval×interval join fell back to nested loop\n" + p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), "expected a hash-keyed equi-join on day\n" + p)
  }

  test("runtime bloom filter prunes the fact side of a selective shuffle join") {
    import org.apache.spark.sql.functions.col
    // At 100 TB: a selective dim filter (one order priority) should reach
    // the fact scan as a runtime bloom filter, cutting shuffle input before
    // the join. Thresholds lowered so the tiny test tables qualify.
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB")
    val old = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = graft.Tables.lineitem(spark, sf("sf0.001"))
      val ord = graft.Tables.orders(spark, sf("sf0.001"))
        .filter(col("o_orderpriority") === "1-URGENT")
      val p = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain"),
        "expected an injected bloom-filter runtime filter on the fact side\n" + p)
    } finally old.foreach { case (k, v) => v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("q80: trend window runs over the monthly aggregate, never the fact table") {
    val p = plan("q80_revenue_trend")
    // aggregate-then-window: the partial+final HashAggregate pair must sit
    // BELOW the (single-partition, few-rows) window in the plan text
    assert(p.contains("Window"), p)
    assert(p.indexOf("HashAggregate") >= 0 &&
      p.indexOf("Window") < p.lastIndexOf("HashAggregate"),
      "window must consume the aggregate output, not raw orders\n" + p)
    // semantic pin: mov_avg of the first month equals its own revenue
    val rows = SparkEntry.queries("q80_revenue_trend")(spark, sf("sf0.001"))
      .orderBy(org.apache.spark.sql.functions.col("month")).collect()
    assert(rows.nonEmpty)
    assert(rows.head.getAs[Double]("mov_avg_3m") == rows.head.getAs[Double]("revenue"))
    assert(rows.head.isNullAt(rows.head.fieldIndex("mom_delta")), "first month has no delta")
  }

  test("q81: correlated aggregate is two co-partitioned passes, no nested loop") {
    val p = plan("q81_small_qty_revenue")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    val row = SparkEntry.queries("q81_small_qty_revenue")(spark, sf("sf0.001")).head()
    assert(row.getAs[Long]("n_small") > 0, "filter must select some small-quantity lineitems")
  }

  test("q79: span dedup joins on the chunk key — no window, no pair-space op") {
    val p = plan("q79_span_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Window"), "span dedup must not rank anything\n" + p)
    assert(p.contains("word_cdc_chunks"), "chunking must be the codegen'd kernel\n" + p)
  }

  test("q105: argmax-per-group is two aggregates + broadcast dims — no window") {
    val p = plan("q105_top_part_per_nation")
    assert(!p.contains("Window"), "struct-max argmax must not plan a window\n" + p)
    // both aggregates map-side combine: the revenue sum hash-aggregates,
    // the struct-max (not hash-aggregable) partial+final SortAggregates —
    // each map task still emits one candidate per nation
    assert(p.contains("partial_sum"), "revenue aggregate must be partial+final\n" + p)
    assert(p.contains("partial_max"), "struct-max must be partial+final\n" + p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q106: top-10 plans as TakeOrderedAndProject; segment dim broadcasts") {
    val p = plan("q106_shipping_priority")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThan(l_shipdate") ||
      p.contains("GreaterThan(l_shipdate"), "shipdate predicate must reach the scan\n" + p)
  }

  test("q36: set-op classification is one scan, one exchange") {
    val p = plan("q36_customer_setops")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      "single partial+final aggregate — not the 4-exchange except/intersect chain\n" + p)
    assert("Scan parquet".r.findAllIn(p).size == 1, "one fact scan\n" + p)
    assert(p.contains("In(o_orderstatus"), "status filter must reach the scan\n" + p)
  }

  test("q103: median/MAD tables broadcast back; no corpus-wide window") {
    val p = plan("q103_mad_outliers")
    assert(!p.contains("Window"), p)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      "med and mad must both broadcast back\n" + p)
  }

  test("q104: bounded min-k aggregate — no per-term window, two exchanges") {
    val p = plan("q104_inverted_index")
    // postings come from the mergeable BoundedMinK aggregate: no global
    // rank window (the hot-term straggler), just distinct's shuffle and
    // the hash(term) aggregate exchange with map-side partials
    assert(!p.contains("Window"), "no per-term rank window\n" + p)
    assert(p.contains("graft_min_k"), "BoundedMinK aggregate in plan\n" + p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2,
      "distinct + term clustering only\n" + p)
  }

  test("q123: Q2 argmin is aggregate + join-back with broadcast dims — no window, no subquery loop") {
    val p = plan("q123_min_cost_supplier")
    assert(!p.contains("Window"), "argmin must decorrelate to agg + join-back, not rank\n" + p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // part slice, supplier, nation all broadcast; the min-table join may be
    // AQE-broadcast or hash — but never a nested loop
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p)
  }

  test("q124: top-20 co-purchase pairs plan as TakeOrderedAndProject over one pair aggregate") {
    val p = plan("q124_copurchase_pairs")
    assert(p.contains("TakeOrderedAndProject"), "global top-k must not full-sort\n" + p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q125: rule joins run on aggregate tables; order universe is a one-row broadcast") {
    val p = plan("q125_association_rules")
    assert(!p.contains("CartesianProduct"), p)
    // the only nested-loop is the deliberate one-row count broadcast
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p)
    assert(p.contains("partial_count") || p.contains("HashAggregate"),
      "pair and frequency counts must map-side combine\n" + p)
  }

  test("q122: ensemble edge union stays on bucketed equi-joins (pre-CC stage)") {
    // assert on the edge-generation stage: the CC iteration checkpoints its
    // input, so the final q122 plan would hide the joins that matter
    import org.apache.spark.sql.functions.col
    val d = sf("sf0.001")
    val p = withMemoOff {
      graft.analytics.Dedup.jaccardNearDup(spark, d)
        .select(col("doc_a"), col("doc_b"))
        .union(Relational.fuzzyNearDup(spark, d).select(col("doc_a"), col("doc_b")))
        .queryExecution.executedPlan.toString
    }
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "ensemble dedup must stay on bucketed equi-joins\n" + p)
  }

  test("q134: cosine leg is sign-LSH bucketed equi-joins — no cartesian, no nested loop") {
    // round-7 verdict item 2: the exact all-pairs theta-join is gone from
    // the gated query; candidates come from sign-bucket equi-joins. Assert
    // on the edge-generation stage (CC materializes its input, so the final
    // q134 plan would hide the join that matters).
    import org.apache.spark.sql.functions.col
    val p = withMemoOff {
      val emb = Tables.embeddings(spark, sf("sf0.001"))
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      Similarity.embeddingNearDupOn(emb, 0.9499)
        .queryExecution.executedPlan.toString
    }
    assert(!p.contains("CartesianProduct"), "q134 cosine leg has a cartesian\n" + p)
    assert(!p.contains("BroadcastNestedLoopJoin"), "q134 cosine leg nested-loops\n" + p)
  }

  test("q169: surprisal is freq-table + equi-join-back — no window, one-row total broadcast only") {
    val p = plan("q169_surprisal_score")
    assert(!p.contains("Window"), "surprisal must not window the token stream\n" + p)
    assert(!p.contains("CartesianProduct"), p)
    // the only nested-loop is the one-row corpus-total broadcast
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p)
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "frequency and per-doc aggregates must map-side combine\n" + p)
  }

  test("q126: ratio-to-report broadcasts denominators back — no window over detail") {
    val p = plan("q126_revenue_share")
    assert(!p.contains("Window"), "percent-of-total must not window on 5 region keys\n" + p)
    assert(!p.contains("CartesianProduct"), p)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4,
      "dims + region totals must all broadcast\n" + p)
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1,
      "only the one-row grand total may nested-loop\n" + p)
  }

  test("q128: RFM scores via broadcast quintile bounds — never a global ntile window") {
    val p = plan("q128_rfm_segments")
    assert(!p.contains("Window"),
      "a global ntile would single-partition the customer universe\n" + p)
    // the only nested-loops are one-row broadcasts: the bounds row plus one
    // watermark per per-customer aggregate branch (built twice: once to
    // feed the bounds, once for the scored output)
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 3, p)
  }

  test("q129: SCD2 build shares one user_id exchange across both windows") {
    val p = plan("q129_scd2_intervals")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      "lag filter and lead/version windows must reuse the same clustering\n" + p)
  }

  test("q135: attribution rides one user_id exchange plus the final aggregate only") {
    val p = plan("q135_attribution")
    val ex = "Exchange hashpartitioning\\(([^,)]+)".r.findAllMatchIn(p).map(_.group(1)).toSeq
    assert(ex.size == 2, s"expected session chain + final agg exchanges, got $ex\n" + p)
    assert(ex.exists(_.startsWith("user_id")),
      "all three windows must share the user_id clustering\n" + p)
  }

  test("q45: single-year read of the date-partitioned zone prunes partitions") {
    import graft.analytics.LayoutOps
    LayoutOps.prunedOrdersByYear(spark, sf("sf0.001")).count() // writes the layout
    val p = LayoutOps.prunedScan(spark, 1995).queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(o_year"), p)
    // pruning happened if the scan's partition filter is present AND the
    // data filter did NOT fall back to a post-scan Filter on o_year
    assert(!p.contains("Filter (o_year"), "o_year filter must prune, not post-filter\n" + p)
  }

  test("q145: eval grams and eval totals broadcast; corpus side never shuffles before the pair count") {
    val p = plan("q145_containment")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      "gram join AND n_eval join must broadcast\n" + p)
    assert(!p.contains("SortMergeJoin"), "no shuffle join anywhere\n" + p)
  }

  test("q149: skyline windows are the 64-row bucket table + bucket-partitioned survivors — never a global data sort") {
    val p = plan("q149_pareto_frontier")
    // exactly two windows: the suffix-min over the bucket AGGREGATE (tiny,
    // single-partition by construction) and the survivor window keyed by bk
    assert("Window".r.findAllIn(p).size == 2, p)
    assert(p.contains("windowspecdefinition(bk"),
      "survivor window must be partitioned by bucket\n" + p)
    assert(p.contains("BroadcastHashJoin"), "sufmin joins back via broadcast\n" + p)
  }

  test("q150: neighbor top-k lowers to WindowGroupLimit heaps") {
    val p = plan("q150_item_knn")
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q148: pair join keys on cid; assignment is a narrow codegen'd map") {
    val p = plan("q148_ivf_neardup")
    assert(p.contains("nearest_centroid"), "codegen'd assignment kernel\n" + p)
    assert(!p.contains("CartesianProduct"), p)
    // the blocking property: the pair join is an equi-join KEYED ON cid
    // (broadcast at this SF, shuffled at scale — either is hash-on-cid),
    // never an unkeyed loop over vector pairs
    assert(p.contains("Join [cid"), "pair join must key on cid\n" + p)
  }

  test("q176: query-term restriction broadcasts; per-query top-k lowers to WindowGroupLimit") {
    val p = plan("q176_bm25_topk")
    assert(p.contains("BroadcastHashJoin"), "term restriction must broadcast\n" + p)
    assert(p.contains("WindowGroupLimit"), "top-k must be heap-bounded below the sort\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q177: RRF fusion has no cartesian; the semantic leg broadcasts its queries") {
    val p = plan("q177_hybrid_rrf")
    assert(!p.contains("CartesianProduct"), p)
    // the one nested-loop is the broadcast of the 3 query vectors (q28's
    // documented shape); anything bigger is a regression
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q183: dup-gram join back is an equi-join on the gram; windows key on doc_id") {
    val p = plan("q183_repeated_spans")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("word_ngrams_all"), "codegen'd positional gram kernel\n" + p)
  }

  test("q186: manifest is one partial+final aggregate — exactly one shuffle, no sort") {
    val p = plan("q186_shard_manifest")
    assert(p.contains("HashAggregate"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      "manifest must be a single shard_id-keyed exchange\n" + p)
    assert(!p.contains("Sort "), "no ordering anywhere in a hash-mod manifest\n" + p)
  }

  test("q192: epoch top-k lowers to WindowGroupLimit; the only nested loop is the epoch broadcast") {
    val p = plan("q192_epoch_order")
    assert(p.contains("WindowGroupLimit"),
      "rank bound must prune per-partition below the sort\n" + p)
    assert(!p.contains("CartesianProduct"), p)
    // the 2-row epoch frame broadcasts (the documented kilobyte-pin shape)
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }
}
