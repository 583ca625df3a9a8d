package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.analytics._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator is a named entry in `queries`; every
  * SQL-expressible one has a matching DuckDB oracle in `oracleSql` with
  * IDENTICAL column names and mirrored expression semantics (rounding,
  * casts, tie-breaking). Non-SQL-expressible ops (sketches, LSH) are
  * rows-only checked.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.pricingSummary(spark, "/root/testdata/sf0.001")

  /** Shared oracle for the seven ANN gate queries
    * (q29/q51/q74/q85/q87/q97/q220): each planted scaled copy must come
    * back at rank 1, cosine 1.0. */
  private val PlantedTopKOracle: String =
    """SELECT vec_id AS query_id, 1::BIGINT AS plant_rank, 1.0::DOUBLE AS plant_sim
      |FROM embeddings WHERE vec_id < 10""".stripMargin

  /** Shared oracle for the SimHash gate queries (q27/q63): the planted
    * exact copy of every doc in the deterministic 10% content sample (the
    * q64 bucket rule) must surface at Hamming distance 0. */
  private val SimhashPlantedOracle: String =
    """SELECT doc_id AS doc_a, doc_id + 1000000 AS doc_b, 0::BIGINT AS hamming
      |FROM documents
      |WHERE (ascii(substring(md5(text), 1, 1)) * 256 + ascii(substring(md5(text), 2, 1))) % 100 < 10""".stripMargin

  /** Shared shingle CTEs: per-doc DISTINCT word-3-gram sets (q25's
    * statement; `[trimmed_text]` for docs under 3 tokens) over `src` —
    * the full documents table by default, a retained-subset CTE for
    * q228. Ends with `wsh(doc_id, s)`. */
  private def shingleCtesFrom(src: String): String =
    s"""wt AS (
      |  SELECT doc_id, regexp_replace(text, '^\\s+|\\s+$$', '', 'g') AS tt, regexp_extract_all(text, '\\S+') AS toks
      |  FROM $src),
      |wsh AS (
      |  SELECT doc_id, list_distinct(
      |    CASE WHEN len(toks) >= 3
      |         THEN list_transform(range(1, len(toks) - 1),
      |                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
      |         ELSE [tt] END) AS s
      |  FROM wt)""".stripMargin

  private val ShingleCtes: String = shingleCtesFrom("documents")

  /** Exact Jaccard ≥ 0.6 pair graph over `wsh`, in the fast relational
    * form: unnest the distinct shingle sets and equi-join on the shingle
    * (the PPJoin candidate rule — only pairs sharing ≥1 shingle are ever
    * scored), with |A∩B| = the matched-shingle count and |A∪B| =
    * |A|+|B|−|A∩B| since the sets are distinct. Replaces the former
    * all-pairs `wsh a JOIN wsh b … list_intersect` statement, which cost
    * 47–72 s PER CONSUMING ORACLE in the round-8 driver gate; this form
    * is row-identical (pinned at sf0.001/0.01/0.1 in
    * tools/proto_fast_cc.py) and runs in <0.1 s. MATERIALIZED pins one
    * evaluation of the doubly-referenced unnest. Ends with
    * `ej(a, b, jaccard)`. */
  private val JaccardPairCtes: String =
    """ex AS MATERIALIZED (SELECT doc_id, len(s) AS ln, unnest(s) AS sh FROM wsh),
      |ej AS MATERIALIZED (
      |  SELECT x.doc_id AS a, y.doc_id AS b,
      |    round(count(*)::DOUBLE / nullif(x.ln + y.ln - count(*), 0)::DOUBLE, 4) AS jaccard
      |  FROM ex x JOIN ex y ON x.sh = y.sh AND x.doc_id < y.doc_id
      |  GROUP BY x.doc_id, y.doc_id, x.ln, y.ln
      |  HAVING round(count(*)::DOUBLE / nullif(x.ln + y.ln - count(*), 0)::DOUBLE, 4) >= 0.6)""".stripMargin

  /** Fixed-round min-label connected components over an edge CTE
    * `e(a, b)` — replaces the former `WITH RECURSIVE reach` transitive
    * closure (all-pairs reachability, quadratic in component size; the
    * other half of the round-8 oracle-budget blowout). Each composite
    * round is one edge relax (lbl ← min over neighbors' labels) and one
    * pointer jump (lbl ← lbl(lbl)), so the known-min horizon grows at
    * least one hop per round and in practice doubles via the jump; 8
    * rounds far exceed the near-clique dedup-component diameters here,
    * and the result is pinned row-identical to the recursive form at
    * sf0.001/0.01/0.1 (tools/proto_fast_cc.py). A corpus whose component
    * diameters ever defeat the rounds fails LOUDLY, not wrong: one extra
    * relax round re-derives the labels, and any difference raises a
    * DuckDB error() — a relax fixpoint implies labels are constant per
    * component, which forces canonical = component min (the minimum
    * node's label can never exceed itself). Ends with
    * `comp(doc_id, canonical_id)`: one row per node with ≥1 edge,
    * canonical = component min — the reach statement's semantics. */
  private def minLabelCcCtes(rounds: Int = 8): String = {
    val steps = (1 to rounds).map { i =>
      val p = s"n${i - 1}"
      s"""r$i AS MATERIALIZED (
         |  SELECT p.v, least(p.lbl, min(q.lbl)) AS lbl
         |  FROM $p p JOIN und u ON p.v = u.a JOIN $p q ON u.b = q.v
         |  GROUP BY p.v, p.lbl),
         |n$i AS MATERIALIZED (
         |  SELECT p.v, least(p.lbl, q.lbl) AS lbl
         |  FROM r$i p JOIN r$i q ON p.lbl = q.v)""".stripMargin
    }.mkString(",\n")
    val last = s"n$rounds"
    s"""und AS MATERIALIZED (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
       |n0 AS MATERIALIZED (SELECT a AS v, least(a, min(b)) AS lbl FROM und GROUP BY a),
       |$steps,
       |ccchk AS MATERIALIZED (
       |  SELECT count(*) AS n_unconverged FROM (
       |    SELECT p.v, least(p.lbl, min(q.lbl)) AS lbl
       |    FROM $last p JOIN und u ON p.v = u.a JOIN $last q ON u.b = q.v
       |    GROUP BY p.v, p.lbl
       |    EXCEPT SELECT v, lbl FROM $last)),
       |comp AS (
       |  SELECT v AS doc_id,
       |    CASE WHEN (SELECT n_unconverged FROM ccchk) = 0 THEN lbl
       |         ELSE error('min-label CC not converged in $rounds rounds') END AS canonical_id
       |  FROM $last)""".stripMargin
  }

  /** Shared prefix: exact Jaccard ≥ 0.6 pair graph and its connected
    * components (q37's statement; reused by q142/q170/q71/q72). Ends
    * with `comp(doc_id, canonical_id)`; `e(a, b)` stays visible for
    * pair-count consumers. */
  private val DedupCcCte: String =
    "WITH\n" + ShingleCtes + ",\n" + JaccardPairCtes + ",\n" +
      "e AS (SELECT a, b FROM ej),\n" + minLabelCcCtes()

  /** Fuzzy-edge blocking + verify (q95's statement; the `ef` leg of the
    * q122/q134 ensembles): first-3-tokens block × width-30 length band,
    * then exact levenshtein ≥ 0.7 on candidates — mirrors
    * Relational.fuzzyCandidates exactly (the round-9 token-prefix block;
    * see its scaladoc for the growth measurements). Ends with `ef(a, b)`;
    * `fd` stays visible for consumers needing lev/edit_sim columns. */
  private val FuzzyEdgeCtes: String =
    """fd AS (
      |  SELECT doc_id, text,
      |    array_to_string(regexp_extract_all(text, '\S+')[1:3], ' ') AS blk,
      |    length(text) AS l
      |  FROM documents),
      |ef AS (
      |  SELECT fa.doc_id AS a, fb.doc_id AS b
      |  FROM fd fa JOIN fd fb ON fa.blk = fb.blk
      |    AND fa.doc_id < fb.doc_id AND abs(fa.l - fb.l) <= 30
      |  WHERE round(1.0 - levenshtein(fa.text, fb.text)::DOUBLE / greatest(fa.l, fb.l), 4) >= 0.7)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- relational core ---------------------------------------------------
    "q01_pricing_summary"          -> Relational.pricingSummary _,
    "q02_group_count"              -> Relational.groupCount _,
    "q03_filter_project"           -> Relational.filterProject _,
    "q04_revenue_by_nation"        -> Relational.revenueByNation _,
    "q05_top_orders_per_customer"  -> Relational.topOrdersPerCustomer _,
    "q06_customer_cube"            -> Relational.customerCube _,
    "q07_distinct_counts"          -> Relational.distinctParts _,
    "q08_top_orders"               -> Relational.topOrders _,
    "q09_hourly_events"            -> Relational.hourlyEvents _,
    "q10_customers_without_orders" -> Relational.customersWithoutOrders _,
    "q11_json_extract"             -> Relational.jsonExtract _,
    "q12_sessionize"               -> Relational.sessionize _,
    "q13_approx_distinct"          -> Relational.approxDistinct _,
    "q14_price_quantiles"          -> Relational.priceQuantiles _,
    "q33_asof_attribution"         -> Relational.purchaseAttribution _,
    "q34_orders_rollup"            -> Relational.ordersRollup _,
    "q35_orders_pivot"             -> Relational.ordersPivot _,
    "q36_customer_setops"          -> Relational.customerSetOps _,
    "q42_session_window"           -> Relational.sessionWindow _,
    // -- listing pipeline (reference semantics, fixture-driven) ------------
    "q15_listing_normalize"        -> ((s: SparkSession, _: String) => Views.fixtureListings(s)),
    "q16_district_count"           -> ((s: SparkSession, _: String) => Views.districtCounts(Views.fixtureListings(s))),
    "q17_district_price_stats"     -> ((s: SparkSession, _: String) => Views.districtPriceStats(Views.fixtureListings(s))),
    "q18_district_topk"            -> ((s: SparkSession, _: String) => Views.topKPerDistrict(Views.fixtureListings(s))),
    // -- dedup family ------------------------------------------------------
    "q20_exact_dedup"              -> Dedup.exact _,
    "q37_dedup_corpus"             -> ((s: SparkSession, d: String) => Dedup.dedupCorpus(s, d)),
    "q38_train_split"              -> Sampling.trainSplit _,
    "q39_split_counts"             -> Sampling.splitCounts _,
    "q25_jaccard_neardup"          -> ((s: SparkSession, d: String) => Dedup.nearDupPairs(s, d)),
    // gate forms: oracle-exact planted/join-back outputs (raw candidate
    // APIs — minhashLsh, simhashNearDup, simhash128NearDup — stay
    // spec-tested and benchable)
    "q26_minhash_lsh"              -> Accuracy.minhashLshGate _,
    "q27_simhash_neardup"          -> Accuracy.simhash64Gate _,
    "q63_simhash128_neardup"       -> Accuracy.simhash128Gate _,
    // -- text analysis -----------------------------------------------------
    "q21_token_stats"              -> TextStats.tokenStats _,
    "q22_quality_score"            -> TextStats.qualityScore _,
    "q23_lang_id"                  -> TextStats.langId _,
    "q24_fingerprint"              -> TextStats.fingerprints _,
    // -- similarity search -------------------------------------------------
    "q28_cosine_topk"              -> ((s: SparkSession, d: String) => Similarity.bruteForceTopK(s, d)),
    "q29_lsh_topk"                 -> Accuracy.lshTopKGate _,
    "q30_embedding_neardup"        -> Accuracy.embeddingNearDupGate _,
    "q51_ivf_topk"                 -> Accuracy.ivfTopKGate _,
    "q74_pq_topk"                  -> Accuracy.pqTopKGate _,
    // -- multimodal plumbing ----------------------------------------------
    "q31_media_meta"               -> Multimodal.decodeMeta _,
    "q32_media_format_stats"       -> Multimodal.formatStats _,
    "q40_frame_sample"             -> Multimodal.frameSample _,
    "q41_thumbnail_dims"           -> ((s: SparkSession, d: String) => Multimodal.thumbnailDims(s, d)),
    // -- physical layout under the gate (salt/bucket/prune/sample/compact) -
    "q43_salted_skew_join"         -> LayoutOps.saltedFlagJoin _,
    "q44_bucketed_join"            -> LayoutOps.bucketedCustomerOrders _,
    "q45_partition_pruning"        -> ((s: SparkSession, d: String) => LayoutOps.prunedOrdersByYear(s, d)),
    "q46_content_sample"           -> ((s: SparkSession, d: String) => LayoutOps.contentSample(s, d)),
    "q47_compaction"               -> LayoutOps.compactedCrawls _,
    // -- derived accuracy checks over the probabilistic family -------------
    "q48_minhash_recall"           -> Accuracy.minhashRecall _,
    "q49_lsh_planted_recall"       -> Accuracy.lshPlantedRecall _,
    "q50_hll_error_bound"          -> Accuracy.hllErrorBound _,
    "q52_ivf_planted_recall"       -> Accuracy.ivfPlantedRecall _,
    "q64_simhash128_recall"        -> Accuracy.simhash128PlantedRecall _,
    "q75_pq_planted_recall"        -> Accuracy.pqPlantedRecall _,
    // -- pipeline-composition audits + exact twins --------------------------
    "q53_split_contamination"      -> Sampling.splitContamination _,
    "q54_price_quantiles_exact"    -> Relational.priceQuantilesExact _,
    "q55_tfidf_terms"              -> ((s: SparkSession, d: String) => TextStats.tfidfTopTerms(s, d)),
    "q56_range_join"               -> Relational.clicksBeforePurchase _,
    "q57_grouping_sets"            -> Relational.ordersGroupingSets _,
    "q58_length_outliers"          -> TextStats.lengthOutliers _,
    "q59_quality_normalized"       -> TextStats.qualityNormalized _,
    "q60_unigram_logprob"          -> TextStats.unigramLogProb _,
    "q76_bigram_logprob"           -> TextStats.bigramLogProb _,
    "q61_stratified_sample"        -> ((s: SparkSession, d: String) => Sampling.stratifiedSample(s, d)),
    "q62_token_packing"            -> ((s: SparkSession, d: String) => Sampling.tokenPacking(s, d)),
    // -- corpus filtering / mixing (round 3) --------------------------------
    "q65_repetition_ratio"         -> TextStats.repetitionRatio _,
    "q66_gopher_filter"            -> TextStats.gopherFilter _,
    "q67_mixture_sample"           -> Sampling.mixtureSample _,
    "q68_boilerplate_ngrams"       -> TextStats.boilerplateNgrams _,
    "q69_decontamination"          -> ((s: SparkSession, d: String) => Sampling.decontamination(s, d)),
    "q70_decontaminated_train"     -> ((s: SparkSession, d: String) => Sampling.decontaminatedTrain(s, d)),
    "q71_dedup_keep_best"          -> ((s: SparkSession, d: String) => Dedup.dedupKeepBest(s, d)),
    "q72_dedup_stats"              -> ((s: SparkSession, d: String) => Dedup.dedupStats(s, d)),
    "q73_clean_corpus"             -> Sampling.cleanCorpus _,
    // -- round 4: privacy, runtime-filter decon, span dedup, trend windows --
    "q77_pii_scrub"                -> Privacy.piiScrub _,
    "q78_bloom_decontamination"    -> ((s: SparkSession, d: String) => Sampling.decontaminationBloom(s, d)),
    "q79_span_dedup"               -> ((s: SparkSession, d: String) => Dedup.spanDedup(s, d)),
    "q80_revenue_trend"            -> Relational.revenueTrend _,
    "q81_small_qty_revenue"        -> Relational.smallQtyRevenue _,
    // -- round 4: chunking, sketch heavy hitters, weighted sampling ---------
    "q82_doc_chunks"               -> ((s: SparkSession, d: String) => TextStats.chunkDocuments(s, d)),
    "q83_heavy_hitters"            -> ((s: SparkSession, d: String) => TextStats.heavyHitters(s, d)),
    "q84_weighted_sample"          -> ((s: SparkSession, d: String) => Sampling.weightedSample(s, d)),
    "q89_blamed_suppliers"         -> Relational.blamedSuppliers _,
    "q90_returnflag_unpivot"       -> Relational.returnFlagUnpivot _,
    "q85_sq_topk"                  -> Accuracy.sqTopKGate _,
    "q86_sq_planted_recall"        -> Accuracy.sqPlantedRecall _,
    "q87_ivfpq_topk"               -> Accuracy.ivfPqTopKGate _,
    "q88_ivfpq_planted_recall"     -> Accuracy.ivfPqPlantedRecall _,
    "q91_props_map_explode"        -> Relational.propsMapExplode _,
    "q92_conversion_funnel"        -> Relational.conversionFunnel _,
    "q93_cohort_retention"         -> Relational.cohortRetention _,
    "q94_column_profile"           -> Relational.columnProfile _,
    "q95_fuzzy_neardup"            -> ((s: SparkSession, d: String) => Relational.fuzzyNearDup(s, d)),
    "q96_rolling_revenue"          -> Relational.rollingRevenue _,
    // -- round 4: quantizer-matrix completion, session funnel, freshness ----
    "q97_ivfsq_topk"               -> Accuracy.ivfSqTopKGate _,
    "q98_ivfsq_planted_recall"     -> Accuracy.ivfSqPlantedRecall _,
    "q99_session_funnel"           -> Relational.sessionFunnel _,
    "q100_source_freshness"        -> ((s: SparkSession, d: String) => Relational.sourceFreshness(s, d)),
    "q101_split_drift"             -> Sampling.splitDrift _,
    "q102_mergeable_quantiles"     -> Relational.mergeableQuantiles _,
    "q103_mad_outliers"            -> Relational.madOutliers _,
    // gate edge serializes postings to a comma string: the driver's pandas
    // sorter cannot hash array columns (the raw array API stays spec-tested)
    "q104_inverted_index"          -> ((s: SparkSession, d: String) =>
      TextStats.invertedIndex(s, d).select(col("term"), col("df"),
        array_join(col("postings").cast("array<string>"), ",").as("postings"))),
    "q105_top_part_per_nation"     -> Relational.topPartPerNation _,
    "q106_shipping_priority"       -> Relational.shippingPriority _,
    "q107_new_vs_returning"        -> Relational.newVsReturning _,
    "q108_big_orders"              -> ((s: SparkSession, d: String) => Relational.bigOrders(s, d)),
    "q109_equidepth_histogram"     -> ((s: SparkSession, d: String) => Relational.equiDepthHistogram(s, d)),
    "q110_table_checksums"         -> Relational.tableChecksums _,
    "q111_key_skew_profile"        -> Relational.keySkewProfile _,
    "q112_order_count_distribution" -> Relational.orderCountDistribution _,
    "q113_snapshot_diff"           -> Relational.snapshotDiff _,
    "q114_rolling_active_users"    -> Relational.rollingActiveUsers _,
    "q115_ri_audit"                -> Relational.riAudit _,
    "q116_top_session_paths"       -> ((s: SparkSession, d: String) => Relational.topSessionPaths(s, d)),
    "q117_time_to_convert"         -> Relational.timeToConvert _,
    "q118_phash_neardup"           -> Multimodal.phashNearDupGate _,
    "q119_phash_planted_recall"    -> Multimodal.phashPlantedRecall _,
    "q120_phrase_search"           -> ((s: SparkSession, d: String) => TextStats.phraseSearch(s, d)),
    "q121_zipf_fit"                -> ((s: SparkSession, d: String) => TextStats.zipfFit(s, d)),
    "q122_ensemble_dedup"          -> ((s: SparkSession, d: String) => Dedup.ensembleDedup(s, d)),
    "q123_min_cost_supplier"       -> Relational.minCostSupplier _,
    "q124_copurchase_pairs"        -> ((s: SparkSession, d: String) => Relational.copurchasePairs(s, d)),
    "q125_association_rules"       -> ((s: SparkSession, d: String) => Relational.associationRules(s, d)),
    "q126_revenue_share"           -> Relational.revenueShare _,
    "q127_order_gap_stats"         -> Relational.orderGapStats _,
    "q128_rfm_segments"            -> Relational.rfmSegments _,
    "q129_scd2_intervals"          -> Relational.scd2Intervals _,
    "q130_triangle_count"          -> ((s: SparkSession, d: String) => Graph.triangleCount(s, d)),
    "q131_maintenance_overlap"     -> Relational.maintenanceOverlap _,
    "q132_pagerank"                -> ((s: SparkSession, d: String) => Graph.pageRank(s, d)),
    "q133_kcore"                   -> ((s: SparkSession, d: String) => Graph.kCore(s, d)),
    "q134_ensemble_full"           -> ((s: SparkSession, d: String) => Dedup.ensembleDedupFull(s, d)),
    "q135_attribution"             -> Relational.attribution _,
    "q136_pagerank_weighted"       -> ((s: SparkSession, d: String) => Graph.pageRankWeighted(s, d)),
    "q137_incremental_agg"         -> Relational.incrementalAgg _,
    "q138_pagerank_personalized"   -> ((s: SparkSession, d: String) => Graph.pageRankPersonalized(s, d)),
    "q139_label_propagation"       -> ((s: SparkSession, d: String) => Graph.labelPropagation(s, d)),
    "q140_reach2"                  -> ((s: SparkSession, d: String) => Graph.reach2(s, d)),
    "q141_modularity"              -> ((s: SparkSession, d: String) => Graph.modularity(s, d)),
    // composed dedup pipeline with the shared pair-graph cache ON —
    // correctness-pins the cached shared-scan shape q37/q71/q72/q73 share
    "q142_dedup_pipeline"          -> ((s: SparkSession, d: String) => Dedup.dedupPipelineSummary(s, d)),
    "q143_embedding_drift"         -> ((s: SparkSession, d: String) => Similarity.embeddingDrift(s, d)),
    "q144_ivf_cell_stats"          -> ((s: SparkSession, d: String) => Similarity.ivfCellStats(s, d)),
    // -- round 5: containment contamination, z-order skipping, closeness --
    "q145_containment"             -> ((s: SparkSession, d: String) => Sampling.containmentScores(s, d)),
    "q146_zorder_skipping"         -> ((s: SparkSession, d: String) => Layout.zorderSkipping(s, d)),
    "q147_closeness_pivots"        -> ((s: SparkSession, d: String) => Graph.closenessPivots(s, d)),
    "q148_ivf_neardup"             -> Accuracy.ivfNearDupGate _,
    "q149_pareto_frontier"         -> ((s: SparkSession, d: String) => Relational.paretoFrontier(s, d)),
    "q150_item_knn"                -> ((s: SparkSession, d: String) => Relational.itemKnn(s, d)),
    "q151_sketch_rollup"           -> Relational.sketchRollup _,
    "q152_kmv_overlap"             -> Accuracy.kmvOverlap _,
    "q153_kmv_rollup"              -> Accuracy.kmvRollup _,
    "q154_semantic_dedup"          -> ((s: SparkSession, d: String) => Dedup.semanticDedup(s, d)),
    "q155_domain_cap"              -> ((s: SparkSession, d: String) => Sampling.domainCap(s, d)),
    "q156_collocation_pmi"         -> ((s: SparkSession, d: String) => TextStats.collocationPmi(s, d)),
    "q157_compressibility"         -> TextStats.compressibility _,
    "q158_curriculum_order"        -> Sampling.curriculumOrder _,
    "q159_curriculum_sketch"       -> Sampling.curriculumSketchGate _,
    "q160_incremental_dedup"       -> DedupIndex.incrementalGate _,
    "q161_ann_index_recall"        -> AnnIndex.plantedRecallGate _,
    "q162_cluster_sample"          -> ((s: SparkSession, d: String) => Similarity.clusterBalancedSample(s, d)),
    "q163_quality_probe"           -> ((s: SparkSession, d: String) => QualityProbe.trainedScores(s, d)),
    "q164_bpe_merges"              -> ((s: SparkSession, d: String) => BpeInduction.merges(s, d)),
    "q165_bpe_tokenize"            -> ((s: SparkSession, d: String) => BpeInduction.tokenCounts(s, d)),
    "q166_quantizer_refresh"       -> AnnIndex.refreshGate _,
    "q167_ann_compaction"          -> AnnIndex.compactedRecallGate _,
    "q168_betweenness_pivots"      -> ((s: SparkSession, d: String) => Graph.betweennessPivots(s, d)),
    "q169_surprisal_score"         -> ((s: SparkSession, d: String) => TextStats.surprisalScore(s, d)),
    "q170_dedup_weights"           -> ((s: SparkSession, d: String) => Dedup.dedupWeights(s, d)),
    "q171_dedup_index_compaction"  -> DedupIndex.compactedGate _,
    "q172_bigram_surprisal"        -> ((s: SparkSession, d: String) => TextStats.bigramSurprisal(s, d)),
    "q173_dsir_score"              -> ((s: SparkSession, d: String) => TextStats.dsirScore(s, d)),
    "q174_semantic_contamination"  -> ((s: SparkSession, d: String) => Sampling.semanticContamination(s, d)),
    "q175_curation_decision"       -> ((s: SparkSession, d: String) => Sampling.curationDecision(s, d)),
    "q176_bm25_topk"               -> ((s: SparkSession, d: String) => TextStats.bm25TopK(s, d)),
    "q177_hybrid_rrf"              -> ((s: SparkSession, d: String) => TextStats.hybridRrf(s, d)),
    "q178_mmr_rerank"              -> ((s: SparkSession, d: String) => TextStats.mmrRerank(s, d)),
    "q179_lex_index"               -> LexIndex.indexGate _,
    "q180_lex_compaction"          -> LexIndex.compactedGate _,
    "q181_temperature_mixture"     -> ((s: SparkSession, d: String) => Sampling.temperatureMixture(s, d)),
    "q182_vocab_drift"             -> ((s: SparkSession, d: String) => TextStats.vocabDrift(s, d)),
    "q183_repeated_spans"          -> ((s: SparkSession, d: String) => Dedup.repeatedSpans(s, d)),
    "q184_pipeline_funnel"         -> ((s: SparkSession, d: String) => Sampling.pipelineFunnel(s, d)),
    "q185_span_scrub"              -> ((s: SparkSession, d: String) => Dedup.spanScrub(s, d)),
    "q186_shard_manifest"          -> ((s: SparkSession, d: String) => Sampling.shardManifest(s, d)),
    "q187_probe_calibration"       -> ((s: SparkSession, d: String) => QualityProbe.calibration(s, d)),
    "q188_bpe_fertility"           -> ((s: SparkSession, d: String) => BpeInduction.fertilityByLang(s, d)),
    "q189_shard_write"             -> ((s: SparkSession, d: String) => Sampling.shardedWriteGate(s, d)),
    "q190_manifest_diff"           -> ((s: SparkSession, d: String) => Sampling.manifestDiff(s, d)),
    "q191_source_leakage"          -> ((s: SparkSession, d: String) => Dedup.sourceLeakage(s, d)),
    "q192_epoch_order"             -> ((s: SparkSession, d: String) => Sampling.epochOrder(s, d)),
    "q193_packing_efficiency"      -> ((s: SparkSession, d: String) => Sampling.packingEfficiency(s, d)),
    "q194_source_profile"          -> ((s: SparkSession, d: String) => Sampling.sourceProfile(s, d)),
    "q195_contamination_agreement" -> ((s: SparkSession, d: String) => Sampling.contaminationAgreement(s, d)),
    "q196_retrieval_agreement"     -> ((s: SparkSession, d: String) => TextStats.retrievalAgreement(s, d)),
    "q197_token_waterfill"         -> ((s: SparkSession, d: String) => Sampling.waterfillCaps(s, d)),
    "q198_waterfill_apply"         -> ((s: SparkSession, d: String) => Sampling.waterfillApply(s, d)),
    "q199_matched_resample"        -> ((s: SparkSession, d: String) => Sampling.matchedResample(s, d)),
    "q200_variant_extract"         -> Formats.variantExtract _,
    "q201_orc_roundtrip"           -> Formats.orcRoundTrip _,
    "q202_schema_evolution"        -> Formats.schemaEvolution _,
    "q203_chunk_profile"           -> ((s: SparkSession, d: String) => Chunking.chunkProfile(s, d)),
    "q204_retrieval_eval"          -> ((s: SparkSession, d: String) => TextStats.retrievalEval(s, d)),
    "q205_corrupt_resilience"      -> Formats.corruptResilientRead _,
    "q206_dedup_index_delete"      -> DedupIndex.deleteGate _,
    "q207_ann_index_delete"        -> AnnIndex.deleteGate _,
    "q208_lex_index_delete"        -> LexIndex.deleteGate _,
    "q209_filtered_ann"            -> AnnIndex.filteredGate _,
    "q210_agg_pushdown"            -> Formats.aggPushdown _,
    "q211_shard_delete"            -> ((s: SparkSession, d: String) => Sampling.shardedDeleteGate(s, d)),
    "q212_index_audit"             -> IndexAudit.auditGate _,
    "q213_manifest_delete"         -> ((s: SparkSession, d: String) => Sampling.manifestDeleteGate(s, d)),
    "q214_slice_confidence"        -> TextStats.qualityConfidence _,
    "q215_shard_upsert"            -> ((s: SparkSession, d: String) => Sampling.shardUpsertGate(s, d)),
    "q216_forget_audit"            -> IndexAudit.forgetGate _,
    "q217_index_swap"              -> AnnIndex.rebuildSwapGate _,
    "q218_k_anonymity"             -> ((s: SparkSession, d: String) => Privacy.kAnonymity(s, d)),
    "q219_betweenness_exact"       -> ((s: SparkSession, d: String) => Graph.betweennessExact(s, d)),
    "q220_rp_topk"                 -> Accuracy.rpTopKGate _,
    "q221_lex_swap"                -> LexIndex.swapGate _,
    "q222_exact_substring_spans"   -> ((s: SparkSession, d: String) =>
      Dedup.exactSubstringSpans(s, d)),
    "q223_lloyd_refresh"           -> ((s: SparkSession, d: String) =>
      Similarity.lloydRefine(s, d)),
    "q224_graph_ann"               -> Accuracy.graphTopKGate _,
    "q225_graph_index"             -> AnnGraphIndex.indexGate _,
    "q226_graph_index_extend"      -> AnnGraphIndex.extendGate _,
    "q227_graph_index_audit"       -> AnnGraphIndex.auditGate _,
    "q228_cluster_index"           -> DedupIndex.clusterGate _,
    "q229_cluster_audit"           -> DedupIndex.clusterAuditGate _,
    "q230_targeted_compaction"     -> DedupIndex.targetedCompactionGate _)

  // NOTE on numbering: there is deliberately no q19 — the slot was retired
  // during round 1 (its candidate operator was folded into q16's chain) and
  // the driver keys queries by NAME, not position. Kept vacant rather than
  // renumbering so CORRECTNESS_r{N}.json stays diffable across rounds.

  // ---------------------------------------------------------------------
  // Oracle SQL (DuckDB dialect) — the raw-listing fixture reproduced as a
  // VALUES list so the normalization semantics are checked value-by-value.
  // ---------------------------------------------------------------------

  // Row 9 is NFD-encoded via the same helper the fixture uses — byte-exact
  // mirror of ListingFixtures.rows(8) (see the NFC-at-ingest contract there).
  private def nfd(s: String): String = graft.ingest.ListingFixtures.nfd(s)

  private val listingValues: String =
    s"""(VALUES
      | (1, 'Hôm nay', 'Đường Lê Lợi, Phường Bến Nghé, Quận 1, Hồ Chí Minh', '5,5 tỷ', '80 m²', 'Kích thước: 4x20m', '12m', '3 lầu', '4 phòng ngủ', 'Có'),
      | (2, 'Hôm qua', 'Phố Huế, Xã Tân Triều, Huyện Thanh Trì, Hà Nội', '850 triệu', '45,5 m2', 'Kích thước: 4,5x10m', '8m', '2 lầu', '3 phòng ngủ', NULL),
      | (3, '24/04/2025', 'Nguyễn Trãi, Phường 7, Quận Gò Vấp, Hồ Chí Minh', 'Thỏa thuận', '---', '---', NULL, NULL, NULL, 'Có'),
      | (4, 'not a date', 'A, B, C, D', 'giá rẻ', '120,75 m²', 'Kích thước: ---', NULL, '10 lầu', NULL, NULL),
      | (5, '01/01/2024', 'Đường Nguyễn Huệ, Quận 5', '1.2 tỷ', '60 m', 'Kích thước: 5x12m', '6m', '1 lầu', '2 phòng ngủ', 'Có'),
      | (6, 'hôm nay', 'Trần Phú, Phường Mộ Lao, Quận Hà Đông, Hà Nội', '2,,3 tỷ', 'abc', 'Kích thước: 20m', '4,5m', 'năm lầu', '0 phòng ngủ', 'Không'),
      | (7, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL),
      | (8, '31/02/2025', 'Lý Thường Kiệt, Phường 8, Quận Tân Bình, Hồ Chí Minh', '990  triệu', '33,0 m²', 'Kích thước: 3,3x10m', '5m', '4 lầu', '3 phòng ngủ', 'Có'),
      | (9, '${nfd("hôm qua")}', '${nfd("Đường Nguyễn Huệ, Phường Bến Thành, Quận 3, Hồ Chí Minh")}', '${nfd("2,5 tỷ")}', '${nfd("50 m²")}', '${nfd("Kích thước: 5x10m")}', '6m', '${nfd("2 lầu")}', '${nfd("3 phòng ngủ")}', '${nfd("Có")}')
      |)""".stripMargin

  /** Shared normalization CTE chain mirroring graft.expr.VnText /
    * graft.ingest.Normalize.fromSiteText, anchored at as_of = 2025-04-24. */
  private val listingNormCte: String =
    s"""raw0(id, raw_post_date, raw_address, raw_price, raw_area, raw_dims, raw_road, raw_floors, raw_bedrooms, raw_parking) AS $listingValues,
       |raw AS (
       |  SELECT id,
       |    nfc_normalize(raw_post_date) AS raw_post_date,
       |    nfc_normalize(raw_address) AS raw_address,
       |    nfc_normalize(raw_price) AS raw_price,
       |    nfc_normalize(raw_area) AS raw_area,
       |    nfc_normalize(raw_dims) AS raw_dims,
       |    nfc_normalize(raw_road) AS raw_road,
       |    nfc_normalize(raw_floors) AS raw_floors,
       |    nfc_normalize(raw_bedrooms) AS raw_bedrooms,
       |    nfc_normalize(raw_parking) AS raw_parking
       |  FROM raw0),
       |sp AS (
       |  SELECT *,
       |    string_split(raw_address, ', ') AS parts,
       |    lower(trim(raw_price)) AS pr,
       |    regexp_extract(lower(trim(raw_price)), '([0-9.,]+)\\s*tỷ', 1) AS ty,
       |    regexp_extract(lower(trim(raw_price)), '([0-9.,]+)\\s*triệu', 1) AS tri,
       |    regexp_extract(trim(raw_area), '([0-9.,]+)\\s*m', 1) AS am,
       |    trim(replace(raw_dims, 'Kích thước:', '')) AS dim_base
       |  FROM raw),
       |sp2 AS (
       |  SELECT *,
       |    string_split(trim(replace(dim_base, 'm', '')), 'x') AS dim_parts,
       |    (NOT contains(dim_base, '---')) AND len(string_split(trim(replace(dim_base, 'm', '')), 'x')) >= 2 AS dim_valid
       |  FROM sp),
       |norm AS (
       |  SELECT
       |    id::BIGINT AS id,
       |    CASE WHEN contains(lower(trim(raw_post_date)), 'hôm nay') THEN DATE '2025-04-24'
       |         WHEN contains(lower(trim(raw_post_date)), 'hôm qua') THEN DATE '2025-04-24' - 1
       |         ELSE coalesce(try_strptime(trim(raw_post_date), '%d/%m/%Y')::DATE, DATE '2025-04-24') END AS post_date,
       |    CASE WHEN len(parts) >= 4 THEN regexp_replace(parts[1], '^(Đường |Phố )', '') END AS duong_pho,
       |    CASE WHEN len(parts) >= 4 THEN regexp_replace(parts[2], '^(Phường |Xã )', '') END AS phuong_xa,
       |    CASE WHEN len(parts) >= 4 THEN regexp_replace(parts[3], '^(Quận |Huyện )', '') END AS quan_huyen,
       |    CASE WHEN len(parts) >= 4 THEN parts[4] END AS thanh_pho,
       |    len(parts) >= 4 AS addr_valid,
       |    'Nhà đất' AS loai_bds,
       |    CASE WHEN regexp_matches(trim(replace(am, ',', '.')), '^([0-9]+\\.?[0-9]*|\\.[0-9]+)$$') THEN try_cast(trim(replace(am, ',', '.')) AS DOUBLE) END AS area,
       |    CASE WHEN dim_valid AND regexp_matches(trim(replace(dim_parts[1], ',', '.')), '^([0-9]+\\.?[0-9]*|\\.[0-9]+)$$') THEN try_cast(trim(replace(dim_parts[1], ',', '.')) AS DOUBLE) END AS chieu_ngang,
       |    CASE WHEN dim_valid AND regexp_matches(trim(replace(dim_parts[2], ',', '.')), '^([0-9]+\\.?[0-9]*|\\.[0-9]+)$$') THEN try_cast(trim(replace(dim_parts[2], ',', '.')) AS DOUBLE) END AS chieu_dai,
       |    CASE WHEN regexp_matches(trim(replace(replace(raw_road, 'm', ''), ',', '.')), '^([0-9]+\\.?[0-9]*|\\.[0-9]+)$$') THEN try_cast(trim(replace(replace(raw_road, 'm', ''), ',', '.')) AS DOUBLE) END AS duong_truoc_nha,
       |    CASE WHEN regexp_matches(trim(replace(raw_floors, ' lầu', '')), '^[0-9]+$$') THEN try_cast(trim(replace(raw_floors, ' lầu', '')) AS INTEGER) END AS so_tang,
       |    CASE WHEN regexp_matches(trim(replace(raw_bedrooms, ' phòng ngủ', '')), '^[0-9]+$$') THEN try_cast(trim(replace(raw_bedrooms, ' phòng ngủ', '')) AS INTEGER) END AS so_phong_ngu,
       |    CASE WHEN raw_parking IS NOT NULL THEN trim(raw_parking) = 'Có' END AS cho_de_xe,
       |    CASE WHEN contains(pr, 'thỏa thuận') THEN NULL
       |         WHEN ty <> '' THEN (CASE WHEN regexp_matches(trim(replace(ty, ',', '.')), '^([0-9]+\\.?[0-9]*|\\.[0-9]+)$$') THEN try_cast(trim(replace(ty, ',', '.')) AS DOUBLE) END)
       |         WHEN tri <> '' THEN (CASE WHEN regexp_matches(trim(replace(tri, ',', '.')), '^([0-9]+\\.?[0-9]*|\\.[0-9]+)$$') THEN try_cast(trim(replace(tri, ',', '.')) AS DOUBLE) END) / 1000.0 END AS price_billion_vnd,
       |    CASE WHEN raw_price IS NULL THEN 'unknown'
       |         WHEN contains(pr, 'thỏa thuận') THEN 'negotiable'
       |         WHEN ty <> '' THEN (CASE WHEN regexp_matches(trim(replace(ty, ',', '.')), '^([0-9]+\\.?[0-9]*|\\.[0-9]+)$$') THEN 'ok' ELSE 'unknown' END)
       |         WHEN tri <> '' THEN (CASE WHEN regexp_matches(trim(replace(tri, ',', '.')), '^([0-9]+\\.?[0-9]*|\\.[0-9]+)$$') THEN 'ok' ELSE 'unknown' END)
       |         ELSE 'unknown' END AS price_status,
       |    'alonhadat' AS source
       |  FROM sp2)""".stripMargin

  /** Character-5-gram distinct shingle CTE over documents (mirrors
    * TextStats.shingles). */
  private val shingleCte: String =
    """sh AS (
      |  SELECT doc_id, list_distinct(
      |    CASE WHEN length(text) >= 5
      |         THEN list_transform(range(1, length(text) - 3), i -> substr(text, i, 5))
      |         ELSE [text] END) AS s
      |  FROM documents)""".stripMargin

  /** q176's from-scratch BM25 SQL — also q179's oracle: the persisted
    * inverted index covers exactly the documents corpus, so index-served
    * BM25 must reproduce the direct computation answer-for-answer.
    * `where` restricts the corpus — q208 holds index-served retrieval
    * AFTER A DELETE to the direct computation over the retained docs. */
  private def bm25Sql(where: String): String =
    s"""WITH queries(query_id, term) AS (VALUES
      |  (0,'stream'),(0,'table'),(0,'hash'),
      |  (1,'customer'),(1,'order'),(1,'join'),
      |  (2,'window'),(2,'batch'),(2,'spark')),
      |toks AS (
      |  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS term
      |  FROM documents $where),
      |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
      |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
      |tf AS (
      |  SELECT doc_id, term, count(*) AS tf FROM toks
      |  WHERE term IN (SELECT DISTINCT term FROM queries)
      |  GROUP BY doc_id, term),
      |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      |scored AS (
      |  SELECT q.query_id, t.doc_id, count(*) AS n_hit_terms,
      |    round(sum(
      |      ln((s.n_docs - f.df + 0.5::DOUBLE) / (f.df + 0.5::DOUBLE) + 1.0::DOUBLE)
      |        * (t.tf * 2.2::DOUBLE)
      |        / (t.tf + 1.2::DOUBLE * (0.25::DOUBLE + 0.75::DOUBLE * d.dl / s.avgdl))), 4)
      |      AS score
      |  FROM tf t JOIN dfreq f USING (term) JOIN dl d USING (doc_id)
      |  CROSS JOIN stats s JOIN queries q USING (term)
      |  GROUP BY q.query_id, t.doc_id)
      |SELECT query_id, doc_id, n_hit_terms, score,
      |  row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id)::INT AS rn
      |FROM scored
      |QUALIFY rn <= 10""".stripMargin

  private val Bm25ScratchSql: String = bm25Sql("")

  /** q223's oracle: 3 Lloyd rounds unrolled as CTE chains — assignment
    * (argmin of exact BIGINT squared distance, ties on cid), per-cell
    * metrics against the pre-update centroid, component-wise floor-mean
    * refresh, emptied cells carrying the prior centroid. Every output
    * value is integer, so the hash match is bit-for-bit. */
  private val LloydOracleSql: String = {
    val iters = 3
    def round(t: Int): String = {
      val prev = if (t == 1) "c0" else s"c${t - 1}"
      s"""a$t AS (
         |  SELECT vec_id, xq, cid, dist FROM (
         |    SELECT q.vec_id, q.xq, p.cid,
         |      list_sum(list_transform(list_zip(q.xq, p.c),
         |        z -> (z[1] - z[2]) * (z[1] - z[2]))) AS dist,
         |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |        list_sum(list_transform(list_zip(q.xq, p.c),
         |          z -> (z[1] - z[2]) * (z[1] - z[2]))), p.cid) AS rn
         |    FROM q CROSS JOIN $prev p) WHERE rn = 1),
         |m$t AS (
         |  SELECT cid, count(*)::BIGINT AS n, sum(dist)::BIGINT AS j_cell
         |  FROM a$t GROUP BY cid),
         |s$t AS (
         |  SELECT cid, u['j'] AS j, sum(u['x'])::BIGINT AS sx,
         |    count(*)::BIGINT AS nj
         |  FROM (SELECT cid, unnest(list_transform(range(1, len(xq) + 1),
         |          j -> {'j': j, 'x': xq[j]})) AS u FROM a$t)
         |  GROUP BY cid, u['j']),
         |c$t AS (
         |  SELECT p.cid, coalesce(nc.c, p.c) AS c FROM $prev p LEFT JOIN (
         |    SELECT cid, list(CAST(floor(sx / nj) AS BIGINT) ORDER BY j) AS c
         |    FROM s$t GROUP BY cid) nc USING (cid))""".stripMargin
    }
    def emit(t: Int): String =
      s"""SELECT $t AS iter, c$t.cid, coalesce(m$t.n, 0)::BIGINT AS n,
         |  coalesce(m$t.j_cell, 0)::BIGINT AS j_cell,
         |  list_sum(c$t.c)::BIGINT AS c_sum
         |FROM c$t LEFT JOIN m$t USING (cid)""".stripMargin
    s"""WITH q AS (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS xq
       |  FROM embeddings),
       |c0 AS (
       |  SELECT vec_id AS cid, xq AS c FROM q ORDER BY vec_id LIMIT 8),
       |${(1 to iters).map(round).mkString(",\n")}
       |${(1 to iters).map(emit).mkString("\nUNION ALL\n")}""".stripMargin
  }

  /** q208's oracle: the retained-corpus BM25 chain, stated once per served
    * leg (merge-on-read, then post-purge) — both must match it exactly. */
  private val Bm25RetainedDeleteSql: String = {
    val retained = bm25Sql(
      """WHERE (ascii(substring(md5(text), 1, 1)) * 256
        |       + ascii(substring(md5(text), 2, 1))) % 100 >= 10""".stripMargin)
    s"""SELECT 'mor' AS leg, * FROM ($retained)
       |UNION ALL
       |SELECT 'purged' AS leg, * FROM ($retained)""".stripMargin
  }

  /** q178's oracle: the greedy MMR selection unrolled round-by-round (the
    * engine unrolls the identical recurrence into its plan — see
    * TextStats.mmrRerank). Built mechanically so every round's SQL is
    * literally the same text with the round index substituted. */
  private def mmrOracle(k: Int): String = {
    val rounds = (2 to k).map { i =>
      val prevUnion = (1 until i).map(j => s"SELECT query_id, doc_id FROM sel$j")
        .mkString(" UNION ALL ")
      s"""ms$i AS (
         |  SELECT p.query_id, p.a_doc AS doc_id, max(p.s) AS ms
         |  FROM pair p JOIN ($prevUnion) s
         |    ON p.query_id = s.query_id AND p.b_doc = s.doc_id
         |  GROUP BY 1, 2),
         |mm$i AS (
         |  SELECT c.query_id, c.doc_id, c.rel,
         |    0.7::DOUBLE * c.rel - 0.3::DOUBLE * m.ms AS mmr
         |  FROM cand c JOIN ms$i m USING (query_id, doc_id)
         |  WHERE NOT EXISTS (SELECT 1 FROM ($prevUnion) s
         |    WHERE s.query_id = c.query_id AND s.doc_id = c.doc_id)),
         |sel$i AS (
         |  SELECT query_id, doc_id, rel, mmr, $i AS pick FROM mm$i
         |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY mmr DESC, doc_id) = 1)""".stripMargin
    }.mkString(",\n")
    val allSel = (1 to k).map(i => s"SELECT * FROM sel$i").mkString(" UNION ALL ")
    s"""WITH qv AS (
       |  SELECT vec_id::INT AS query_id, embedding::DOUBLE[] AS qv
       |  FROM embeddings WHERE vec_id < 3),
       |cand AS (
       |  SELECT query_id, doc_id, rel, nv FROM (
       |    SELECT q.query_id, c.vec_id AS doc_id,
       |      list_cosine_similarity(q.qv, c.embedding::DOUBLE[]) AS rel,
       |      c.embedding::DOUBLE[] AS nv
       |    FROM qv q CROSS JOIN embeddings c WHERE c.vec_id <> q.query_id)
       |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, doc_id) <= 30),
       |pair AS (
       |  SELECT a.query_id, a.doc_id AS a_doc, b.doc_id AS b_doc,
       |    list_cosine_similarity(a.nv, b.nv) AS s
       |  FROM cand a JOIN cand b ON a.query_id = b.query_id AND a.doc_id <> b.doc_id),
       |sel1 AS (
       |  SELECT query_id, doc_id, rel, 0.7::DOUBLE * rel AS mmr, 1 AS pick
       |  FROM cand
       |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, doc_id) = 1),
       |$rounds
       |SELECT query_id, doc_id, pick, round(rel, 4) AS rel, round(mmr, 4) AS mmr
       |FROM ($allSel)""".stripMargin
  }

  /** The q73/q175 shared WITH chain: near-dup components, quality
    * keep-best, Gopher pass, split buckets, eval-gram contamination. */
  private val CleanCorpusCtes: String =
    DedupCcCte + ",\n" + """m AS (
        |  SELECT d.doc_id, coalesce(c.canonical_id, d.doc_id) AS canonical_id
        |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id),
        |fq AS (
        |  SELECT doc_id,
        |    length(text) AS L,
        |    length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS n_alpha,
        |    length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
        |    len(regexp_extract_all(text, '\S+')) AS n_tokens,
        |    len(regexp_extract_all(lower(text), '\b(the|a|of|and|in|to)\b')) AS n_stop
        |  FROM documents),
        |q AS (
        |  SELECT doc_id, round(least(1.0, greatest(0.0,
        |    0.5 * (n_alpha::DOUBLE / nullif(L, 0)::DOUBLE) +
        |    0.3 * least(1.0, (n_stop::DOUBLE / nullif(n_tokens, 0)::DOUBLE) * 4) +
        |    0.2 * least(1.0, n_tokens::DOUBLE / 64.0) -
        |    (n_digit::DOUBLE / nullif(L, 0)::DOUBLE))), 4) AS quality
        |  FROM fq),
        |kb AS (
        |  SELECT m.doc_id,
        |    row_number() OVER (PARTITION BY m.canonical_id
        |                       ORDER BY q.quality DESC, m.doc_id ASC) = 1 AS keep
        |  FROM m JOIN q ON m.doc_id = q.doc_id),
        |gfr AS (
        |  SELECT doc_id,
        |    regexp_replace(text, '^\s+|\s+$', '', 'g') AS tt,
        |    regexp_extract_all(text, '\S+') AS t,
        |    len(regexp_extract_all(text, '\S+')) AS n_words,
        |    round(length(regexp_replace(text, '\s', '', 'g'))::DOUBLE /
        |          nullif(len(regexp_extract_all(text, '\S+')), 0), 4) AS mean_word_len,
        |    len(regexp_extract_all(lower(text), '\b(the|a|of|and|in|to)\b')) AS n_stopwords
        |  FROM documents),
        |gf AS (
        |  SELECT doc_id,
        |    n_words BETWEEN 50 AND 100000
        |    AND mean_word_len BETWEEN 3.0 AND 10.0
        |    AND n_stopwords >= 2
        |    AND round(1.0 - len(CASE WHEN len(t) >= 2
        |      THEN list_distinct(list_transform(generate_series(1, len(t) - 1),
        |        i -> t[i] || ' ' || t[i+1]))
        |      ELSE [tt] END)::DOUBLE / nullif(len(t) - 1, 0), 4) <= 0.1 AS pass
        |  FROM gfr),
        |sdoc AS (
        |  SELECT doc_id, lang, source,
        |    (ascii(substring(md5(text), 1, 1)) * 256 +
        |     ascii(substring(md5(text), 2, 1))) % 100 AS b,
        |    regexp_replace(text, '^\s+|\s+$', '', 'g') AS tt,
        |    regexp_extract_all(text, '\S+') AS t
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, b, unnest(CASE WHEN len(t) >= 5
        |    THEN list_distinct(list_transform(generate_series(1, len(t) - 4),
        |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]))
        |    ELSE [tt] END) AS g
        |  FROM sdoc),
        |flagged AS (
        |  SELECT DISTINCT tr.doc_id
        |  FROM grams tr JOIN grams ev ON tr.g = ev.g
        |  WHERE tr.b < 90 AND ev.b >= 95)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        | round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        | round(avg(l_quantity), 4) AS avg_qty,
        | round(avg(l_extendedprice), 4) AS avg_price,
        | round(avg(l_discount), 4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q02_group_count" ->
      """SELECT lang, count(*) AS n_docs FROM documents
        |WHERE lang IS NOT NULL AND lang <> '' GROUP BY lang""".stripMargin,

    "q03_filter_project" ->
      "SELECT doc_id, lang, n_chars FROM documents WHERE n_chars > 200 AND lang <> ''",

    "q04_revenue_by_nation" ->
      """SELECT r_name, n_name,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        | count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,

    "q05_top_orders_per_customer" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice, rn::INT AS rn
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |        row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |      FROM orders)
        |WHERE rn <= 3""".stripMargin,

    "q06_customer_cube" ->
      """SELECT c_mktsegment, n_name, count(*) AS n_customers, round(sum(c_acctbal), 2) AS sum_acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY CUBE (c_mktsegment, n_name)""".stripMargin,

    "q07_distinct_counts" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        | count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q08_top_orders" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice, o_orderdate
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q09_hourly_events" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n_events,
        | round(sum(value), 2) AS sum_value, round(avg(value), 4) AS avg_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q10_customers_without_orders" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,

    "q11_json_extract" ->
      """SELECT event_type,
        | sum(try_cast(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS sum_k,
        | count(try_cast(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k,
        | count(*) AS n
        |FROM events GROUP BY event_type""".stripMargin,

    "q12_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, value, floor(epoch(ts))::BIGINT AS ts_s FROM events),
        |g AS (
        |  SELECT *, ts_s - lag(ts_s) OVER (PARTITION BY user_id ORDER BY ts_s, event_id) AS gap_s FROM e),
        |s AS (
        |  SELECT *, sum(CASE WHEN gap_s IS NULL OR gap_s > 1800 THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts_s, event_id ROWS UNBOUNDED PRECEDING)::BIGINT AS session_id
        |  FROM g)
        |SELECT user_id, session_id, count(*) AS n_events, min(ts_s) AS sess_start,
        | max(ts_s) AS sess_end, round(sum(value), 2) AS sum_value
        |FROM s GROUP BY user_id, session_id""".stripMargin,

    // q13/q14: the sketch VALUES are engine-specific, so the gated output is
    // the q50 pattern — exact twins as oracle columns + accuracy-bound
    // booleans expected TRUE (see Relational.approxDistinct/priceQuantiles).
    "q13_approx_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        | count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows,
        | true AS parts_ok, true AS supps_ok
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q14_price_quantiles" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        | round(quantile_cont(o_totalprice, 0.5), 4) AS p50_exact,
        | true AS p50_rank_ok, true AS p90_rank_ok, true AS p99_rank_ok
        |FROM orders GROUP BY o_orderstatus""".stripMargin,

    // custom MRL mergeable sketch (q102): exact p50 anchors the oracle,
    // booleans pin the deterministic worst-case rank bound (q14's pattern)
    "q102_mergeable_quantiles" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        | round(quantile_cont(o_totalprice, 0.5), 4) AS p50_exact,
        | true AS s50_rank_ok, true AS s90_rank_ok, true AS s99_rank_ok
        |FROM orders GROUP BY o_orderstatus""".stripMargin,

    // robust per-stream outliers: exact median/MAD, normal-consistent scale
    "q103_mad_outliers" ->
      """WITH med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med FROM events GROUP BY event_type),
        |mad AS (
        |  SELECT e.event_type, quantile_cont(abs(value - med), 0.5) AS mad
        |  FROM events e JOIN med USING (event_type) GROUP BY e.event_type)
        |SELECT e.event_type, count(*) AS n_events,
        |  round(min(med), 4) AS med, round(min(mad), 4) AS mad,
        |  sum(CASE WHEN abs(value - med) > mad * (3 * 1.4826) THEN 1 ELSE 0 END)::BIGINT AS n_outliers
        |FROM events e JOIN med USING (event_type) JOIN mad USING (event_type)
        |GROUP BY e.event_type""".stripMargin,

    // inverted index: exact df over distinct (term, doc) pairs; postings =
    // first 20 sorted doc_ids serialized to a comma string so the gate
    // edge is scalar (array columns crash the driver's pandas sorter);
    // \S+ tokens (the unified rule)
    "q104_inverted_index" ->
      """WITH td AS (
        |  SELECT DISTINCT unnest(regexp_extract_all(text, '\S+')) AS term, doc_id
        |  FROM documents)
        |SELECT term, count(*)::BIGINT AS df,
        |  array_to_string((list(doc_id ORDER BY doc_id))[1:20], ',') AS postings
        |FROM td GROUP BY term HAVING count(*) >= 10""".stripMargin,

    // argmax per group: revenue rounded BEFORE the argmax in both engines;
    // ties break to the smallest partkey
    "q105_top_part_per_nation" ->
      """WITH pp AS (
        |  SELECT s_nationkey, l_partkey,
        |    round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  GROUP BY s_nationkey, l_partkey),
        |r AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY s_nationkey ORDER BY revenue DESC, l_partkey ASC) AS rn
        |  FROM pp)
        |SELECT n_name AS nation, l_partkey AS p_partkey, revenue
        |FROM r JOIN nation ON s_nationkey = n_nationkey WHERE rn = 1""".stripMargin,

    // TPC-H Q3 shape; revenue-desc/orderkey-asc top 10
    "q106_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate::DATE AS o_orderdate,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-01'
        |  AND l_shipdate > TIMESTAMP '1998-06-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin,

    // TPC-H Q18 shape: HAVING on the rounded total, AQE-broadcast join back
    "q108_big_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
        |  FROM lineitem GROUP BY l_orderkey HAVING round(sum(l_quantity), 2) > 250)
        |SELECT c_name, o_orderkey, o_orderdate::DATE AS o_orderdate,
        |  o_totalprice, total_qty
        |FROM orders JOIN big ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey""".stripMargin,

    // equi-depth histogram: interior deciles as one percentile array;
    // bucket = count of boundaries strictly below the value. Interpolated
    // boundaries are either exactly a data value (frac = 0 — both engines
    // return `lower` exactly) or strictly between two adjacent data values,
    // so the strict < compares identically in both engines.
    "q109_equidepth_histogram" ->
      ("""WITH b AS (
        |  SELECT quantile_cont(o_totalprice,
        |    [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS bs FROM orders)
        |SELECT (""".stripMargin +
        (1 to 9).map(i => s"(CASE WHEN bs[$i] < o_totalprice THEN 1 ELSE 0 END)")
          .mkString(" + ") +
        """) AS bucket,
        |  count(*) AS n_orders,
        |  round(min(o_totalprice), 2) AS lo, round(max(o_totalprice), 2) AS hi
        |FROM orders CROSS JOIN b GROUP BY bucket""".stripMargin),

    // order-insensitive content checksums: 12 hex digits of the row digest
    // as an integer, summed exactly (HUGEINT / decimal(38,0)); the sum
    // exceeds 2^53 so it is emitted as a STRING on both edges — float64
    // cannot represent it exactly and the driver's hash is dtype-sensitive
    "q110_table_checksums" ->
      """WITH d AS (
        |  SELECT ('0x' || substring(md5(concat_ws('|', doc_id, text, lang, source)), 1, 12))::BIGINT AS h
        |  FROM documents),
        |o AS (
        |  SELECT ('0x' || substring(md5(concat_ws('|', o_orderkey, o_custkey, o_totalprice)), 1, 12))::BIGINT AS h
        |  FROM orders),
        |l AS (
        |  SELECT ('0x' || substring(md5(concat_ws('|', l_orderkey, l_linenumber, l_quantity, l_extendedprice)), 1, 12))::BIGINT AS h
        |  FROM lineitem)
        |SELECT 'documents' AS table_name, count(*) AS n_rows, sum(h)::VARCHAR AS checksum FROM d
        |UNION ALL
        |SELECT 'orders' AS table_name, count(*) AS n_rows, sum(h)::VARCHAR AS checksum FROM o
        |UNION ALL
        |SELECT 'lineitem' AS table_name, count(*) AS n_rows, sum(h)::VARCHAR AS checksum FROM l""".stripMargin,

    // skew profiler: H = ln(N) − (Σ c·ln c)/N; ln-parity at 4 dp
    "q111_key_skew_profile" ->
      """WITH counts AS (
        |  SELECT user_id, count(*) AS c FROM events GROUP BY user_id),
        |top10 AS (
        |  SELECT sum(c) AS top10_mass FROM (
        |    SELECT c FROM counts ORDER BY c DESC, user_id ASC LIMIT 10)),
        |agg AS (
        |  SELECT sum(c) AS n_rows, count(*) AS n_keys, max(c) AS max_freq,
        |    sum(c::DOUBLE * ln(c::DOUBLE)) AS clogc
        |  FROM counts)
        |SELECT n_rows::BIGINT AS n_rows, n_keys, max_freq,
        |  round(top10_mass::DOUBLE / n_rows, 4) AS top10_share,
        |  round(ln(n_rows::DOUBLE) - clogc / n_rows, 4) AS entropy
        |FROM agg CROSS JOIN top10""".stripMargin,

    // degree distribution: double aggregate
    "q112_order_count_distribution" ->
      """SELECT n_orders, count(*) AS n_customers FROM (
        |  SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey)
        |GROUP BY n_orders""".stripMargin,

    // snapshot diff: planted v2 (every 7th edited, 13th dropped, bucket<2
    // appended with +1e6 ids); presence tested on the key, change on md5
    "q113_snapshot_diff" ->
      """WITH v1 AS (SELECT doc_id, text FROM documents),
        |v2 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
        |  FROM v1 WHERE doc_id % 13 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM v1
        |  WHERE (ascii(substring(md5(text), 1, 1)) * 256 + ascii(substring(md5(text), 2, 1))) % 100 < 2),
        |d AS (
        |  SELECT CASE WHEN a.doc_id IS NULL THEN 'added'
        |              WHEN b.doc_id IS NULL THEN 'removed'
        |              WHEN md5(a.text) <> md5(b.text) THEN 'changed'
        |              ELSE 'unchanged' END AS status
        |  FROM v1 a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id)
        |SELECT status, count(*) AS n_docs FROM d GROUP BY status""".stripMargin,

    // rolling 7-day distinct actives: bounded fan-out (each user-day emits
    // <= 7 future days), clipped at the log's last day
    "q114_rolling_active_users" ->
      """WITH ud AS (SELECT DISTINCT user_id, ts::DATE AS day FROM events),
        |mx AS (SELECT max(day) AS max_day FROM ud),
        |expanded AS (
        |  SELECT DISTINCT user_id,
        |    unnest(generate_series(day::TIMESTAMP,
        |      least(day + 6, max_day)::TIMESTAMP, INTERVAL 1 DAY))::DATE AS day
        |  FROM ud CROSS JOIN mx)
        |SELECT day, count(*) AS active_7d FROM expanded GROUP BY day""".stripMargin,

    // referential-integrity audit: one anti-join per FK edge, keys only
    "q115_ri_audit" ->
      """SELECT 'lineitem.l_orderkey->orders' AS fk_edge,
        |  (SELECT count(*) FROM (SELECT DISTINCT l_orderkey AS k FROM lineitem) f
        |   WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = f.k)) AS n_orphan_keys
        |UNION ALL
        |SELECT 'orders.o_custkey->customer',
        |  (SELECT count(*) FROM (SELECT DISTINCT o_custkey AS k FROM orders) f
        |   WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = f.k))
        |UNION ALL
        |SELECT 'lineitem.l_partkey->part',
        |  (SELECT count(*) FROM (SELECT DISTINCT l_partkey AS k FROM lineitem) f
        |   WHERE NOT EXISTS (SELECT 1 FROM part WHERE p_partkey = f.k))
        |UNION ALL
        |SELECT 'lineitem.l_suppkey->supplier',
        |  (SELECT count(*) FROM (SELECT DISTINCT l_suppkey AS k FROM lineitem) f
        |   WHERE NOT EXISTS (SELECT 1 FROM supplier WHERE s_suppkey = f.k))
        |UNION ALL
        |SELECT 'customer.c_nationkey->nation',
        |  (SELECT count(*) FROM (SELECT DISTINCT c_nationkey AS k FROM customer) f
        |   WHERE NOT EXISTS (SELECT 1 FROM nation WHERE n_nationkey = f.k))""".stripMargin,

    // top session paths: q12's session CTE + two LEADs; null-propagating
    // concat drops tail rows; ties break on path
    "q116_top_session_paths" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, floor(epoch(ts))::BIGINT AS ts_s FROM events),
        |g AS (
        |  SELECT *, ts_s - lag(ts_s) OVER (PARTITION BY user_id ORDER BY ts_s, event_id) AS gap_s FROM e),
        |s AS (
        |  SELECT *, sum(CASE WHEN gap_s IS NULL OR gap_s > 1800 THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts_s, event_id ROWS UNBOUNDED PRECEDING)::BIGINT AS session_id
        |  FROM g),
        |p AS (
        |  SELECT event_type || '>' ||
        |    lead(event_type, 1) OVER w || '>' ||
        |    lead(event_type, 2) OVER w AS path
        |  FROM s WINDOW w AS (PARTITION BY user_id, session_id ORDER BY ts_s, event_id))
        |SELECT path, count(*) AS n FROM p WHERE path IS NOT NULL
        |GROUP BY path ORDER BY n DESC, path ASC LIMIT 10""".stripMargin,

    // conversion latency over q99's session stage anchors
    "q117_time_to_convert" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, floor(epoch(ts))::BIGINT AS ts_s FROM events),
        |g AS (
        |  SELECT *, ts_s - lag(ts_s) OVER (PARTITION BY user_id ORDER BY ts_s, event_id) AS gap_s FROM e),
        |s AS (
        |  SELECT *, sum(CASE WHEN gap_s IS NULL OR gap_s > 1800 THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts_s, event_id ROWS UNBOUNDED PRECEDING)::BIGINT AS session_id
        |  FROM g),
        |w1 AS (
        |  SELECT *, min(CASE WHEN event_type = 'view' THEN ts_s END)
        |    OVER (PARTITION BY user_id, session_id) AS v_ts FROM s),
        |w2 AS (
        |  SELECT *, min(CASE WHEN event_type = 'click' AND ts_s >= v_ts THEN ts_s END)
        |    OVER (PARTITION BY user_id, session_id) AS c_ts FROM w1),
        |w3 AS (
        |  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts_s >= c_ts THEN ts_s END)
        |    OVER (PARTITION BY user_id, session_id) AS p_ts FROM w2),
        |sess AS (
        |  SELECT user_id, session_id, max(v_ts) AS v_ts, max(c_ts) AS c_ts, max(p_ts) AS p_ts
        |  FROM w3 GROUP BY user_id, session_id)
        |SELECT count(*) AS n_converting,
        |  round(avg(p_ts - v_ts), 4) AS mean_v2p_s,
        |  round(quantile_cont(p_ts - v_ts, 0.5), 4) AS p50_v2p_s,
        |  round(quantile_cont(p_ts - v_ts, 0.9), 4) AS p90_v2p_s,
        |  round(quantile_cont(p_ts - c_ts, 0.5), 4) AS p50_c2p_s
        |FROM sess WHERE p_ts IS NOT NULL""".stripMargin,

    // growth accounting: ISO-Monday weeks (q93's rule)
    "q107_new_vs_returning" ->
      """WITH e AS (
        |  SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events),
        |fw AS (
        |  SELECT user_id, min(week) AS first_week FROM e GROUP BY user_id)
        |SELECT week::DATE AS week, count(*) AS active_users,
        |  sum(CASE WHEN week = first_week THEN 1 ELSE 0 END)::BIGINT AS new_users,
        |  (count(*) - sum(CASE WHEN week = first_week THEN 1 ELSE 0 END))::BIGINT AS returning_users
        |FROM e JOIN fw USING (user_id)
        |GROUP BY week""".stripMargin,

    "q42_session_window" ->
      """WITH e AS (
        |  SELECT user_id, event_id, value, floor(epoch(ts))::BIGINT AS ts_s FROM events),
        |g AS (
        |  SELECT *, ts_s - lag(ts_s) OVER (PARTITION BY user_id ORDER BY ts_s, event_id) AS gap_s FROM e),
        |s AS (
        |  -- session_window is half-open: a gap of EXACTLY the duration
        |  -- starts a new session (>=), unlike q12's strict > convention
        |  SELECT *, sum(CASE WHEN gap_s IS NULL OR gap_s >= 1800 THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts_s, event_id ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM g)
        |SELECT user_id, min(ts_s) AS sess_start, count(*) AS n_events,
        | round(sum(value), 2) AS sum_value
        |FROM s GROUP BY user_id, session_id""".stripMargin,

    "q33_asof_attribution" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, value, epoch_us(ts) AS us FROM events),
        |p AS (
        |  SELECT event_id, user_id, us, round(value, 2) AS purchase_value
        |  FROM e WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT event_id AS click_id, user_id, us AS click_us
        |  FROM e WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id, p.us AS purchase_us, p.purchase_value,
        |       c.click_id, c.click_us
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.us >= c.click_us""".stripMargin,

    "q34_orders_rollup" ->
      """SELECT year(o_orderdate)::BIGINT AS yr, o_orderstatus,
        | count(*) AS n_orders, round(sum(o_totalprice), 2) AS sum_price
        |FROM orders GROUP BY ROLLUP (yr, o_orderstatus)""".stripMargin,

    "q35_orders_pivot" ->
      """SELECT year(o_orderdate)::BIGINT AS yr,
        | sum(CASE WHEN o_orderstatus = 'O' THEN 1 END)::BIGINT AS "O",
        | sum(CASE WHEN o_orderstatus = 'F' THEN 1 END)::BIGINT AS "F",
        | sum(CASE WHEN o_orderstatus = 'P' THEN 1 END)::BIGINT AS "P"
        |FROM orders GROUP BY 1""".stripMargin,

    "q36_customer_setops" ->
      """SELECT o_custkey, 'only_open' AS setop FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |  EXCEPT
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        |UNION ALL
        |SELECT o_custkey, 'both' AS setop FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')""".stripMargin,

    "q15_listing_normalize" ->
      s"""WITH $listingNormCte
         |SELECT * FROM norm""".stripMargin,

    "q16_district_count" ->
      s"""WITH $listingNormCte
         |SELECT quan_huyen, count(*) AS so_luong FROM norm
         |WHERE quan_huyen IS NOT NULL AND quan_huyen <> '' GROUP BY quan_huyen""".stripMargin,

    "q17_district_price_stats" ->
      s"""WITH $listingNormCte
         |SELECT quan_huyen, count(*) AS n_priced,
         | round(avg(price_billion_vnd), 4) AS avg_price,
         | round(min(price_billion_vnd), 4) AS min_price,
         | round(max(price_billion_vnd), 4) AS max_price,
         | round(avg(price_billion_vnd * 1000.0 / nullif(area, 0.0)), 4) AS avg_price_million_per_m2
         |FROM norm WHERE quan_huyen IS NOT NULL AND price_status = 'ok'
         |GROUP BY quan_huyen""".stripMargin,

    "q18_district_topk" ->
      s"""WITH $listingNormCte
         |SELECT quan_huyen, id, price_billion_vnd, rk::INT AS rk
         |FROM (SELECT quan_huyen, id, price_billion_vnd,
         |        row_number() OVER (PARTITION BY quan_huyen ORDER BY price_billion_vnd DESC, id) AS rk
         |      FROM norm WHERE quan_huyen IS NOT NULL AND price_status = 'ok')
         |WHERE rk <= 3""".stripMargin,

    "q20_exact_dedup" ->
      """SELECT md5(text) AS text_md5, min(doc_id) AS canonical_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text)""".stripMargin,

    "q21_token_stats" ->
      """SELECT doc_id,
        | len(regexp_extract_all(text, '\S+'))::BIGINT AS n_ws_tokens,
        | len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]'))::BIGINT AS n_bpe_tokens,
        | length(text)::BIGINT AS n_chars
        |FROM documents""".stripMargin,

    "q22_quality_score" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    length(text) AS L,
        |    length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS n_alpha,
        |    length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
        |    length(text) - length(regexp_replace(text, '\s', '', 'g')) AS n_space,
        |    len(regexp_extract_all(text, '\S+')) AS n_tokens,
        |    len(regexp_extract_all(lower(text), '\b(the|a|of|and|in|to)\b')) AS n_stop
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, n_tokens,
        |    n_alpha::DOUBLE / nullif(L, 0)::DOUBLE AS alpha_ratio,
        |    n_digit::DOUBLE / nullif(L, 0)::DOUBLE AS digit_ratio,
        |    n_stop::DOUBLE / nullif(n_tokens, 0)::DOUBLE AS stop_ratio,
        |    (L - n_space)::DOUBLE / nullif(n_tokens, 0)::DOUBLE AS mean_tok_len
        |  FROM f)
        |SELECT doc_id, n_tokens::BIGINT AS n_tokens,
        | round(alpha_ratio, 4) AS alpha_ratio,
        | round(digit_ratio, 4) AS digit_ratio,
        | round(stop_ratio, 4) AS stop_ratio,
        | round(mean_tok_len, 4) AS mean_tok_len,
        | round(least(1.0, greatest(0.0,
        |   0.5 * alpha_ratio + 0.3 * least(1.0, stop_ratio * 4) +
        |   0.2 * least(1.0, n_tokens::DOUBLE / 64.0) - digit_ratio)), 4) AS quality
        |FROM r""".stripMargin,

    "q23_lang_id" ->
      """WITH f AS (
        |  SELECT doc_id, lang,
        |    len(regexp_extract_all(lower(text), '\b(the|and|of|a|in|to|is)\b'))::BIGINT AS s_en,
        |    len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|nicht)\b'))::BIGINT AS s_de,
        |    len(regexp_extract_all(lower(text), '\b(el|la|los|las|es|y|que)\b'))::BIGINT AS s_es,
        |    len(regexp_extract_all(lower(text), '\b(le|les|des|et|est|que)\b'))::BIGINT AS s_fr,
        |    len(regexp_extract_all(lower(text), '\b(de|shi|le|zhe|ge|wo)\b'))::BIGINT AS s_zh
        |  FROM documents)
        |SELECT doc_id, s_en, s_de, s_es, s_fr, s_zh,
        | CASE WHEN greatest(s_en, s_de, s_es, s_fr, s_zh) = 0 THEN 'und'
        |      WHEN s_en = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'en'
        |      WHEN s_de = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'de'
        |      WHEN s_es = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'es'
        |      WHEN s_fr = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'fr'
        |      ELSE 'zh' END AS predicted_lang,
        | lang
        |FROM f""".stripMargin,

    "q24_fingerprint" ->
      s"""WITH $shingleCte
         |SELECT d.doc_id, md5(d.text) AS fp_md5,
         |  list_aggregate(list_transform(sh.s, x -> md5(x)), 'min') AS fp_min_shingle,
         |  len(sh.s)::BIGINT AS n_shingles
         |FROM documents d JOIN sh ON d.doc_id = sh.doc_id""".stripMargin,

    "q25_jaccard_neardup" ->
      ("WITH\n" + ShingleCtes + ",\n" + JaccardPairCtes + "\n" +
       "SELECT a AS doc_a, b AS doc_b, jaccard FROM ej"),

    "q37_dedup_corpus" ->
      (DedupCcCte +
      """
        |SELECT d.doc_id,
        |  coalesce(c.canonical_id, d.doc_id) AS canonical_id,
        |  coalesce(c.canonical_id, d.doc_id) = d.doc_id AS is_canonical
        |FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id""".stripMargin),

    // composed pipeline summary (gated with the shared pair-graph cache ON
    // Spark-side); the oracle recomputes pair graph + components directly
    "q142_dedup_pipeline" ->
      (DedupCcCte +
      """,
        |cm AS (
        |  SELECT d.doc_id, coalesce(c.canonical_id, d.doc_id) AS canonical_id
        |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id),
        |sz AS (SELECT canonical_id, count(*) AS sz FROM cm GROUP BY 1)
        |SELECT (SELECT count(*) FROM documents)::BIGINT AS n_docs,
        |  (SELECT count(*) FROM e)::BIGINT AS n_dup_pairs,
        |  (SELECT count(*) FROM sz)::BIGINT AS n_clusters,
        |  ((SELECT count(*) FROM documents) - (SELECT count(*) FROM sz))::BIGINT AS n_removed,
        |  (SELECT max(sz) FROM sz)::BIGINT AS max_cluster_size""".stripMargin),

    // unigram surprisal: floor-log2 via binary-string length — pure
    // integer/string ops, so the per-token bits and the per-doc integer
    // mean are engine-identical (no FP log anywhere)
    "q169_surprisal_score" ->
      """WITH t AS (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS w
        |  FROM documents),
        |f AS (SELECT w, count(*)::BIGINT AS c FROM t GROUP BY w),
        |n AS (SELECT sum(c)::BIGINT AS n_total FROM f)
        |SELECT doc_id, count(*)::BIGINT AS n_tokens,
        |  (sum((length(bin(n_total // c)) - 1) * 1000000) // count(*))::BIGINT AS surprisal_micro
        |FROM t JOIN f USING (w) CROSS JOIN n
        |GROUP BY doc_id""".stripMargin,

    // bigram conditional surprisal: same integer floor-log2 as q169 over
    // the ML conditional c(w1w2)/c1plus(w1) — bigram starts as the
    // denominator keep the ratio >= 1 on both engines
    "q172_bigram_surprisal" ->
      """WITH d AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS ws
        |  FROM documents WHERE len(regexp_extract_all(lower(text), '\S+')) >= 2),
        |bi AS (
        |  SELECT doc_id, t[1] AS w1, t[2] AS w2
        |  FROM d, LATERAL (SELECT unnest(list_zip(
        |    ws[1:len(ws) - 1], ws[2:len(ws)]))) AS u(t)),
        |c12 AS (SELECT w1, w2, count(*)::BIGINT AS c12 FROM bi GROUP BY 1, 2),
        |c1 AS (SELECT w1, count(*)::BIGINT AS c1 FROM bi GROUP BY 1)
        |SELECT doc_id, count(*)::BIGINT AS n_bigrams,
        |  (sum((length(bin(c1 // c12)) - 1) * 1000000) // count(*))::BIGINT AS bigram_surprisal_micro
        |FROM bi JOIN c12 USING (w1, w2) JOIN c1 USING (w1)
        |GROUP BY doc_id""".stripMargin,

    // semantic contamination: the planted x2-scaled leak of every eval
    // vector is the ONLY pair >= tau on the isotropic corpus (q30/q148
    // harness), so the audit output is exactly the planted set
    "q174_semantic_contamination" ->
      """SELECT vec_id AS eval_id, vec_id + 1000000 AS train_id,
        |  1.0::DOUBLE AS cos_sim
        |FROM embeddings WHERE vec_id < 50""".stripMargin,

    // DSIR importance score: raw and Laplace-smoothed target unigram
    // surprisals, their per-token difference, integer-micro doc mean —
    // the target rule is q163's label rule stated identically
    "q173_dsir_score" ->
      """WITH base AS (
        |  SELECT doc_id, text, regexp_extract_all(lower(text), '\S+') AS ws
        |  FROM documents),
        |b2 AS (
        |  SELECT doc_id, ws,
        |    ((length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g'))) * 1000000
        |       // greatest(length(text), 1)) >= 550000
        |    AND len(ws) >= 5
        |    AND len(regexp_extract_all(lower(text), '\b(the|a|of|and|in|to)\b')) >= 1 AS tgt
        |  FROM base),
        |t AS (SELECT doc_id, tgt, unnest(ws) AS w FROM b2),
        |f AS (
        |  SELECT w, count(*)::BIGINT AS cr,
        |    sum(CASE WHEN tgt THEN 1 ELSE 0 END)::BIGINT AS ct
        |  FROM t GROUP BY w),
        |n AS (SELECT sum(cr)::BIGINT AS nr, sum(ct)::BIGINT AS nt,
        |  count(*)::BIGINT AS v FROM f)
        |SELECT doc_id, count(*)::BIGINT AS n_tokens,
        |  (sum(((length(bin(nr // cr)) - 1) - (length(bin((nt + v) // (ct + 1))) - 1)) * 1000000)
        |    // count(*))::BIGINT AS dsir_micro
        |FROM t JOIN f USING (w) CROSS JOIN n
        |GROUP BY doc_id""".stripMargin,

    // dedup soft weights: q37's transitive closure + cluster sizes; the
    // integer micro weight divides identically on both engines
    "q170_dedup_weights" ->
      (DedupCcCte +
      """,
        |cm AS (
        |  SELECT d.doc_id, coalesce(c.canonical_id, d.doc_id) AS canonical_id
        |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id),
        |sz AS (SELECT canonical_id, count(*)::BIGINT AS cluster_size FROM cm GROUP BY 1)
        |SELECT cm.doc_id, cm.canonical_id, sz.cluster_size,
        |  (1000000 // sz.cluster_size)::BIGINT AS weight_micro
        |FROM cm JOIN sz USING (canonical_id)""".stripMargin),

    "q38_train_split" ->
      """SELECT doc_id,
        | (ascii(substring(md5(text), 1, 1)) * 256 + ascii(substring(md5(text), 2, 1))) % 100 AS bucket,
        | CASE WHEN (ascii(substring(md5(text), 1, 1)) * 256 + ascii(substring(md5(text), 2, 1))) % 100 < 90 THEN 'train'
        |      WHEN (ascii(substring(md5(text), 1, 1)) * 256 + ascii(substring(md5(text), 2, 1))) % 100 < 95 THEN 'val'
        |      ELSE 'test' END AS split
        |FROM documents""".stripMargin,

    "q39_split_counts" ->
      """SELECT CASE WHEN (ascii(substring(md5(text), 1, 1)) * 256 + ascii(substring(md5(text), 2, 1))) % 100 < 90 THEN 'train'
        |            WHEN (ascii(substring(md5(text), 1, 1)) * 256 + ascii(substring(md5(text), 2, 1))) % 100 < 95 THEN 'val'
        |            ELSE 'test' END AS split,
        |       lang, count(*) AS n_docs
        |FROM documents GROUP BY 1, 2""".stripMargin,

    "q28_cosine_topk" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 10),
        |c AS (
        |  SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS nv FROM embeddings),
        |s AS (
        |  SELECT query_id, neighbor_id, list_cosine_similarity(qv, nv) AS sim
        |  FROM q CROSS JOIN c WHERE query_id <> neighbor_id),
        |r AS (
        |  SELECT query_id, neighbor_id, sim,
        |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn
        |  FROM s)
        |SELECT query_id, neighbor_id, round(sim, 4) AS cos_sim, rn::INT AS rn
        |FROM r WHERE rn <= 5""".stripMargin,

    "q31_media_meta" ->
      """SELECT doc_id,
        | octet_length(text::BLOB)::INT AS n_bytes,
        | (octet_length(text::BLOB) % 640 + 32)::INT AS width,
        | ((octet_length(text::BLOB) * 7) % 480 + 32)::INT AS height,
        | ['jpg', 'png', 'webp'][(doc_id % 3 + 1)::INT] AS fmt,
        | (doc_id % 16 + 1)::INT AS n_frames
        |FROM documents""".stripMargin,

    "q40_frame_sample" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    octet_length(text::BLOB)::INT AS n_bytes,
        |    ['jpg', 'png', 'webp'][(doc_id % 3 + 1)::INT] AS fmt,
        |    (doc_id % 16 + 1)::INT AS n_frames
        |  FROM documents)
        |SELECT doc_id, unnest(range(0, n_frames))::INT AS frame_id, fmt,
        |  unnest(range(0, n_frames)) * 40 AS frame_ms,
        |  ((n_bytes * (unnest(range(0, n_frames)) + 1)) % 256)::INT AS mean_luma
        |FROM m""".stripMargin,

    "q41_thumbnail_dims" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    (octet_length(text::BLOB) % 640 + 32)::INT AS width,
        |    ((octet_length(text::BLOB) * 7) % 480 + 32)::INT AS height
        |  FROM documents)
        |SELECT doc_id, width, height,
        |  CASE WHEN width >= height THEN 256
        |       ELSE (width::BIGINT * 256 // height::BIGINT)::INT END AS thumb_w,
        |  CASE WHEN width >= height THEN (height::BIGINT * 256 // width::BIGINT)::INT
        |       ELSE 256 END AS thumb_h
        |FROM m""".stripMargin,

    "q43_salted_skew_join" ->
      """WITH d AS (
        |  SELECT l_returnflag, avg(l_extendedprice) AS avg_price
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l.l_returnflag, count(*) AS n_items,
        |  sum(CASE WHEN l.l_extendedprice > d.avg_price THEN 1 ELSE 0 END)::BIGINT AS n_above_avg
        |FROM lineitem l JOIN d USING (l_returnflag)
        |GROUP BY l.l_returnflag""".stripMargin,

    "q44_bucketed_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        | round(sum(o_totalprice), 2) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,

    "q45_partition_pruning" ->
      """SELECT year(o_orderdate)::INT AS o_year, month(o_orderdate)::INT AS mo,
        | count(*) AS n_orders, round(sum(o_totalprice), 2) AS sum_price
        |FROM orders WHERE year(o_orderdate) = 1995
        |GROUP BY 1, 2""".stripMargin,

    "q46_content_sample" ->
      """SELECT doc_id,
        | (ascii(substring(md5(text), 1, 1)) * 256 + ascii(substring(md5(text), 2, 1))) % 100 AS bucket
        |FROM documents
        |WHERE (ascii(substring(md5(text), 1, 1)) * 256 + ascii(substring(md5(text), 2, 1))) % 100 < 10""".stripMargin,

    "q47_compaction" ->
      """SELECT doc_id,
        | CASE WHEN doc_id % 2 = 0 THEN '2025-04-24' ELSE '2025-04-23' END AS ingest_date,
        | length(text) AS n_chars
        |FROM documents""".stripMargin,

    "q48_minhash_recall" ->
      ("WITH\n" + ShingleCtes + ",\n" + JaccardPairCtes + "\n" +
       "SELECT count(*) AS n_exact_pairs, true AS recall_ok FROM ej"),

    "q49_lsh_planted_recall" ->
      """SELECT count(*) AS n_queries, true AS planted_ok
        |FROM embeddings WHERE vec_id < 10""".stripMargin,

    // gate forms of the formerly rows-only operators: the oracle states the
    // planted-copy outcome exactly (rank 1 / sim 1.0 / Hamming 0 per plant)
    // — deterministic by construction, so every row is value-checked
    "q29_lsh_topk" -> PlantedTopKOracle,
    "q220_rp_topk" -> PlantedTopKOracle,
    // graph ANN: NN-Descent k-NN graph + beam search — deterministic
    // end-to-end (id-anchored init/entries/tie-breaks), so the planted
    // contract is the same closed form as the other ANN tiers
    "q224_graph_ann" -> PlantedTopKOracle,
    // persisted graph index: same closed-form planted contract, served
    // from the bucketed tables instead of the in-memory path
    "q225_graph_index" -> PlantedTopKOracle,
    // graph-index incremental extend: plants arrive AFTER the build and
    // must be reachable through the appended reverse edges
    "q226_graph_index_extend" -> PlantedTopKOracle,
    // graph-index fsck after the full lifecycle (build + extend plants +
    // delete plants + purge): the corpus count survives exactly, every
    // invariant reads zero — the whole row is closed-form
    // incremental cluster map ≡ from-scratch closure: the oracle replays
    // q37's exact-Jaccard pair graph + min-label CC over the RETAINED
    // corpus (the gate's bucket-<50 slice — build ∪ both extends — minus
    // the deleted doc_id ≡ 7 mod 10) — the incrementally maintained table
    // (versioned base ⊕ label map ⊕ split repair) must hash-match it
    "q228_cluster_index" ->
      ("WITH docs_r AS (SELECT doc_id, text FROM documents\n" +
        "  WHERE (ascii(substring(md5(text), 1, 1)) * 256 + ascii(substring(md5(text), 2, 1))) % 100 < 50\n" +
        "    AND doc_id % 10 <> 7),\n" +
        shingleCtesFrom("docs_r") + ",\n" + JaccardPairCtes + ",\n" +
        "e AS (SELECT a, b FROM ej),\n" + minLabelCcCtes() +
        """
          |SELECT d.doc_id,
          |  coalesce(c.canonical_id, d.doc_id) AS canonical_id,
          |  coalesce(c.canonical_id, d.doc_id) = d.doc_id AS is_canonical
          |FROM docs_r d LEFT JOIN comp c ON d.doc_id = c.doc_id""".stripMargin),

    // cluster-surface fsck over a clean lifecycle: n_docs is the retained
    // slice stated from the bucket + id formulas; every invariant reads
    // zero closed-form (the corruption-detection half is spec-pinned)
    "q229_cluster_audit" ->
      """SELECT count(*)::BIGINT AS n_docs, 0::BIGINT AS missing_shingles,
        |  0::BIGINT AS missing_prefixes, 0::BIGINT AS unassigned_docs,
        |  0::BIGINT AS open_canonicals, 0::BIGINT AS dangling_map
        |FROM documents
        |WHERE (ascii(substring(md5(text), 1, 1)) * 256 + ascii(substring(md5(text), 2, 1))) % 100 < 20
        |  AND doc_id % 7 <> 2""".stripMargin,

    // degree columns gate as restored-booleans: every extend edge touches
    // a purged plant, so the post-compact degree profile (max + exact p99)
    // must equal the pre-extend baseline exactly — provably true, hence
    // closed-form (the production audit carries the raw numbers)
    "q227_graph_index_audit" ->
      """SELECT count(*)::BIGINT AS n_vectors, 0::BIGINT AS orphan_endpoints,
        |  0::BIGINT AS asym_edges, 0::BIGINT AS dup_edges,
        |  0::BIGINT AS missing_reps,
        |  true AS degree_restored, true AS p99_restored
        |FROM embeddings WHERE vec_id < 500""".stripMargin,
    "q51_ivf_topk" -> PlantedTopKOracle,
    "q74_pq_topk" -> PlantedTopKOracle,
    "q85_sq_topk" -> PlantedTopKOracle,
    "q87_ivfpq_topk" -> PlantedTopKOracle,
    "q97_ivfsq_topk" -> PlantedTopKOracle,

    // exact near-dup pair set (q25's statement) + per-pair LSH recall flag
    "q26_minhash_lsh" ->
      ("WITH\n" + ShingleCtes + ",\n" + JaccardPairCtes + "\n" +
       "SELECT a AS doc_a, b AS doc_b, jaccard, true AS lsh_found FROM ej"),

    // planted exact copies of the deterministic 10% content sample:
    // identical text -> identical fingerprint -> Hamming 0, every plant found
    "q27_simhash_neardup" -> SimhashPlantedOracle,
    "q63_simhash128_neardup" -> SimhashPlantedOracle,

    // per-label centroid geometry from exact decimal sums of 6-dp-quantized
    // components; dim-ordered list reductions mirror the Spark HOF order
    "q143_embedding_drift" ->
      """WITH u AS (
        |  SELECT label, generate_subscripts(embedding, 1) AS dim,
        |    round(unnest(embedding)::DOUBLE, 6) AS xq
        |  FROM embeddings),
        |pd AS (
        |  SELECT label, dim, sum(xq::DECIMAL(28,12))::DOUBLE / count(*) AS m, count(*) AS n
        |  FROM u GROUP BY 1, 2),
        |lv AS (
        |  SELECT label, max(n)::BIGINT AS n_vecs, list(m ORDER BY dim) AS mv
        |  FROM pd GROUP BY label),
        |gd AS (
        |  SELECT dim, sum(xq::DECIMAL(28,12))::DOUBLE / count(*) AS g FROM u GROUP BY 1),
        |gv AS (SELECT list(g ORDER BY dim) AS gv FROM gd)
        |SELECT label, n_vecs,
        |  round(sqrt(list_aggregate(list_transform(mv, x -> x * x), 'sum')), 4) AS centroid_norm,
        |  round(list_cosine_similarity(mv, gv), 4) AS cos_to_global
        |FROM lv CROSS JOIN gv""".stripMargin,

    // independent recomputation of argmax-cosine cell assignment (ties to
    // the smallest cid) — pins the nearest_centroid kernel vector by vector
    "q144_ivf_cell_stats" ->
      """WITH c AS (
        |  SELECT vec_id AS cid, embedding::DOUBLE[] AS cv FROM embeddings
        |  ORDER BY vec_id LIMIT 16),
        |s AS (
        |  SELECT e.vec_id, c.cid, list_cosine_similarity(e.embedding::DOUBLE[], c.cv) AS sim
        |  FROM embeddings e CROSS JOIN c),
        |r AS (
        |  SELECT vec_id, cid,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid ASC) AS rn
        |  FROM s)
        |SELECT cid, count(*)::BIGINT AS n_vectors FROM r WHERE rn = 1 GROUP BY cid""".stripMargin,

    // q69's gram machinery + eval-side totals; the one division happens at
    // the edge in double with identical operands, rounded 4 dp
    "q145_containment" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    (ascii(substring(md5(text), 1, 1)) * 256 +
        |     ascii(substring(md5(text), 2, 1))) % 100 AS b,
        |    regexp_replace(text, '^\s+|\s+$', '', 'g') AS tt,
        |    regexp_extract_all(text, '\S+') AS t
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, b, unnest(CASE WHEN len(t) >= 5
        |    THEN list_distinct(list_transform(generate_series(1, len(t) - 4),
        |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]))
        |    ELSE [tt] END) AS g
        |  FROM s),
        |ev AS (SELECT doc_id AS eval_id, g FROM grams WHERE b >= 95),
        |evn AS (SELECT eval_id, count(*) AS n_eval FROM ev GROUP BY 1),
        |tr AS (SELECT doc_id AS train_id, g FROM grams WHERE b < 90),
        |j AS (SELECT train_id, eval_id, count(*)::BIGINT AS n_shared
        |      FROM tr JOIN ev USING (g) GROUP BY 1, 2)
        |SELECT train_id, eval_id, n_shared,
        |  round(n_shared::DOUBLE / n_eval, 4) AS containment
        |FROM j JOIN evn USING (eval_id)""".stripMargin,

    // the identical Morton term sum, stated digit by digit — integer bit
    // arithmetic end-to-end so the file assignment is engine-exact
    "q146_zorder_skipping" -> {
      val zTerms = (0 until 16).map(i =>
        s"((((xq & 65535) >> $i) & 1) << ${2 * i}) + " +
          s"((((yq & 65535) >> $i) & 1) << ${2 * i + 1})").mkString(" + ")
      s"""WITH o AS (
         |  SELECT o_custkey AS ck,
         |    date_diff('day', DATE '1995-01-01', o_orderdate::DATE)::BIGINT AS dy
         |  FROM orders),
         |bd AS (SELECT min(ck) AS cklo, max(ck) AS ckhi, min(dy) AS dlo, max(dy) AS dhi FROM o),
         |nq AS (
         |  SELECT ck,
         |    ((ck - cklo) * 65535) // greatest(ckhi - cklo, 1) AS xq,
         |    ((dy - dlo) * 65535) // greatest(dhi - dlo, 1) AS yq,
         |    (dy - dlo) // ((dhi - dlo) // 64 + 1) AS f_lin
         |  FROM o CROSS JOIN bd),
         |f AS (SELECT ck, f_lin, ($zTerms) >> 26 AS f_z FROM nq),
         |sz AS (
         |  SELECT f_z AS file, min(ck) AS ck_min, max(ck) AS ck_max, count(*) AS n,
         |    sum(CASE WHEN ck BETWEEN 100 AND 199 THEN 1 ELSE 0 END) AS nm
         |  FROM f GROUP BY 1),
         |sl AS (
         |  SELECT f_lin AS file, min(ck) AS ck_min, max(ck) AS ck_max, count(*) AS n,
         |    sum(CASE WHEN ck BETWEEN 100 AND 199 THEN 1 ELSE 0 END) AS nm
         |  FROM f GROUP BY 1)
         |SELECT 'zorder' AS layout, count(*)::BIGINT AS n_files,
         |  sum(CASE WHEN ck_min <= 199 AND ck_max >= 100 THEN 1 ELSE 0 END)::BIGINT AS files_scanned,
         |  sum(CASE WHEN ck_min <= 199 AND ck_max >= 100 THEN n ELSE 0 END)::BIGINT AS rows_scanned,
         |  sum(nm)::BIGINT AS rows_matched
         |FROM sz
         |UNION ALL
         |SELECT 'linear', count(*)::BIGINT,
         |  sum(CASE WHEN ck_min <= 199 AND ck_max >= 100 THEN 1 ELSE 0 END)::BIGINT,
         |  sum(CASE WHEN ck_min <= 199 AND ck_max >= 100 THEN n ELSE 0 END)::BIGINT,
         |  sum(nm)::BIGINT
         |FROM sl""".stripMargin
    },

    // bounded-depth BFS from the 8 smallest node ids, unrolled one
    // MATERIALIZED CTE per hop (the q133/q141 pattern); harmonic sums in
    // integer micro-units so the aggregate gates hash-exact
    "q147_closeness_pivots" ->
      """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e0 AS MATERIALIZED (
        |  SELECT a.l_partkey AS pa, b.l_partkey AS pb
        |  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |e AS MATERIALIZED (SELECT pa AS src, pb AS dst FROM e0 UNION ALL SELECT pb, pa FROM e0),
        |pv AS MATERIALIZED (SELECT DISTINCT src AS piv FROM e ORDER BY 1 LIMIT 8),
        |d0 AS MATERIALIZED (SELECT piv, piv AS node FROM pv),
        |d1 AS MATERIALIZED (
        |  SELECT DISTINCT p.piv, e.dst AS node FROM d0 p JOIN e ON p.node = e.src
        |  EXCEPT SELECT piv, node FROM d0),
        |d2 AS MATERIALIZED (
        |  SELECT DISTINCT p.piv, e.dst AS node FROM d1 p JOIN e ON p.node = e.src
        |  EXCEPT (SELECT piv, node FROM d1 UNION ALL SELECT piv, node FROM d0)),
        |d3 AS MATERIALIZED (
        |  SELECT DISTINCT p.piv, e.dst AS node FROM d2 p JOIN e ON p.node = e.src
        |  EXCEPT (SELECT piv, node FROM d2 UNION ALL SELECT piv, node FROM d1
        |          UNION ALL SELECT piv, node FROM d0)),
        |u AS (
        |  SELECT piv, node, 1 AS dist FROM d1
        |  UNION ALL SELECT piv, node, 2 FROM d2
        |  UNION ALL SELECT piv, node, 3 FROM d3)
        |SELECT node, count(*)::BIGINT AS n_pivots_reached,
        |  sum(1000000 // dist)::BIGINT AS harmonic_micro
        |FROM u GROUP BY 1""".stripMargin,

    // scaled plants of vec_id < 100 are the ONLY pairs >= tau on the
    // isotropic corpus; sign pattern is scale-invariant so all are found
    "q30_embedding_neardup" ->
      """SELECT vec_id AS vec_a, vec_id + 1000000 AS vec_b, 1.0::DOUBLE AS cos_sim
        |FROM embeddings WHERE vec_id < 100""".stripMargin,

    // same planted construction, IVF-cell blocking: a scaled copy argmaxes
    // to its original's cell, so the found set is exactly the planted set
    "q148_ivf_neardup" ->
      """SELECT vec_id AS vec_a, vec_id + 1000000 AS vec_b, 1.0::DOUBLE AS cos_sim
        |FROM embeddings WHERE vec_id < 100""".stripMargin,

    // the estimates themselves are engine-specific (DataSketches HLL), so
    // the gate states the exact count plus the two CLAIMS about the
    // sketches — mergeability and bounded error — as oracle booleans
    "q151_sketch_rollup" ->
      """SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_exact,
        |  true AS mergeable_ok, true AS bounded_ok
        |FROM events GROUP BY 1""".stripMargin,

    "q152_kmv_overlap" ->
      """WITH ra AS (
        |  SELECT l_partkey, l_returnflag FROM lineitem WHERE l_returnflag IN ('R','A')),
        |seg AS (
        |  SELECT l_partkey, count(DISTINCT l_returnflag) AS nf FROM ra GROUP BY 1)
        |SELECT
        |  (SELECT count(DISTINCT l_partkey) FROM ra WHERE l_returnflag = 'R')::BIGINT AS n_r,
        |  (SELECT count(DISTINCT l_partkey) FROM ra WHERE l_returnflag = 'A')::BIGINT AS n_a,
        |  (SELECT count(*) FROM seg WHERE nf = 2)::BIGINT AS n_both,
        |  (SELECT count(*) FROM seg)::BIGINT AS n_union,
        |  true AS est_r_ok, true AS est_a_ok, true AS union_ok,
        |  true AS inter_ok, true AS jaccard_ok""".stripMargin,

    "q153_kmv_rollup" ->
      """SELECT count(DISTINCT c_nationkey)::BIGINT AS n_nations,
        |  count(DISTINCT c_custkey)::BIGINT AS n_exact,
        |  true AS merge_bitwise_ok, true AS est_ok
        |FROM customer""".stripMargin,

    // planted construction (q30/q148 harness): scaled copies of vec_id<100
    // are each other's only semantic duplicate, so the cluster map is
    // exactly {original kept, plant dropped} per planted pair
    "q154_semantic_dedup" ->
      """SELECT vec_id, vec_id AS canonical_id, true AS keep
        |FROM embeddings WHERE vec_id < 100
        |UNION ALL
        |SELECT vec_id + 1000000, vec_id, false
        |FROM embeddings WHERE vec_id < 100""".stripMargin,

    "q155_domain_cap" ->
      """SELECT source, doc_id, rk FROM (
        |  SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source ORDER BY md5(text), doc_id)::INT AS rk
        |  FROM documents)
        |WHERE rk <= 15""".stripMargin,

    // q22's quality formula verbatim, then NTILE deciles on the rounded
    // score (doc_id tie-break) and a content-hash shuffle within deciles
    "q158_curriculum_order" ->
      """WITH f AS (
        |  SELECT doc_id, text,
        |    length(text) AS L,
        |    length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS n_alpha,
        |    length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
        |    len(regexp_extract_all(text, '\S+')) AS n_tokens,
        |    len(regexp_extract_all(lower(text), '\b(the|a|of|and|in|to)\b')) AS n_stop
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, md5(text) AS h,
        |    round(least(1.0, greatest(0.0,
        |      0.5 * (n_alpha::DOUBLE / nullif(L, 0)::DOUBLE)
        |      + 0.3 * least(1.0, (n_stop::DOUBLE / nullif(n_tokens, 0)::DOUBLE) * 4)
        |      + 0.2 * least(1.0, n_tokens::DOUBLE / 64.0)
        |      - (n_digit::DOUBLE / nullif(L, 0)::DOUBLE))), 4) AS quality
        |  FROM f),
        |d AS (
        |  SELECT doc_id, quality, h,
        |    ntile(10) OVER (ORDER BY quality DESC, doc_id)::INT AS decile
        |  FROM r)
        |SELECT doc_id, quality, decile,
        |  row_number() OVER (PARTITION BY decile ORDER BY h, doc_id)::INT AS pos_in_decile
        |FROM d""".stripMargin,

    // tokenize with the learned BPE vocabulary: the oracle re-learns the
    // merges AND re-applies them to every distinct word, then sums per doc
    "q165_bpe_tokenize" -> graft.analytics.BpeInduction.tokenizeOracleSql(),

    // quantizer-refresh decision: the oracle restates the index's STORED
    // reference stats from the raw parquet (the stored means are bitwise
    // reproducible — 6-dp quantized decimal sums, double division, dim
    // order), rebuilds the planted current corpus, and applies the same
    // rounded-cosine threshold — every evidence column and verdict matches
    "q166_quantizer_refresh" ->
      """WITH u AS (
        |  SELECT label, generate_subscripts(embedding, 1) AS dim,
        |    round(unnest(embedding)::DOUBLE, 6) AS xq
        |  FROM embeddings),
        |rpd AS (
        |  SELECT label, dim, sum(xq::DECIMAL(28,12))::DOUBLE / count(*) AS m, count(*) AS n
        |  FROM u GROUP BY 1, 2),
        |rlv AS (
        |  SELECT label, max(n)::BIGINT AS n_ref, list(m ORDER BY dim) AS mv_ref
        |  FROM rpd GROUP BY label),
        |cur AS (
        |  SELECT label, embedding::DOUBLE[] AS v FROM embeddings
        |  UNION ALL
        |  SELECT label, list_transform(embedding::DOUBLE[], x -> x + 0.5) AS v
        |  FROM embeddings WHERE label < 3),
        |cu AS (
        |  SELECT label, generate_subscripts(v, 1) AS dim, round(unnest(v), 6) AS xq
        |  FROM cur),
        |cpd AS (
        |  SELECT label, dim, sum(xq::DECIMAL(28,12))::DOUBLE / count(*) AS m, count(*) AS n
        |  FROM cu GROUP BY 1, 2),
        |clv AS (
        |  SELECT label, max(n)::BIGINT AS n_cur, list(m ORDER BY dim) AS mv_cur
        |  FROM cpd GROUP BY label)
        |SELECT r.label, n_ref, n_cur,
        |  round(list_cosine_similarity(mv_ref, mv_cur), 4) AS drift_cos,
        |  round(list_cosine_similarity(mv_ref, mv_cur), 4) < 0.98 AS rebuild
        |FROM rlv r JOIN clv c ON r.label = c.label""".stripMargin,

    // compacted-index planted recall (q47-pattern no-answer-change gate):
    // the oracle states the planted outcome — compaction must not change
    // any answer; the file-count collapse is pinned by AnnIndexSpec
    "q167_ann_compaction" ->
      """SELECT vec_id AS query_id, true AS found
        |FROM embeddings WHERE vec_id < 10""".stripMargin,

    // pivot-sampled Brandes betweenness: both sweeps unrolled — forward
    // shortest-path counts per BFS level (q147's level CTEs with a SUM),
    // then the backward dependency accumulation in exact integer
    // micro-units ((sigma_v * (1e6 + delta_w)) // sigma_w, summed as
    // integers) — every score restated exactly
    "q168_betweenness_pivots" ->
      """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e0 AS MATERIALIZED (
        |  SELECT a.l_partkey AS pa, b.l_partkey AS pb
        |  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |e AS MATERIALIZED (SELECT pa AS src, pb AS dst FROM e0 UNION ALL SELECT pb, pa FROM e0),
        |pv AS MATERIALIZED (SELECT DISTINCT src AS piv FROM e ORDER BY 1 LIMIT 8),
        |s0 AS MATERIALIZED (SELECT piv, piv AS node, 1::BIGINT AS sigma FROM pv),
        |s1 AS MATERIALIZED (
        |  SELECT p.piv, e.dst AS node, sum(p.sigma)::BIGINT AS sigma
        |  FROM s0 p JOIN e ON p.node = e.src
        |  WHERE NOT EXISTS (SELECT 1 FROM s0 x WHERE x.piv = p.piv AND x.node = e.dst)
        |  GROUP BY 1, 2),
        |s2 AS MATERIALIZED (
        |  SELECT p.piv, e.dst AS node, sum(p.sigma)::BIGINT AS sigma
        |  FROM s1 p JOIN e ON p.node = e.src
        |  WHERE NOT EXISTS (SELECT 1 FROM s0 x WHERE x.piv = p.piv AND x.node = e.dst)
        |    AND NOT EXISTS (SELECT 1 FROM s1 x WHERE x.piv = p.piv AND x.node = e.dst)
        |  GROUP BY 1, 2),
        |s3 AS MATERIALIZED (
        |  SELECT p.piv, e.dst AS node, sum(p.sigma)::BIGINT AS sigma
        |  FROM s2 p JOIN e ON p.node = e.src
        |  WHERE NOT EXISTS (SELECT 1 FROM s0 x WHERE x.piv = p.piv AND x.node = e.dst)
        |    AND NOT EXISTS (SELECT 1 FROM s1 x WHERE x.piv = p.piv AND x.node = e.dst)
        |    AND NOT EXISTS (SELECT 1 FROM s2 x WHERE x.piv = p.piv AND x.node = e.dst)
        |  GROUP BY 1, 2),
        |b2 AS MATERIALIZED (
        |  SELECT v.piv, v.node,
        |    sum((v.sigma * (1000000 + 0)) // w.sigma)::BIGINT AS delta
        |  FROM s2 v JOIN e ON v.node = e.src
        |    JOIN s3 w ON w.piv = v.piv AND w.node = e.dst
        |  GROUP BY 1, 2),
        |b1 AS MATERIALIZED (
        |  SELECT v.piv, v.node,
        |    sum((v.sigma * (1000000 + coalesce(b.delta, 0))) // w.sigma)::BIGINT AS delta
        |  FROM s1 v JOIN e ON v.node = e.src
        |    JOIN s2 w ON w.piv = v.piv AND w.node = e.dst
        |    LEFT JOIN b2 b ON b.piv = w.piv AND b.node = w.node
        |  GROUP BY 1, 2),
        |u AS (
        |  SELECT v.piv, v.node, coalesce(b.delta, 0) AS delta
        |  FROM s1 v LEFT JOIN b1 b ON b.piv = v.piv AND b.node = v.node
        |  UNION ALL
        |  SELECT v.piv, v.node, coalesce(b.delta, 0)
        |  FROM s2 v LEFT JOIN b2 b ON b.piv = v.piv AND b.node = v.node
        |  UNION ALL
        |  SELECT piv, node, 0 FROM s3)
        |SELECT node, count(*)::BIGINT AS n_pivots_reached,
        |  sum(delta)::BIGINT AS betweenness_micro
        |FROM u GROUP BY 1""".stripMargin,

    // BPE merge induction: the oracle re-runs the whole induction — word
    // table, per-round pair counts, argmax, merge application — unrolled
    "q164_bpe_merges" -> graft.analytics.BpeInduction.oracleSql(),

    // the trained quality probe: the oracle is the ENTIRE training run
    // unrolled — 8 integer-GD steps in SQL — then every score; hash-exact
    "q163_quality_probe" -> graft.analytics.QualityProbe.oracleSql(),

    // reliability diagram over the re-trained probe's scores: integer
    // equal-width bins, basis-point positive rates, truncating means
    "q187_probe_calibration" -> graft.analytics.QualityProbe.calibrationOracleSql(),

    // tokenizer fertility per language: the oracle re-learns the BPE
    // vocabulary and re-tokenizes the corpus from scratch
    "q188_bpe_fertility" -> graft.analytics.BpeInduction.fertilityOracleSql(),

    // content-hash shard assignment + order-insensitive manifest (q110's
    // exact-decimal checksum rule; HUGEINT sum on the DuckDB side)
    "q186_shard_manifest" ->
      """SELECT ('0x' || substring(md5(text), 1, 4))::BIGINT % 16 AS shard_id,
        |  count(*) AS n_docs,
        |  sum(len(regexp_extract_all(text, '\S+')))::BIGINT AS n_tokens,
        |  sum(('0x' || substring(md5(doc_id::VARCHAR || '|' || text), 1, 12))::BIGINT)::VARCHAR AS checksum
        |FROM documents GROUP BY 1""".stripMargin,

    // shard-level snapshot diff: q113's planted v2, manifests full-outer
    // merged; checksum equality via null-safe compare both sides
    "q190_manifest_diff" ->
      """WITH v1 AS (SELECT doc_id, text FROM documents),
        |v2 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
        |  FROM v1 WHERE doc_id % 13 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text FROM v1
        |  WHERE (ascii(substring(md5(text), 1, 1)) * 256 +
        |         ascii(substring(md5(text), 2, 1))) % 100 < 2),
        |m1 AS (
        |  SELECT ('0x' || substring(md5(text), 1, 4))::BIGINT % 16 AS shard_id,
        |    count(*) AS n,
        |    sum(('0x' || substring(md5(doc_id::VARCHAR || '|' || text), 1, 12))::BIGINT) AS s
        |  FROM v1 GROUP BY 1),
        |m2 AS (
        |  SELECT ('0x' || substring(md5(text), 1, 4))::BIGINT % 16 AS shard_id,
        |    count(*) AS n,
        |    sum(('0x' || substring(md5(doc_id::VARCHAR || '|' || text), 1, 12))::BIGINT) AS s
        |  FROM v2 GROUP BY 1)
        |SELECT shard_id, coalesce(m1.n, 0)::BIGINT AS docs_v1,
        |  coalesce(m2.n, 0)::BIGINT AS docs_v2,
        |  (m1.s IS NOT DISTINCT FROM m2.s) AS unchanged
        |FROM m1 FULL OUTER JOIN m2 USING (shard_id)""".stripMargin,

    // cross-source leakage matrix over the q25 pair graph: canonical
    // (least, greatest) source pair, pair counts + 4dp mean similarity
    "q191_source_leakage" ->
      ("WITH\n" + ShingleCtes + ",\n" + JaccardPairCtes + ",\n" +
      """so AS (SELECT doc_id, source FROM documents),
        |pairs AS (
        |  SELECT sa.source AS sa, sb.source AS sb, ej.jaccard
        |  FROM ej JOIN so sa ON ej.a = sa.doc_id JOIN so sb ON ej.b = sb.doc_id)
        |SELECT least(sa, sb) AS src_1, greatest(sa, sb) AS src_2,
        |  count(*) AS n_pairs, round(avg(jaccard), 4) AS avg_jaccard
        |FROM pairs GROUP BY 1, 2""".stripMargin),

    // deterministic per-epoch loader order: salted content hash per
    // (shard, epoch), top-k per cell; row_number cast ::INT (gotchas)
    "q192_epoch_order" ->
      """WITH d AS (
        |  SELECT doc_id, text,
        |    ('0x' || substring(md5(text), 1, 4))::BIGINT % 16 AS shard_id
        |  FROM documents),
        |e AS (SELECT 1 AS epoch UNION ALL SELECT 2),
        |r AS (
        |  SELECT epoch, shard_id, doc_id,
        |    row_number() OVER (PARTITION BY shard_id, epoch
        |      ORDER BY md5(epoch::VARCHAR || ':' || text) ASC, doc_id ASC) AS rk
        |  FROM d CROSS JOIN e)
        |SELECT epoch, shard_id, doc_id, rk::INT AS rk FROM r WHERE rk <= 3""".stripMargin,

    // packing-efficiency audit: q62's chain + one bucket aggregate
    "q193_packing_efficiency" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    (ascii(substring(md5(text), 1, 1)) * 256 + ascii(substring(md5(text), 2, 1))) % 100 % 32 AS bucket,
        |    len(regexp_extract_all(text, '\S+'))::BIGINT AS n_tok
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, bucket, n_tok,
        |    sum(n_tok) OVER (PARTITION BY bucket ORDER BY doc_id ASC ROWS UNBOUNDED PRECEDING) AS cum_tok
        |  FROM d),
        |p AS (
        |  SELECT bucket, n_tok, ((cum_tok - n_tok) // 2048)::BIGINT AS seq_id FROM c)
        |SELECT bucket, count(DISTINCT seq_id)::BIGINT AS n_seqs,
        |  sum(n_tok)::BIGINT AS total_tokens,
        |  (count(DISTINCT seq_id) * 2048)::BIGINT AS capacity,
        |  (sum(n_tok) * 10000 // (count(DISTINCT seq_id) * 2048))::BIGINT AS fill_bp
        |FROM p GROUP BY bucket""".stripMargin,

    // the writer round-trip gate: the manifest over the WRITTEN layout
    // must equal the manifest over the source (no-answer-change)
    "q189_shard_write" ->
      """SELECT ('0x' || substring(md5(text), 1, 4))::BIGINT % 16 AS shard_id,
        |  count(*) AS n_docs,
        |  sum(len(regexp_extract_all(text, '\S+')))::BIGINT AS n_tokens,
        |  sum(('0x' || substring(md5(doc_id::VARCHAR || '|' || text), 1, 12))::BIGINT)::VARCHAR AS checksum
        |FROM documents GROUP BY 1""".stripMargin,

    // cluster-balanced diversity sample: the oracle recomputes the q144
    // cell assignment vector-by-vector, then the same per-cell hash-ranked
    // keep-k — fully engine-exact
    "q162_cluster_sample" ->
      """WITH c AS (
        |  SELECT vec_id AS cid, embedding::DOUBLE[] AS cv FROM embeddings
        |  ORDER BY vec_id LIMIT 16),
        |s AS (
        |  SELECT e.vec_id, c.cid, list_cosine_similarity(e.embedding::DOUBLE[], c.cv) AS sim
        |  FROM embeddings e CROSS JOIN c),
        |r AS (
        |  SELECT vec_id, cid,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid ASC) AS rn
        |  FROM s),
        |a AS (SELECT vec_id, cid FROM r WHERE rn = 1)
        |SELECT cid, vec_id, rk FROM (
        |  SELECT cid, vec_id,
        |    row_number() OVER (PARTITION BY cid ORDER BY md5(vec_id::VARCHAR), vec_id)::INT AS rk
        |  FROM a) t
        |WHERE rk <= 5""".stripMargin,

    // persisted IVF index, planted-recall form: the scaled copy of every
    // query vector — appended through extend() and served through the
    // dynamically-pruned cells scan — must come back as the top-1 at 1.0
    "q161_ann_index_recall" ->
      """SELECT vec_id AS query_id, true AS found
        |FROM embeddings WHERE vec_id < 10""".stripMargin,

    // persisted-index incremental dedup, planted-recall form: every verbatim
    // copy planted into the probe batch (content bucket [10,30), ids +10^7)
    // must come back paired with its original at estimate exactly 1.0 —
    // half the plants hit the build() leg, half the extend() leg
    "q160_incremental_dedup" ->
      """SELECT doc_id + 10000000 AS new_id, doc_id AS orig_id, true AS found
        |FROM documents
        |WHERE (ascii(substring(md5(text), 1, 1)) * 256 + ascii(substring(md5(text), 2, 1))) % 100 >= 10
        |  AND (ascii(substring(md5(text), 1, 1)) * 256 + ascii(substring(md5(text), 2, 1))) % 100 < 30""".stripMargin,

    // the q160 gate re-run through compacted index tables — compaction
    // must not change a single answer (q47/q167 pattern)
    "q171_dedup_index_compaction" ->
      """SELECT doc_id + 10000000 AS new_id, doc_id AS orig_id, true AS found
        |FROM documents
        |WHERE (ascii(substring(md5(text), 1, 1)) * 256 + ascii(substring(md5(text), 2, 1))) % 100 >= 10
        |  AND (ascii(substring(md5(text), 1, 1)) * 256 + ascii(substring(md5(text), 2, 1))) % 100 < 30""".stripMargin,

    // the q160 gate re-run through a THRESHOLD-SCOPED targeted pass —
    // rewriting only the over-threshold band slices must not change a
    // single answer (the slice scoping itself is spec-pinned)
    "q230_targeted_compaction" ->
      """SELECT doc_id + 10000000 AS new_id, doc_id AS orig_id, true AS found
        |FROM documents
        |WHERE (ascii(substring(md5(text), 1, 1)) * 256 + ascii(substring(md5(text), 2, 1))) % 100 >= 10
        |  AND (ascii(substring(md5(text), 1, 1)) * 256 + ascii(substring(md5(text), 2, 1))) % 100 < 30""".stripMargin,

    // the sketch-bucketed curriculum: DuckDB can't run the MRL sketch, so
    // (q102/q157-style) the gate states the per-decile claims as booleans;
    // the 10-row shape itself pins that every decile is populated
    "q159_curriculum_sketch" ->
      """SELECT d::INT AS decile, true AS share_ok, true AS monotone_ok
        |FROM generate_series(1, 10) AS t(d)""".stripMargin,

    // the ratios are engine-side (DuckDB has no deflate); the gate states
    // the exact identity columns plus the two per-row claims as booleans
    "q157_compressibility" ->
      """SELECT doc_id, n_chars, true AS ratio_ok, true AS double_ok
        |FROM documents""".stripMargin,

    "q156_collocation_pmi" ->
      """WITH toks AS (
        |  SELECT unnest(regexp_extract_all(text, '\S+')) AS w FROM documents),
        |uni AS (SELECT w, count(*) AS c FROM toks GROUP BY 1),
        |tot AS (SELECT count(*)::DOUBLE AS t FROM toks),
        |dt AS (SELECT regexp_extract_all(text, '\S+') AS ts FROM documents),
        |bigs AS (
        |  SELECT unnest(list_transform(generate_series(1, len(ts) - 1),
        |    i -> ts[i] || ' ' || ts[i+1])) AS bg
        |  FROM dt),
        |btot AS (SELECT count(*)::DOUBLE AS b FROM bigs),
        |bc AS (
        |  SELECT string_split(bg, ' ')[1] AS w1, string_split(bg, ' ')[2] AS w2,
        |    count(*) AS c_ab
        |  FROM bigs GROUP BY 1, 2 HAVING count(*) >= 5),
        |scored AS (
        |  SELECT bc.w1, bc.w2, bc.c_ab,
        |    round(ln((bc.c_ab / btot.b) / ((ua.c / tot.t) * (ub.c / tot.t))), 4) AS pmi
        |  FROM bc
        |  JOIN uni ua ON bc.w1 = ua.w
        |  JOIN uni ub ON bc.w2 = ub.w
        |  CROSS JOIN tot CROSS JOIN btot)
        |SELECT w1, w2, c_ab, pmi, rk FROM (
        |  SELECT *, row_number() OVER (ORDER BY pmi DESC, w1, w2)::INT AS rk FROM scored)
        |WHERE rk <= 20""".stripMargin,

    // rank on the ROUNDED cosine with id tie-break so the top-k cut is
    // engine-exact even among 4-dp ties
    "q150_item_knn" ->
      """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |freq AS (SELECT l_partkey, count(*) AS n_part FROM op GROUP BY 1),
        |pr AS (
        |  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_both
        |  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 3),
        |sim AS (
        |  SELECT part_a, part_b,
        |    round(n_both::DOUBLE / sqrt(fa.n_part * fb.n_part), 4) AS cos_sim
        |  FROM pr JOIN freq fa ON pr.part_a = fa.l_partkey
        |          JOIN freq fb ON pr.part_b = fb.l_partkey),
        |r AS (
        |  SELECT part_a, part_b, cos_sim,
        |    (row_number() OVER (PARTITION BY part_a ORDER BY cos_sim DESC, part_b ASC))::INT AS rnk
        |  FROM sim)
        |SELECT part_a, part_b, cos_sim, rnk FROM r WHERE rnk <= 3""".stripMargin,

    // the full dominance statement the bucketed plan must reproduce exactly
    "q149_pareto_frontier" ->
      """WITH p AS (
        |  SELECT DISTINCT o_totalprice AS price, o_orderdate::DATE AS odate
        |  FROM orders)
        |SELECT price, odate FROM p r
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM p s
        |  WHERE s.price <= r.price AND s.odate >= r.odate
        |    AND (s.price < r.price OR s.odate > r.odate))""".stripMargin,

    // perturbed planted media copies on the (id, id+1e6) pattern
    "q118_phash_neardup" ->
      """SELECT doc_id AS doc_a, doc_id + 1000000 AS doc_b
        |FROM documents WHERE doc_id < 10""".stripMargin,

    "q50_hll_error_bound" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts, true AS hll_ok
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q64_simhash128_recall" ->
      """SELECT count(*) AS n_planted, true AS planted_ok FROM documents
        |WHERE (ascii(substring(md5(text), 1, 1)) * 256 + ascii(substring(md5(text), 2, 1))) % 100 < 10""".stripMargin,

    "q52_ivf_planted_recall" ->
      """SELECT count(*) AS n_queries, true AS planted_ok
        |FROM embeddings WHERE vec_id < 10""".stripMargin,

    "q75_pq_planted_recall" ->
      """SELECT count(*) AS n_queries, true AS planted_ok
        |FROM embeddings WHERE vec_id < 10""".stripMargin,

    "q76_bigram_logprob" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM documents),
        |bigs AS (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 1),
        |    i -> t[i] || ' ' || t[i+1])) AS bg
        |  FROM toks),
        |c2 AS (SELECT bg, count(*) AS c2 FROM bigs GROUP BY bg),
        |c1 AS (
        |  SELECT string_split(bg, ' ')[1] AS prev, count(*) AS c1
        |  FROM bigs GROUP BY 1)
        |SELECT bigs.doc_id, count(*) AS n_bigrams,
        | round(avg(ln(c2.c2::DOUBLE / c1.c1)), 4) AS avg_bigram_logprob
        |FROM bigs
        |JOIN c2 ON bigs.bg = c2.bg
        |JOIN c1 ON string_split(bigs.bg, ' ')[1] = c1.prev
        |GROUP BY bigs.doc_id""".stripMargin,

    "q53_split_contamination" ->
      ("WITH\n" + ShingleCtes + ",\n" + JaccardPairCtes + ",\n" +
      """sp AS (
        |  SELECT doc_id,
        |    CASE WHEN (ascii(substring(md5(text), 1, 1)) * 256 + ascii(substring(md5(text), 2, 1))) % 100 < 90 THEN 'train'
        |         WHEN (ascii(substring(md5(text), 1, 1)) * 256 + ascii(substring(md5(text), 2, 1))) % 100 < 95 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents)
        |SELECT ej.a AS doc_a, ej.b AS doc_b, sa.split AS split_a, sb.split AS split_b, ej.jaccard
        |FROM ej JOIN sp sa ON ej.a = sa.doc_id JOIN sp sb ON ej.b = sb.doc_id
        |WHERE sa.split <> sb.split""".stripMargin),

    "q60_unigram_logprob" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS term
        |  FROM documents),
        |freq AS (
        |  SELECT term, count(*) AS cnt FROM toks GROUP BY term),
        |tot AS (SELECT count(*)::DOUBLE AS total FROM toks)
        |SELECT t.doc_id, count(*) AS n_tokens,
        |  round(avg(ln(freq.cnt / tot.total)), 4) AS avg_logprob
        |FROM toks t JOIN freq USING (term) CROSS JOIN tot
        |GROUP BY t.doc_id""".stripMargin,

    "q61_stratified_sample" ->
      """SELECT doc_id, lang, rk::INT AS rk
        |FROM (SELECT doc_id, lang,
        |        row_number() OVER (PARTITION BY lang ORDER BY md5(text) ASC, doc_id ASC) AS rk
        |      FROM documents)
        |WHERE rk <= 20""".stripMargin,

    "q62_token_packing" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    (ascii(substring(md5(text), 1, 1)) * 256 + ascii(substring(md5(text), 2, 1))) % 100 % 32 AS bucket,
        |    len(regexp_extract_all(text, '\S+'))::BIGINT AS n_tok
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, bucket, n_tok,
        |    sum(n_tok) OVER (PARTITION BY bucket ORDER BY doc_id ASC ROWS UNBOUNDED PRECEDING) AS cum_tok
        |  FROM d)
        |SELECT doc_id, bucket, n_tok, ((cum_tok - n_tok) // 2048)::BIGINT AS seq_id
        |FROM c""".stripMargin,

    "q58_length_outliers" ->
      """WITH p AS (
        |  SELECT lang, quantile_cont(n_chars, 0.99) AS p99
        |  FROM documents GROUP BY lang)
        |SELECT d.doc_id, d.lang, d.n_chars,
        |  d.n_chars > p.p99 AS is_outlier,
        |  round(least(d.n_chars::DOUBLE, p.p99), 4) AS n_chars_clipped
        |FROM documents d JOIN p USING (lang)""".stripMargin,

    "q59_quality_normalized" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    length(text) AS L,
        |    length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS n_alpha,
        |    length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
        |    len(regexp_extract_all(text, '\S+')) AS n_tokens,
        |    len(regexp_extract_all(lower(text), '\b(the|a|of|and|in|to)\b')) AS n_stop
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, n_tokens,
        |    n_alpha::DOUBLE / nullif(L, 0)::DOUBLE AS alpha_ratio,
        |    n_digit::DOUBLE / nullif(L, 0)::DOUBLE AS digit_ratio,
        |    n_stop::DOUBLE / nullif(n_tokens, 0)::DOUBLE AS stop_ratio
        |  FROM f),
        |q AS (
        |  SELECT doc_id, round(least(1.0, greatest(0.0,
        |    0.5 * alpha_ratio + 0.3 * least(1.0, stop_ratio * 4) +
        |    0.2 * least(1.0, n_tokens::DOUBLE / 64.0) - digit_ratio)), 4) AS quality
        |  FROM r),
        |wl AS (
        |  SELECT q.doc_id, d.lang, q.quality
        |  FROM q JOIN documents d ON q.doc_id = d.doc_id),
        |s AS (
        |  SELECT lang, avg(quality) AS la, stddev_samp(quality) AS ls
        |  FROM wl GROUP BY lang)
        |SELECT wl.doc_id, wl.lang, wl.quality,
        |  round(s.la, 4) AS lang_avg,
        |  round((wl.quality - s.la) / s.ls, 4) AS quality_z
        |FROM wl JOIN s USING (lang)""".stripMargin,

    "q56_range_join" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events),
        |p AS (
        |  SELECT event_id AS purchase_id, user_id, us AS p_us FROM e WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT event_id AS click_id, user_id, us AS c_us FROM e WHERE event_type = 'click')
        |SELECT p.purchase_id, c.click_id, p.user_id, p.p_us, c.c_us
        |FROM p JOIN c ON p.user_id = c.user_id
        | AND c.c_us <= p.p_us AND c.c_us >= p.p_us - 3600000000""".stripMargin,

    "q57_grouping_sets" ->
      """SELECT o_orderstatus, year(o_orderdate)::BIGINT AS yr,
        | count(*) AS n_orders, round(sum(o_totalprice), 2) AS sum_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (yr), ())""".stripMargin,

    "q54_price_quantiles_exact" ->
      """SELECT o_orderstatus,
        | round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
        | round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        | round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
        | round(quantile_cont(o_totalprice, 0.99), 4) AS p99
        |FROM orders GROUP BY o_orderstatus""".stripMargin,

    "q55_tfidf_terms" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS term
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
        |dfreq AS (
        |  SELECT term, count(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT count(*)::DOUBLE AS n_docs FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
        |    round(tf.tf * ln(n.n_docs / dfreq.df), 4) AS tfidf
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN n),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rk
        |  FROM scored)
        |SELECT doc_id, term, tf, df, tfidf, rk::INT AS rk
        |FROM ranked WHERE rk <= 3""".stripMargin,

    "q32_media_format_stats" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    (octet_length(text::BLOB) % 640 + 32)::INT AS width,
        |    ((octet_length(text::BLOB) * 7) % 480 + 32)::INT AS height,
        |    ['jpg', 'png', 'webp'][(doc_id % 3 + 1)::INT] AS fmt,
        |    (doc_id % 16 + 1)::INT AS n_frames
        |  FROM documents)
        |SELECT fmt, count(*) AS n_media, round(avg(width), 4) AS avg_width,
        | round(avg(height), 4) AS avg_height, max(n_frames) AS max_frames
        |FROM m GROUP BY fmt""".stripMargin,

    "q65_repetition_ratio" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_replace(text, '^\s+|\s+$', '', 'g') AS tt,
        |    regexp_extract_all(text, '\S+') AS t FROM documents),
        |g AS (
        |  SELECT doc_id, (len(t) - 1)::BIGINT AS n_bigrams,
        |    CASE WHEN len(t) >= 2
        |         THEN list_distinct(list_transform(generate_series(1, len(t) - 1),
        |                i -> t[i] || ' ' || t[i+1]))
        |         ELSE [tt] END AS dg
        |  FROM toks)
        |SELECT doc_id, n_bigrams, len(dg)::BIGINT AS n_distinct,
        | round(1.0 - len(dg)::DOUBLE / nullif(n_bigrams, 0), 4) AS rep_ratio
        |FROM g""".stripMargin,

    "q66_gopher_filter" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    regexp_replace(text, '^\s+|\s+$', '', 'g') AS tt,
        |    regexp_extract_all(text, '\S+') AS t,
        |    len(regexp_extract_all(text, '\S+')) AS n_words,
        |    round(length(regexp_replace(text, '\s', '', 'g'))::DOUBLE /
        |          nullif(len(regexp_extract_all(text, '\S+')), 0), 4) AS mean_word_len,
        |    len(regexp_extract_all(lower(text), '\b(the|a|of|and|in|to)\b')) AS n_stopwords
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, n_words, mean_word_len, n_stopwords,
        |    round(1.0 - len(CASE WHEN len(t) >= 2
        |      THEN list_distinct(list_transform(generate_series(1, len(t) - 1),
        |        i -> t[i] || ' ' || t[i+1]))
        |      ELSE [tt] END)::DOUBLE / nullif(len(t) - 1, 0), 4) AS rep_ratio
        |  FROM f),
        |b AS (
        |  SELECT doc_id, n_words::BIGINT AS n_words, mean_word_len,
        |    n_stopwords::BIGINT AS n_stopwords, rep_ratio,
        |    n_words BETWEEN 50 AND 100000 AS ok_words,
        |    mean_word_len BETWEEN 3.0 AND 10.0 AS ok_mean_len,
        |    n_stopwords >= 2 AS ok_stopwords,
        |    rep_ratio <= 0.1 AS ok_repetition
        |  FROM r)
        |SELECT *, ok_words AND ok_mean_len AND ok_stopwords AND ok_repetition AS pass
        |FROM b""".stripMargin,

    "q67_mixture_sample" ->
      """SELECT doc_id, source,
        |  CASE WHEN (substring(source, 4)::INT) % 2 = 0 THEN 100 ELSE 25 END AS target_pct
        |FROM documents
        |WHERE (ascii(substring(md5(text), 1, 1)) * 256 +
        |       ascii(substring(md5(text), 2, 1))) % 100 <
        |  CASE WHEN (substring(source, 4)::INT) % 2 = 0 THEN 100 ELSE 25 END""".stripMargin,

    "q68_boilerplate_ngrams" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_replace(text, '^\s+|\s+$', '', 'g') AS tt,
        |    regexp_extract_all(text, '\S+') AS t FROM documents),
        |grams AS (
        |  SELECT doc_id, unnest(CASE WHEN len(t) >= 3
        |    THEN list_distinct(list_transform(generate_series(1, len(t) - 2),
        |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
        |    ELSE [tt] END) AS g
        |  FROM toks),
        |dfreq AS (SELECT g, count(*) AS df FROM grams GROUP BY g),
        |nd AS (SELECT count(*) AS n_docs FROM documents),
        |boiler AS (SELECT g FROM dfreq, nd WHERE df * 100 >= n_docs)
        |SELECT grams.doc_id, count(*)::BIGINT AS n_shingles,
        | count(boiler.g)::BIGINT AS n_boiler,
        | round(count(boiler.g)::DOUBLE / count(*), 4) AS boiler_frac
        |FROM grams LEFT JOIN boiler ON grams.g = boiler.g
        |GROUP BY grams.doc_id""".stripMargin,

    "q69_decontamination" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    (ascii(substring(md5(text), 1, 1)) * 256 +
        |     ascii(substring(md5(text), 2, 1))) % 100 AS b,
        |    regexp_replace(text, '^\s+|\s+$', '', 'g') AS tt,
        |    regexp_extract_all(text, '\S+') AS t
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, b, unnest(CASE WHEN len(t) >= 5
        |    THEN list_distinct(list_transform(generate_series(1, len(t) - 4),
        |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]))
        |    ELSE [tt] END) AS g
        |  FROM s),
        |ev AS (SELECT doc_id AS eval_id, g FROM grams WHERE b >= 95),
        |tr AS (SELECT doc_id AS train_id, g FROM grams WHERE b < 90)
        |SELECT train_id, eval_id, count(*) AS n_shared
        |FROM tr JOIN ev USING (g)
        |GROUP BY train_id, eval_id""".stripMargin,

    "q70_decontaminated_train" ->
      """WITH s AS (
        |  SELECT doc_id, lang, source,
        |    (ascii(substring(md5(text), 1, 1)) * 256 +
        |     ascii(substring(md5(text), 2, 1))) % 100 AS b,
        |    regexp_replace(text, '^\s+|\s+$', '', 'g') AS tt,
        |    regexp_extract_all(text, '\S+') AS t
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, b, unnest(CASE WHEN len(t) >= 5
        |    THEN list_distinct(list_transform(generate_series(1, len(t) - 4),
        |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]))
        |    ELSE [tt] END) AS g
        |  FROM s),
        |flagged AS (
        |  SELECT DISTINCT tr.doc_id
        |  FROM grams tr JOIN grams ev ON tr.g = ev.g
        |  WHERE tr.b < 90 AND ev.b >= 95)
        |SELECT doc_id, lang, source FROM s
        |WHERE b < 90 AND doc_id NOT IN (SELECT doc_id FROM flagged)""".stripMargin,

    "q71_dedup_keep_best" ->
      (DedupCcCte + ",\n" + """m AS (
        |  SELECT d.doc_id, coalesce(c.canonical_id, d.doc_id) AS canonical_id
        |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id),
        |f AS (
        |  SELECT doc_id,
        |    length(text) AS L,
        |    length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS n_alpha,
        |    length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
        |    len(regexp_extract_all(text, '\S+')) AS n_tokens,
        |    len(regexp_extract_all(lower(text), '\b(the|a|of|and|in|to)\b')) AS n_stop
        |  FROM documents),
        |q AS (
        |  SELECT doc_id, round(least(1.0, greatest(0.0,
        |    0.5 * (n_alpha::DOUBLE / nullif(L, 0)::DOUBLE) +
        |    0.3 * least(1.0, (n_stop::DOUBLE / nullif(n_tokens, 0)::DOUBLE) * 4) +
        |    0.2 * least(1.0, n_tokens::DOUBLE / 64.0) -
        |    (n_digit::DOUBLE / nullif(L, 0)::DOUBLE))), 4) AS quality
        |  FROM f)
        |SELECT m.doc_id, m.canonical_id, q.quality,
        |  row_number() OVER (PARTITION BY m.canonical_id
        |                     ORDER BY q.quality DESC, m.doc_id ASC) = 1 AS keep
        |FROM m JOIN q ON m.doc_id = q.doc_id""".stripMargin),

    "q72_dedup_stats" ->
      (DedupCcCte + ",\n" + """m AS (
        |  SELECT d.doc_id, coalesce(c.canonical_id, d.doc_id) AS canonical_id
        |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id),
        |cs AS (
        |  SELECT canonical_id, count(*) AS cluster_size FROM m GROUP BY canonical_id)
        |SELECT cluster_size, count(*) AS n_clusters,
        |  (sum(cluster_size) - count(*))::BIGINT AS n_removed
        |FROM cs GROUP BY cluster_size""".stripMargin),

    "q73_clean_corpus" ->
      (CleanCorpusCtes +
      """
        |SELECT doc_id, lang, source FROM sdoc
        |WHERE b < 90
        |  AND doc_id NOT IN (SELECT doc_id FROM flagged)
        |  AND doc_id IN (SELECT doc_id FROM kb WHERE keep)
        |  AND doc_id IN (SELECT doc_id FROM gf WHERE pass)""".stripMargin),

    // the decision-table view of the same pipeline: every gate's verdict
    // per document plus the final conjunction (q73's WITH chain, boolean
    // tail instead of the inner-join filter)
    "q175_curation_decision" ->
      (CleanCorpusCtes +
      """
        |SELECT s.doc_id,
        |  (s.b < 90) AS in_train,
        |  gf.pass AS gopher_ok,
        |  kb.keep AS dedup_keep,
        |  s.doc_id NOT IN (SELECT doc_id FROM flagged) AS decontaminated,
        |  ((s.b < 90) AND gf.pass AND kb.keep
        |    AND s.doc_id NOT IN (SELECT doc_id FROM flagged)) AS keep_final
        |FROM sdoc s
        |JOIN gf ON gf.doc_id = s.doc_id
        |JOIN kb ON kb.doc_id = s.doc_id""".stripMargin),

    // BM25 constants appear as decimal literals cast ::DOUBLE so both
    // engines parse the identical double (DuckDB otherwise types 2.2 as
    // DECIMAL and runs exact-decimal arithmetic the Spark side can't match)
    "q176_bm25_topk" -> Bm25ScratchSql,

    // the persisted-inverted-index gate: the index is built+extended over
    // exactly the documents corpus, so index-served BM25 must reproduce
    // the from-scratch computation — same oracle text as q176
    "q179_lex_index" -> Bm25ScratchSql,

    // the q171/q167 no-answer-change pattern: compaction of all three
    // lexical index tables must not change a single BM25 answer
    "q180_lex_compaction" -> Bm25ScratchSql,

    // α=0.5 temperature mixture: ⌊√n⌋ weights make the α-power integer-
    // exact; rates are pure integer basis points; keep hashes content
    "q181_temperature_mixture" ->
      """WITH dd AS (
        |  SELECT doc_id, source, text, substring(source, 1, 4) AS domain
        |  FROM documents),
        |n AS (SELECT domain, count(*) AS n_domain FROM dd GROUP BY domain),
        |w AS (SELECT domain, n_domain,
        |  floor(sqrt(n_domain::DOUBLE))::BIGINT AS w FROM n),
        |s AS (SELECT sum(w)::BIGINT AS sw, sum(n_domain)::BIGINT AS total FROM w),
        |r AS (
        |  SELECT domain, n_domain, w,
        |    least(10000, ((total // 2) * w * 10000) // (sw * n_domain))::BIGINT AS r_bp
        |  FROM w CROSS JOIN s)
        |SELECT d.doc_id, d.source, d.domain, r.n_domain, r.w, r.r_bp,
        |  ((((ascii(substring(md5(d.text), 1, 1)) * 256 +
        |      ascii(substring(md5(d.text), 2, 1))) * 256 +
        |      ascii(substring(md5(d.text), 3, 1))) * 256 +
        |      ascii(substring(md5(d.text), 4, 1))) % 10000) < r.r_bp AS keep
        |FROM dd d JOIN r USING (domain)""".stripMargin,

    // RRF fuses q176's BM25 ranking (top-100) with an exact-cosine
    // query-by-example ranking (vec_id<3 as examples, self excluded);
    // ranks are integers and 1/(60+r) a single exact IEEE division, so the
    // fused score is bit-identical across engines without rounding tricks
    "q177_hybrid_rrf" ->
      """WITH queries(query_id, term) AS (VALUES
        |  (0,'stream'),(0,'table'),(0,'hash'),
        |  (1,'customer'),(1,'order'),(1,'join'),
        |  (2,'window'),(2,'batch'),(2,'spark')),
        |toks AS (
        |  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS term
        |  FROM documents),
        |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
        |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        |tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM toks
        |  WHERE term IN (SELECT DISTINCT term FROM queries)
        |  GROUP BY doc_id, term),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |scored AS (
        |  SELECT q.query_id, t.doc_id,
        |    round(sum(
        |      ln((s.n_docs - f.df + 0.5::DOUBLE) / (f.df + 0.5::DOUBLE) + 1.0::DOUBLE)
        |        * (t.tf * 2.2::DOUBLE)
        |        / (t.tf + 1.2::DOUBLE * (0.25::DOUBLE + 0.75::DOUBLE * d.dl / s.avgdl))), 4)
        |      AS score
        |  FROM tf t JOIN dfreq f USING (term) JOIN dl d USING (doc_id)
        |  CROSS JOIN stats s JOIN queries q USING (term)
        |  GROUP BY q.query_id, t.doc_id),
        |lex AS (
        |  SELECT query_id, doc_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS lex_rn
        |  FROM scored QUALIFY lex_rn <= 100),
        |qv AS (
        |  SELECT vec_id::INT AS query_id, embedding::DOUBLE[] AS qv
        |  FROM embeddings WHERE vec_id < 3),
        |sem AS (
        |  SELECT query_id, doc_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, doc_id) AS sem_rn
        |  FROM (
        |    SELECT q.query_id, c.vec_id AS doc_id,
        |      list_cosine_similarity(q.qv, c.embedding::DOUBLE[]) AS sim
        |    FROM qv q CROSS JOIN embeddings c WHERE c.vec_id <> q.query_id)
        |  QUALIFY sem_rn <= 100),
        |fused AS (
        |  SELECT coalesce(l.query_id, s.query_id) AS query_id,
        |    coalesce(l.doc_id, s.doc_id) AS doc_id, l.lex_rn, s.sem_rn,
        |    coalesce(1.0::DOUBLE / (60 + l.lex_rn), 0.0::DOUBLE)
        |      + coalesce(1.0::DOUBLE / (60 + s.sem_rn), 0.0::DOUBLE) AS rrf
        |  FROM lex l FULL OUTER JOIN sem s
        |    ON l.query_id = s.query_id AND l.doc_id = s.doc_id)
        |SELECT query_id, doc_id,
        |  coalesce(lex_rn, 0)::INT AS lex_rn, coalesce(sem_rn, 0)::INT AS sem_rn,
        |  round(rrf, 6) AS rrf,
        |  row_number() OVER (PARTITION BY query_id ORDER BY rrf DESC, doc_id)::INT AS rn
        |FROM fused
        |QUALIFY rn <= 10""".stripMargin,

    "q178_mmr_rerank" -> mmrOracle(5),

    // repeated spans: dup 10-gram start positions merged to maximal spans
    // by gaps-and-islands with gap tolerance n; all-integer outputs
    "q183_repeated_spans" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(text, '\S+') AS ts FROM documents),
        |grams AS (
        |  SELECT doc_id, u['pos'] AS pos, u['g'] AS g FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(ts) - 8),
        |      i -> {'pos': i, 'g': array_to_string(ts[i:i+9], ' ')})) AS u
        |    FROM toks)),
        |dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
        |hits AS (
        |  SELECT doc_id, pos,
        |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 10
        |         THEN 1 ELSE 0 END AS newisl
        |  FROM grams JOIN dup USING (g)),
        |isl AS (
        |  SELECT doc_id, pos,
        |    sum(newisl) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM hits),
        |spans AS (
        |  SELECT doc_id, island, min(pos) AS s, max(pos) + 9 AS e
        |  FROM isl GROUP BY doc_id, island),
        |agg AS (
        |  SELECT doc_id, count(*)::BIGINT AS n_spans,
        |    sum(e - s + 1)::BIGINT AS span_tokens
        |  FROM spans GROUP BY doc_id),
        |nt AS (SELECT doc_id, len(regexp_extract_all(text, '\S+'))::BIGINT AS n_tokens
        |  FROM documents)
        |SELECT a.doc_id, a.n_spans, a.span_tokens, nt.n_tokens,
        |  ((a.span_tokens * 10000) // nt.n_tokens)::BIGINT AS span_frac_bp
        |FROM agg a JOIN nt USING (doc_id)""".stripMargin,

    // vocabulary drift: integer basis-point OOV mass + top-20 rate shift,
    // two legs so both decision branches (keep / rebuild) are stated
    "q182_vocab_drift" ->
      """WITH d AS (
        |  SELECT doc_id, text,
        |    (ascii(substring(md5(text), 1, 1)) * 256 +
        |     ascii(substring(md5(text), 2, 1))) % 100 AS cb
        |  FROM documents),
        |ref AS (SELECT text FROM d WHERE cb >= 10),
        |org AS (SELECT text FROM d WHERE cb < 10),
        |shf AS (SELECT regexp_replace(text, '(\S+)', 'zz\1', 'g') AS text FROM org),
        |tac AS (
        |  SELECT term, count(*) AS na FROM (
        |    SELECT unnest(regexp_extract_all(text, '\S+')) AS term FROM ref)
        |  GROUP BY term),
        |tota AS (SELECT sum(na)::BIGINT AS tota FROM tac),
        |top AS (SELECT term, na FROM tac ORDER BY na DESC, term LIMIT 20),
        |tbo AS (
        |  SELECT term, count(*) AS nb FROM (
        |    SELECT unnest(regexp_extract_all(text, '\S+')) AS term FROM org)
        |  GROUP BY term),
        |totbo AS (SELECT coalesce(sum(nb), 0)::BIGINT AS totb FROM tbo),
        |oovo AS (SELECT coalesce(sum(nb), 0)::BIGINT AS oov FROM tbo
        |  WHERE term NOT IN (SELECT term FROM tac)),
        |shio AS (
        |  SELECT sum(abs((na * 10000) // tota - (coalesce(nb, 0) * 10000) // totb))::BIGINT AS l1_bp,
        |    max(abs((na * 10000) // tota - (coalesce(nb, 0) * 10000) // totb))::BIGINT AS max_delta_bp
        |  FROM top LEFT JOIN tbo USING (term) CROSS JOIN tota CROSS JOIN totbo),
        |tbs AS (
        |  SELECT term, count(*) AS nb FROM (
        |    SELECT unnest(regexp_extract_all(text, '\S+')) AS term FROM shf)
        |  GROUP BY term),
        |totbs AS (SELECT coalesce(sum(nb), 0)::BIGINT AS totb FROM tbs),
        |oovs AS (SELECT coalesce(sum(nb), 0)::BIGINT AS oov FROM tbs
        |  WHERE term NOT IN (SELECT term FROM tac)),
        |shis AS (
        |  SELECT sum(abs((na * 10000) // tota - (coalesce(nb, 0) * 10000) // totb))::BIGINT AS l1_bp,
        |    max(abs((na * 10000) // tota - (coalesce(nb, 0) * 10000) // totb))::BIGINT AS max_delta_bp
        |  FROM top LEFT JOIN tbs USING (term) CROSS JOIN tota CROSS JOIN totbs)
        |SELECT 'organic' AS leg, tota AS n_ref_tokens, totb AS n_batch_tokens,
        |  ((oov * 10000) // totb)::BIGINT AS oov_bp, l1_bp, max_delta_bp,
        |  ((oov * 10000) // totb > 2000 OR l1_bp > 2000) AS rebuild
        |FROM tota CROSS JOIN totbo CROSS JOIN oovo CROSS JOIN shio
        |UNION ALL
        |SELECT 'shifted' AS leg, tota, totb,
        |  ((oov * 10000) // totb)::BIGINT, l1_bp, max_delta_bp,
        |  ((oov * 10000) // totb > 2000 OR l1_bp > 2000)
        |FROM tota CROSS JOIN totbs CROSS JOIN oovs CROSS JOIN shis""".stripMargin,

    // span scrub: every duplicated 10-gram keeps only its minimal-doc_id
    // owner's occurrence; other docs lose the gram's n-token cover and
    // reassemble (string_agg ORDER BY position = array_sort collect_list)
    "q185_span_scrub" ->
      """WITH toks0 AS (
        |  SELECT doc_id, regexp_extract_all(text, '\S+') AS ts FROM documents),
        |grams AS (
        |  SELECT doc_id, u['pos'] AS pos, u['g'] AS g FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(ts) - 8),
        |      i -> {'pos': i, 'g': array_to_string(ts[i:i+9], ' ')})) AS u
        |    FROM toks0)),
        |own AS (
        |  SELECT g, min(doc_id) AS owner FROM grams GROUP BY g HAVING count(*) >= 2),
        |marked AS (
        |  SELECT DISTINCT gr.doc_id, cov.ti AS ti
        |  FROM grams gr JOIN own USING (g),
        |    unnest(range(gr.pos, gr.pos + 10)) AS cov(ti)
        |  WHERE gr.doc_id > own.owner),
        |toks AS (
        |  SELECT doc_id, u['ti'] AS ti, u['tok'] AS tok FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(ts) + 1),
        |      i -> {'ti': i, 'tok': ts[i]})) AS u
        |    FROM toks0)),
        |kept AS (
        |  SELECT t.doc_id, t.ti, t.tok FROM toks t
        |  WHERE NOT EXISTS (SELECT 1 FROM marked m
        |    WHERE m.doc_id = t.doc_id AND m.ti = t.ti)),
        |kagg AS (
        |  SELECT doc_id, count(*)::BIGINT AS n_after,
        |    string_agg(tok, ' ' ORDER BY ti) AS text_clean
        |  FROM kept GROUP BY doc_id),
        |chg AS (SELECT DISTINCT doc_id FROM marked),
        |bef AS (SELECT doc_id, len(ts)::BIGINT AS n_before FROM toks0)
        |SELECT c.doc_id, b.n_before,
        |  coalesce(k.n_after, 0)::BIGINT AS n_after,
        |  coalesce(k.text_clean, '') AS text_clean
        |FROM chg c JOIN bef b USING (doc_id) LEFT JOIN kagg k USING (doc_id)""".stripMargin,

    // lexical-vs-semantic top-k agreement: the q177 legs bound at k=10,
    // full-outer merged, per-query intersection in basis points
    "q196_retrieval_agreement" ->
      """WITH queries(query_id, term) AS (VALUES
        |  (0,'stream'),(0,'table'),(0,'hash'),
        |  (1,'customer'),(1,'order'),(1,'join'),
        |  (2,'window'),(2,'batch'),(2,'spark')),
        |toks AS (
        |  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS term
        |  FROM documents),
        |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
        |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        |tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM toks
        |  WHERE term IN (SELECT DISTINCT term FROM queries)
        |  GROUP BY doc_id, term),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |scored AS (
        |  SELECT q.query_id, t.doc_id,
        |    round(sum(
        |      ln((s.n_docs - f.df + 0.5::DOUBLE) / (f.df + 0.5::DOUBLE) + 1.0::DOUBLE)
        |        * (t.tf * 2.2::DOUBLE)
        |        / (t.tf + 1.2::DOUBLE * (0.25::DOUBLE + 0.75::DOUBLE * d.dl / s.avgdl))), 4)
        |      AS score
        |  FROM tf t JOIN dfreq f USING (term) JOIN dl d USING (doc_id)
        |  CROSS JOIN stats s JOIN queries q USING (term)
        |  GROUP BY q.query_id, t.doc_id),
        |lex AS (
        |  SELECT query_id, doc_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS lex_rn
        |  FROM scored QUALIFY lex_rn <= 10),
        |qv AS (
        |  SELECT vec_id::INT AS query_id, embedding::DOUBLE[] AS qv
        |  FROM embeddings WHERE vec_id < 3),
        |sem AS (
        |  SELECT query_id, doc_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, doc_id) AS sem_rn
        |  FROM (
        |    SELECT q.query_id, c.vec_id AS doc_id,
        |      list_cosine_similarity(q.qv, c.embedding::DOUBLE[]) AS sim
        |    FROM qv q CROSS JOIN embeddings c WHERE c.vec_id <> q.query_id)
        |  QUALIFY sem_rn <= 10)
        |SELECT coalesce(l.query_id, s.query_id) AS query_id,
        |  sum(CASE WHEN l.doc_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_lex,
        |  sum(CASE WHEN s.doc_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_sem,
        |  sum(CASE WHEN l.doc_id IS NOT NULL AND s.doc_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_both,
        |  (sum(CASE WHEN l.doc_id IS NOT NULL AND s.doc_id IS NOT NULL THEN 1 ELSE 0 END) * 10000 // 10)::BIGINT AS overlap_bp
        |FROM lex l FULL OUTER JOIN sem s
        |  ON l.query_id = s.query_id AND l.doc_id = s.doc_id
        |GROUP BY 1""".stripMargin,

    // contamination-method agreement: three flagged-train-doc sets
    // (exact 5-gram / containment>=0.5 / near-dup train-test straddle),
    // counts + overlap vs the exact reference set
    "q195_contamination_agreement" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    (ascii(substring(md5(text), 1, 1)) * 256 +
        |     ascii(substring(md5(text), 2, 1))) % 100 AS b,
        |    regexp_replace(text, '^\s+|\s+$', '', 'g') AS tt,
        |    regexp_extract_all(text, '\S+') AS t
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, b, unnest(CASE WHEN len(t) >= 5
        |    THEN list_distinct(list_transform(generate_series(1, len(t) - 4),
        |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]))
        |    ELSE [tt] END) AS g
        |  FROM s),
        |ev AS (SELECT doc_id AS eval_id, g FROM grams WHERE b >= 95),
        |evn AS (SELECT eval_id, count(*) AS n_eval FROM ev GROUP BY 1),
        |tr AS (SELECT doc_id AS train_id, g FROM grams WHERE b < 90),
        |exact AS (SELECT DISTINCT train_id FROM tr JOIN ev USING (g)),
        |j AS (SELECT train_id, eval_id, count(*)::BIGINT AS n_shared
        |      FROM tr JOIN ev USING (g) GROUP BY 1, 2),
        |cont AS (
        |  SELECT DISTINCT train_id FROM j JOIN evn USING (eval_id)
        |  WHERE round(n_shared::DOUBLE / n_eval, 4) >= 0.5),
        |wsh AS (
        |  SELECT doc_id, b, list_distinct(
        |    CASE WHEN len(t) >= 3
        |         THEN list_transform(range(1, len(t) - 1),
        |                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
        |         ELSE [tt] END) AS sh
        |  FROM s),
        |wx AS MATERIALIZED (SELECT doc_id, b, len(sh) AS ln, unnest(sh) AS g3 FROM wsh),
        |wpair AS MATERIALIZED (
        |  SELECT x.doc_id AS da, x.b AS ba, y.doc_id AS db, y.b AS bb
        |  FROM wx x JOIN wx y ON x.g3 = y.g3 AND x.doc_id < y.doc_id
        |  GROUP BY x.doc_id, x.b, y.doc_id, y.b, x.ln, y.ln
        |  HAVING round(count(*)::DOUBLE / nullif(x.ln + y.ln - count(*), 0)::DOUBLE, 4) >= 0.6),
        |strad AS (
        |  SELECT DISTINCT CASE WHEN ba < 90 THEN da ELSE db END AS train_id
        |  FROM wpair
        |  WHERE (ba < 90 AND bb >= 95) OR (ba >= 95 AND bb < 90))
        |SELECT 'exact_5gram' AS method, count(*)::BIGINT AS n_flagged,
        |  coalesce(sum(CASE WHEN e.train_id IS NOT NULL THEN 1 ELSE 0 END), 0)::BIGINT AS overlap_exact
        |FROM exact m LEFT JOIN exact e ON m.train_id = e.train_id
        |UNION ALL
        |SELECT 'containment_0_5', count(*)::BIGINT,
        |  coalesce(sum(CASE WHEN e.train_id IS NOT NULL THEN 1 ELSE 0 END), 0)::BIGINT
        |FROM cont m LEFT JOIN exact e ON m.train_id = e.train_id
        |UNION ALL
        |SELECT 'neardup_straddle', count(*)::BIGINT,
        |  coalesce(sum(CASE WHEN e.train_id IS NOT NULL THEN 1 ELSE 0 END), 0)::BIGINT
        |FROM strad m LEFT JOIN exact e ON m.train_id = e.train_id""".stripMargin,

    // per-source data card: Gopher pass rate + near-dup rate in basis
    // points over the q73 WITH chain, one source-keyed aggregate
    "q194_source_profile" ->
      (CleanCorpusCtes +
      """,
        |tk AS (SELECT doc_id, source,
        |  len(regexp_extract_all(text, '\S+'))::BIGINT AS n_tok FROM documents)
        |SELECT tk.source, count(*)::BIGINT AS n_docs, sum(tk.n_tok)::BIGINT AS n_tokens,
        |  (sum(CASE WHEN gf.pass THEN 1 ELSE 0 END) * 10000 // count(*))::BIGINT AS quality_bp,
        |  (sum(CASE WHEN kb.keep THEN 0 ELSE 1 END) * 10000 // count(*))::BIGINT AS dup_bp
        |FROM tk JOIN gf USING (doc_id) JOIN kb USING (doc_id)
        |GROUP BY tk.source""".stripMargin),

    // the funnel: cumulative-conjunction counts through every curation
    // gate (q175's chain) with q181's mixture as the final stage
    "q184_pipeline_funnel" ->
      (CleanCorpusCtes +
      """,
        |tokc AS (SELECT doc_id, len(regexp_extract_all(text, '\S+'))::BIGINT AS n_tokens
        |  FROM documents),
        |dd2 AS (SELECT doc_id, text, substring(source, 1, 4) AS domain FROM documents),
        |nn AS (SELECT domain, count(*) AS n_domain FROM dd2 GROUP BY domain),
        |ww AS (SELECT domain, n_domain, floor(sqrt(n_domain::DOUBLE))::BIGINT AS w FROM nn),
        |ss AS (SELECT sum(w)::BIGINT AS sw, sum(n_domain)::BIGINT AS total FROM ww),
        |rr AS (SELECT domain,
        |    least(10000, ((total // 2) * w * 10000) // (sw * n_domain))::BIGINT AS r_bp
        |  FROM ww CROSS JOIN ss),
        |tmp AS (
        |  SELECT d.doc_id,
        |    ((((ascii(substring(md5(d.text), 1, 1)) * 256 +
        |        ascii(substring(md5(d.text), 2, 1))) * 256 +
        |        ascii(substring(md5(d.text), 3, 1))) * 256 +
        |        ascii(substring(md5(d.text), 4, 1))) % 10000) < r.r_bp AS temp_keep
        |  FROM dd2 d JOIN rr r USING (domain)),
        |fl AS (
        |  SELECT s.doc_id, t.n_tokens,
        |    (s.b < 90) AS s1,
        |    ((s.b < 90) AND gf.pass) AS s2,
        |    ((s.b < 90) AND gf.pass AND kb.keep) AS s3,
        |    ((s.b < 90) AND gf.pass AND kb.keep
        |      AND s.doc_id NOT IN (SELECT doc_id FROM flagged)) AS s4,
        |    ((s.b < 90) AND gf.pass AND kb.keep
        |      AND s.doc_id NOT IN (SELECT doc_id FROM flagged) AND tm.temp_keep) AS s5
        |  FROM sdoc s
        |  JOIN gf ON gf.doc_id = s.doc_id
        |  JOIN kb ON kb.doc_id = s.doc_id
        |  JOIN tokc t ON t.doc_id = s.doc_id
        |  JOIN tmp tm ON tm.doc_id = s.doc_id)
        |SELECT count(*)::BIGINT AS docs_raw, sum(n_tokens)::BIGINT AS tokens_raw,
        |  sum(CASE WHEN s1 THEN 1 ELSE 0 END)::BIGINT AS docs_train,
        |  sum(CASE WHEN s1 THEN n_tokens ELSE 0 END)::BIGINT AS tokens_train,
        |  sum(CASE WHEN s2 THEN 1 ELSE 0 END)::BIGINT AS docs_quality,
        |  sum(CASE WHEN s2 THEN n_tokens ELSE 0 END)::BIGINT AS tokens_quality,
        |  sum(CASE WHEN s3 THEN 1 ELSE 0 END)::BIGINT AS docs_dedup,
        |  sum(CASE WHEN s3 THEN n_tokens ELSE 0 END)::BIGINT AS tokens_dedup,
        |  sum(CASE WHEN s4 THEN 1 ELSE 0 END)::BIGINT AS docs_decontam,
        |  sum(CASE WHEN s4 THEN n_tokens ELSE 0 END)::BIGINT AS tokens_decontam,
        |  sum(CASE WHEN s5 THEN 1 ELSE 0 END)::BIGINT AS docs_final,
        |  sum(CASE WHEN s5 THEN n_tokens ELSE 0 END)::BIGINT AS tokens_final
        |FROM fl""".stripMargin),

    "q77_pii_scrub" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    text || ' Contact: user' || doc_id::VARCHAR || '@example.com or +1-555-' ||
        |    lpad((doc_id % 10000)::VARCHAR, 4, '0') ||
        |    ' at https://example.com/u/' || doc_id::VARCHAR AS t
        |  FROM documents)
        |SELECT doc_id,
        | len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT AS n_emails,
        | len(regexp_extract_all(t, '\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}'))::BIGINT AS n_phones,
        | len(regexp_extract_all(t, 'https?://[^\s]+'))::BIGINT AS n_urls,
        | regexp_replace(regexp_replace(regexp_replace(t,
        |   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |   '\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
        |   'https?://[^\s]+', '<URL>', 'g') AS scrubbed
        |FROM s""".stripMargin,

    "q78_bloom_decontamination" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    (ascii(substring(md5(text), 1, 1)) * 256 +
        |     ascii(substring(md5(text), 2, 1))) % 100 AS b,
        |    regexp_replace(text, '^\s+|\s+$', '', 'g') AS tt,
        |    regexp_extract_all(text, '\S+') AS t
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, b, unnest(CASE WHEN len(t) >= 5
        |    THEN list_distinct(list_transform(generate_series(1, len(t) - 4),
        |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]))
        |    ELSE [tt] END) AS g
        |  FROM s),
        |flagged AS (
        |  SELECT DISTINCT tr.doc_id
        |  FROM grams tr JOIN grams ev ON tr.g = ev.g
        |  WHERE tr.b < 90 AND ev.b >= 95)
        |SELECT count(*) AS n_flagged_exact, true AS superset_ok, true AS fp_bounded
        |FROM flagged""".stripMargin,

    "q79_span_dedup" ->
      """WITH wt AS (
        |  SELECT doc_id, regexp_replace(text, '^\s+|\s+$', '', 'g') AS tt,
        |    regexp_extract_all(text, '\S+') AS t FROM documents),
        |cp AS (
        |  SELECT doc_id, tt, t,
        |    list_filter(generate_series(1, len(t)),
        |      i -> substring(md5(t[i]), 1, 1) = '0') AS cps
        |  FROM wt),
        |ch AS (
        |  SELECT doc_id, unnest(CASE WHEN len(cps) >= 2
        |    THEN list_distinct(list_transform(generate_series(1, len(cps) - 1),
        |      j -> array_to_string(list_slice(t, cps[j], cps[j+1] - 1), ' ')))
        |    ELSE [tt] END) AS chunk
        |  FROM cp),
        |dfreq AS (SELECT chunk, count(*) AS df FROM ch GROUP BY chunk)
        |SELECT ch.doc_id, count(*) AS n_chunks,
        | sum(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dup_chunks,
        | round(sum(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END)::DOUBLE / count(*), 4) AS dup_frac
        |FROM ch JOIN dfreq d USING (chunk)
        |GROUP BY ch.doc_id""".stripMargin,

    "q80_revenue_trend" ->
      """WITH m AS (
        |  SELECT date_trunc('month', o_orderdate)::DATE AS month,
        |    round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
        |  FROM orders GROUP BY 1)
        |SELECT month, revenue, n_orders,
        | round(avg(revenue) OVER (ORDER BY month ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS mov_avg_3m,
        | round(revenue - lag(revenue, 1) OVER (ORDER BY month), 2) AS mom_delta,
        | round(cume_dist() OVER (ORDER BY month), 4) AS cum_pos
        |FROM m""".stripMargin,

    "q81_small_qty_revenue" ->
      """WITH cut AS (
        |  SELECT l_partkey, avg(l_quantity) * 0.2 AS qty_cut
        |  FROM lineitem GROUP BY 1)
        |SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly,
        | count(*) AS n_small
        |FROM lineitem l JOIN cut USING (l_partkey)
        |WHERE l.l_quantity < cut.qty_cut""".stripMargin,

    // window = 32, overlap = 8 ⇒ stride = 24; chunk boundaries are pure
    // integer arithmetic mirrored from TextStats.chunkDocuments
    "q82_doc_chunks" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM documents),
        |base AS (
        |  SELECT doc_id, t, greatest(len(t), 1) AS n_tok FROM toks),
        |ch AS (
        |  SELECT doc_id, t,
        |    unnest(generate_series(0,
        |      CASE WHEN n_tok <= 32 THEN 0 ELSE (n_tok - 32 + 23) // 24 END)) AS chunk_id
        |  FROM base)
        |SELECT doc_id, chunk_id::INT AS chunk_id,
        |  (chunk_id * 24)::BIGINT AS start_tok,
        |  len(t[chunk_id*24 + 1 : chunk_id*24 + 32])::BIGINT AS chunk_len,
        |  array_to_string(t[chunk_id*24 + 1 : chunk_id*24 + 32], ' ') AS chunk_text
        |FROM ch""".stripMargin,

    // d = 4 hash rows × width = 512; bucket = first four hex DIGITS of
    // md5("r:term") as a 16-bit value, mod width — mirrored from
    // TextStats.heavyHitters (hd() decodes one hex char to its digit value)
    "q83_heavy_hitters" ->
      """WITH toks AS (
        |  SELECT unnest(regexp_extract_all(text, '\S+')) AS term FROM documents),
        |cells AS (
        |  SELECT term, unnest(generate_series(0, 3)) AS r FROM toks),
        |hashed AS (
        |  SELECT r, term, md5(r::VARCHAR || ':' || term) AS h FROM cells),
        |bucketed AS (
        |  SELECT r, term,
        |    ((ascii(substring(h,1,1)) - 48 - CASE WHEN ascii(substring(h,1,1)) >= 97 THEN 39 ELSE 0 END) * 4096
        |   + (ascii(substring(h,2,1)) - 48 - CASE WHEN ascii(substring(h,2,1)) >= 97 THEN 39 ELSE 0 END) * 256
        |   + (ascii(substring(h,3,1)) - 48 - CASE WHEN ascii(substring(h,3,1)) >= 97 THEN 39 ELSE 0 END) * 16
        |   + (ascii(substring(h,4,1)) - 48 - CASE WHEN ascii(substring(h,4,1)) >= 97 THEN 39 ELSE 0 END)) % 512 AS b
        |  FROM hashed),
        |sketch AS (SELECT r, b, count(*) AS cnt FROM bucketed GROUP BY r, b),
        |total AS (SELECT count(*) AS n_total FROM toks),
        |exact_c AS (SELECT term, count(*) AS n_exact FROM toks GROUP BY term),
        |probed AS (SELECT DISTINCT term, r, b FROM bucketed),
        |est AS (
        |  SELECT p.term, min(s.cnt) AS n_est
        |  FROM probed p JOIN sketch s ON s.r = p.r AND s.b = p.b
        |  GROUP BY p.term)
        |SELECT term, n_exact, n_est,
        |  n_est >= n_exact AS no_undercount,
        |  (n_est - n_exact) * 512 <= n_total * 8 AS overcount_bounded
        |FROM est JOIN exact_c USING (term), total
        |WHERE n_est * 100 >= n_total""".stripMargin,

    // u from md5 bytes 3-4 (bytes 1-2 are contentBucket's); cost rounded to
    // 4 dp BEFORE ranking, doc_id tie-break — mirrored from
    // Sampling.weightedSample
    "q84_weighted_sample" ->
      """WITH w AS (
        |  SELECT doc_id, n_chars,
        |    ascii(substring(md5(text), 3, 1)) * 256 + ascii(substring(md5(text), 4, 1)) AS v
        |  FROM documents)
        |SELECT doc_id, n_chars AS weight,
        |  round(-ln((v + 1) / 26216.0) * 1e6 / n_chars, 4) AS cost
        |FROM w ORDER BY cost ASC, doc_id ASC LIMIT 50""".stripMargin,

    // TPC-H Q21 shape on this schema: returned line + EXISTS other supplier
    // + NOT EXISTS other returned supplier, mirrored from
    // Relational.blamedSuppliers
    "q89_blamed_suppliers" ->
      """WITH r AS (
        |  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
        |  WHERE l_returnflag = 'R')
        |SELECT l_suppkey, count(*) AS numwait
        |FROM r
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem l2
        |  WHERE l2.l_orderkey = r.l_orderkey AND l2.l_suppkey <> r.l_suppkey)
        |AND NOT EXISTS (
        |  SELECT 1 FROM lineitem l3
        |  WHERE l3.l_orderkey = r.l_orderkey AND l3.l_suppkey <> r.l_suppkey
        |    AND l3.l_returnflag = 'R')
        |GROUP BY l_suppkey
        |ORDER BY numwait DESC, l_suppkey ASC LIMIT 10""".stripMargin,

    // melt expressed as UNION ALL (portable across DuckDB versions);
    // metric order is irrelevant — the driver sorts rows before hashing
    "q90_returnflag_unpivot" ->
      """WITH wide AS (
        |  SELECT l_returnflag,
        |    round(sum(l_quantity), 2) AS sum_qty,
        |    round(sum(l_extendedprice), 2) AS sum_price,
        |    round(avg(l_discount), 4) AS avg_disc
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS val FROM wide
        |UNION ALL
        |SELECT l_returnflag, 'sum_price' AS metric, sum_price AS val FROM wide
        |UNION ALL
        |SELECT l_returnflag, 'avg_disc' AS metric, avg_disc AS val FROM wide""".stripMargin,

    "q86_sq_planted_recall" ->
      """SELECT count(*) AS n_queries, true AS planted_ok
        |FROM embeddings WHERE vec_id < 10""".stripMargin,

    "q88_ivfpq_planted_recall" ->
      """SELECT count(*) AS n_queries, true AS planted_ok
        |FROM embeddings WHERE vec_id < 10""".stripMargin,

    // IVF-SQ composition: deterministic planted-copy recall (q98 pins q97)
    "q98_ivfsq_planted_recall" ->
      """SELECT count(*) AS n_queries, true AS planted_ok
        |FROM embeddings WHERE vec_id < 10""".stripMargin,

    // perceptual-hash media dedup: planted perturbed-copy recall (pins q118)
    "q119_phash_planted_recall" ->
      """SELECT count(*) AS n_media, true AS planted_ok
        |FROM documents WHERE doc_id < 10""".stripMargin,

    // phrase search: token-boundary exact match (the oracle scans; the
    // Spark side proves index-pruned candidates + verify give the same set)
    "q120_phrase_search" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE contains(' ' || array_to_string(regexp_extract_all(text, '\S+'), ' ') || ' ',
        |  ' stream table hash ')""".stripMargin,

    // Zipf fit over the top-500 term frequencies; REGR_* in both engines
    "q121_zipf_fit" ->
      """WITH freq AS (
        |  SELECT unnest(regexp_extract_all(text, '\S+')) AS term FROM documents),
        |cnt AS (
        |  SELECT term, count(*) AS cnt FROM freq GROUP BY term
        |  ORDER BY cnt DESC, term ASC LIMIT 500),
        |ranked AS (
        |  SELECT cnt, row_number() OVER (ORDER BY cnt DESC, term ASC) AS rank FROM cnt)
        |SELECT count(*) AS n_terms,
        |  round(regr_slope(ln(cnt::DOUBLE), ln(rank::DOUBLE)), 4) AS zipf_slope,
        |  round(regr_intercept(ln(cnt::DOUBLE), ln(rank::DOUBLE)), 4) AS zipf_intercept,
        |  round(regr_r2(ln(cnt::DOUBLE), ln(rank::DOUBLE)), 4) AS r2
        |FROM ranked""".stripMargin,

    // session-scoped funnel: q12's session assignment + q92's stage
    // ordering, all within one session; epoch-second flooring throughout
    "q99_session_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, floor(epoch(ts))::BIGINT AS ts_s FROM events),
        |g AS (
        |  SELECT *, ts_s - lag(ts_s) OVER (PARTITION BY user_id ORDER BY ts_s, event_id) AS gap_s FROM e),
        |s AS (
        |  SELECT *, sum(CASE WHEN gap_s IS NULL OR gap_s > 1800 THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts_s, event_id ROWS UNBOUNDED PRECEDING)::BIGINT AS session_id
        |  FROM g),
        |w1 AS (
        |  SELECT *, min(CASE WHEN event_type = 'view' THEN ts_s END)
        |    OVER (PARTITION BY user_id, session_id) AS v_ts FROM s),
        |w2 AS (
        |  SELECT *, min(CASE WHEN event_type = 'click' AND ts_s >= v_ts THEN ts_s END)
        |    OVER (PARTITION BY user_id, session_id) AS c_ts FROM w1),
        |w3 AS (
        |  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts_s >= c_ts THEN ts_s END)
        |    OVER (PARTITION BY user_id, session_id) AS p_ts FROM w2),
        |sess AS (
        |  SELECT user_id, session_id, max(v_ts) AS v_ts, max(c_ts) AS c_ts, max(p_ts) AS p_ts
        |  FROM w3 GROUP BY user_id, session_id)
        |SELECT count(*) AS n_sessions,
        |  count(v_ts) AS n_view_sessions,
        |  count(c_ts) AS n_click_sessions,
        |  count(p_ts) AS n_purchase_sessions,
        |  round(count(c_ts)::DOUBLE / count(v_ts), 4) AS view_to_click,
        |  round(count(p_ts)::DOUBLE / count(c_ts), 4) AS click_to_purchase
        |FROM sess""".stripMargin,

    // freshness vs the corpus watermark (max ts anywhere) — deterministic,
    // no wall clock; staleness bar 3600 s
    "q100_source_freshness" ->
      """WITH e AS (
        |  SELECT event_type, floor(epoch(ts))::BIGINT AS ts_s FROM events),
        |wm AS (SELECT max(ts_s) AS watermark FROM e)
        |SELECT event_type, count(*) AS n_events, max(ts_s) AS last_ts,
        |  watermark - max(ts_s) AS lag_s,
        |  sum(CASE WHEN ts_s >= watermark - 86400 THEN 1 ELSE 0 END)::BIGINT AS n_last_24h,
        |  watermark - max(ts_s) > 3600 AS is_stale
        |FROM e CROSS JOIN wm GROUP BY event_type, watermark""".stripMargin,

    // per-language train/val mixture drift; Laplace-smoothed KL terms,
    // ln-parity at 4 dp (q60's rule); same content-hash split as q38
    "q101_split_drift" ->
      """WITH d AS (
        |  SELECT lang,
        |    CASE WHEN (ascii(substring(md5(text), 1, 1)) * 256 + ascii(substring(md5(text), 2, 1))) % 100 < 90 THEN 'train'
        |         WHEN (ascii(substring(md5(text), 1, 1)) * 256 + ascii(substring(md5(text), 2, 1))) % 100 < 95 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents),
        |counts AS (
        |  SELECT lang,
        |    sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS n_train,
        |    sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS n_val
        |  FROM d WHERE split IN ('train', 'val') GROUP BY lang),
        |tot AS (
        |  SELECT sum(n_train) AS tot_train, sum(n_val) AS tot_val, count(*) AS n_langs
        |  FROM counts),
        |p AS (
        |  SELECT lang, n_train, n_val,
        |    (n_train + 1)::DOUBLE / (tot_train + n_langs) AS p_train,
        |    (n_val + 1)::DOUBLE / (tot_val + n_langs) AS p_val
        |  FROM counts CROSS JOIN tot)
        |SELECT lang, n_train::BIGINT AS n_train, n_val::BIGINT AS n_val,
        |  round(p_train, 4) AS p_train, round(p_val, 4) AS p_val,
        |  round(p_train * ln(p_train / p_val), 4) AS kl_term
        |FROM p""".stripMargin,

    // dynamic-map explode over the JSON props payload
    "q91_props_map_explode" ->
      """WITH kv AS (
        |  SELECT event_type, unnest(json_keys(props::JSON)) AS prop_key, props
        |  FROM events)
        |SELECT event_type, prop_key, count(*) AS n,
        |  sum(json_extract(props::JSON, '$.' || prop_key)::VARCHAR::BIGINT)::BIGINT AS sum_value,
        |  round(avg(json_extract(props::JSON, '$.' || prop_key)::VARCHAR::BIGINT), 4) AS avg_value
        |FROM kv GROUP BY event_type, prop_key""".stripMargin,

    // ordered funnel: first view -> first click >= view -> first purchase
    // >= click; epoch-second flooring mirrors q12's precision rule
    "q92_conversion_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, floor(epoch(ts))::BIGINT AS ts_s FROM events),
        |v AS (SELECT user_id, min(ts_s) AS v_ts FROM e WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, min(ts_s) AS c_ts FROM e JOIN v USING (user_id)
        |  WHERE event_type = 'click' AND ts_s >= v_ts GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, min(ts_s) AS p_ts FROM e JOIN c USING (user_id)
        |  WHERE event_type = 'purchase' AND ts_s >= c_ts GROUP BY e.user_id)
        |SELECT (SELECT count(*) FROM v) AS n_view,
        |  (SELECT count(*) FROM c) AS n_click_after_view,
        |  (SELECT count(*) FROM p) AS n_purchase_after_click,
        |  round((SELECT count(*) FROM c)::DOUBLE / (SELECT count(*) FROM v), 4) AS view_to_click,
        |  round((SELECT count(*) FROM p)::DOUBLE / (SELECT count(*) FROM c), 4) AS click_to_purchase""".stripMargin,

    // ISO-Monday weeks in both engines; offset = day-diff / 7
    "q93_cohort_retention" ->
      """WITH e AS (
        |  SELECT user_id, date_trunc('week', ts)::DATE AS week FROM events),
        |cohorts AS (
        |  SELECT user_id, min(week) AS cohort_week FROM e GROUP BY user_id)
        |SELECT cohort_week,
        |  ((week - cohort_week) / 7)::INT AS week_offset,
        |  count(DISTINCT user_id) AS n_users
        |FROM e JOIN cohorts USING (user_id)
        |GROUP BY cohort_week, week_offset""".stripMargin,

    // one row per profiled column; min/max stringified in both engines
    "q94_column_profile" ->
      """WITH a AS (
        |  SELECT count(*) AS n_rows,
        |    sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS k_nulls,
        |    count(DISTINCT l_orderkey) AS k_distinct,
        |    min(l_orderkey)::VARCHAR AS k_min, max(l_orderkey)::VARCHAR AS k_max,
        |    sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END)::BIGINT AS q_nulls,
        |    count(DISTINCT l_quantity) AS q_distinct,
        |    min(l_quantity)::VARCHAR AS q_min, max(l_quantity)::VARCHAR AS q_max,
        |    sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END)::BIGINT AS f_nulls,
        |    count(DISTINCT l_returnflag) AS f_distinct,
        |    min(l_returnflag)::VARCHAR AS f_min, max(l_returnflag)::VARCHAR AS f_max,
        |    sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)::BIGINT AS d_nulls,
        |    count(DISTINCT l_shipdate) AS d_distinct,
        |    min(l_shipdate)::VARCHAR AS d_min, max(l_shipdate)::VARCHAR AS d_max
        |  FROM lineitem)
        |SELECT 'l_orderkey' AS "column", n_rows, k_nulls AS n_null,
        |  k_distinct AS n_distinct, k_min AS min_val, k_max AS max_val FROM a
        |UNION ALL SELECT 'l_quantity', n_rows, q_nulls, q_distinct, q_min, q_max FROM a
        |UNION ALL SELECT 'l_returnflag', n_rows, f_nulls, f_distinct, f_min, f_max FROM a
        |UNION ALL SELECT 'l_shipdate', n_rows, d_nulls, d_distinct, d_min, d_max FROM a""".stripMargin,

    // (first-3-tokens, length-band) blocking, then exact levenshtein
    "q95_fuzzy_neardup" ->
      ("WITH\n" + FuzzyEdgeCtes + "\n" +
      """SELECT fa.doc_id AS doc_a, fb.doc_id AS doc_b,
        |  levenshtein(fa.text, fb.text)::BIGINT AS lev,
        |  round(1.0 - levenshtein(fa.text, fb.text)::DOUBLE / greatest(fa.l, fb.l), 4) AS edit_sim
        |FROM fd fa JOIN fd fb ON fa.blk = fb.blk
        |  AND fa.doc_id < fb.doc_id AND abs(fa.l - fb.l) <= 30
        |WHERE round(1.0 - levenshtein(fa.text, fb.text)::DOUBLE / greatest(fa.l, fb.l), 4) >= 0.7""".stripMargin),

    // RANGE frame over the per-day aggregate: value-based 7-day bounds
    "q96_rolling_revenue" ->
      """WITH daily AS (
        |  SELECT o_orderdate::DATE AS day, round(sum(o_totalprice), 2) AS revenue,
        |    (o_orderdate::DATE - DATE '1970-01-01') AS day_num
        |  FROM orders GROUP BY 1, 3)
        |SELECT day, revenue,
        |  round(sum(revenue) OVER (ORDER BY day_num RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS rolling_7d
        |FROM daily""".stripMargin,

    // fixed-round CC over the UNION of the q25 and q95 edge sets
    "q122_ensemble_dedup" ->
      ("WITH\n" + ShingleCtes + ",\n" + JaccardPairCtes + ",\n" + FuzzyEdgeCtes + ",\n" +
      "e AS (SELECT a, b FROM ej UNION SELECT a, b FROM ef),\n" +
      minLabelCcCtes() + "\n" +
      """SELECT d.doc_id,
        |  coalesce(c.canonical_id, d.doc_id) AS canonical_id,
        |  coalesce(c.canonical_id, d.doc_id) = d.doc_id AS is_canonical
        |FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id""".stripMargin),

    // the correlated scalar subquery stated literally (Q2 shape); the Spark
    // side runs the decorrelated min-aggregate + join-back equivalent
    "q123_min_cost_supplier" ->
      """WITH u AS (
        |  SELECT l_partkey, l_suppkey, round(l_extendedprice / l_quantity, 4) AS unit_price
        |  FROM lineitem)
        |SELECT DISTINCT p.p_partkey, p.p_brand, s.s_name, n.n_name AS nation, u.unit_price
        |FROM part p
        |JOIN u ON u.l_partkey = p.p_partkey
        |JOIN supplier s ON u.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |WHERE p.p_type = 'PROMO' AND p.p_size < 15
        |  AND u.unit_price = (SELECT min(u2.unit_price) FROM u u2
        |                      WHERE u2.l_partkey = p.p_partkey)""".stripMargin,

    "q124_copurchase_pairs" ->
      """WITH op AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        |SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_orders
        |FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |GROUP BY 1, 2
        |ORDER BY n_orders DESC, part_a, part_b
        |LIMIT 20""".stripMargin,

    "q125_association_rules" ->
      """WITH op AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM op),
        |freq AS (SELECT l_partkey, count(*) AS n_part FROM op GROUP BY 1),
        |pairs AS (
        |  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_both
        |  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        |  GROUP BY 1, 2
        |  HAVING count(*) >= 3)
        |SELECT part_a, part_b, n_both, fa.n_part AS n_a, fb.n_part AS n_b,
        |  round(n_both::DOUBLE / fa.n_part, 4) AS confidence,
        |  round(n_both::DOUBLE * n.n_orders / (fa.n_part * fb.n_part), 4) AS lift
        |FROM pairs
        |JOIN freq fa ON pairs.part_a = fa.l_partkey
        |JOIN freq fb ON pairs.part_b = fb.l_partkey
        |CROSS JOIN n""".stripMargin,

    "q126_revenue_share" ->
      """WITH rev AS (
        |  SELECT r_name, n_name,
        |    round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY 1, 2),
        |rt AS (SELECT r_name, sum(revenue) AS region_rev FROM rev GROUP BY 1),
        |g AS (SELECT sum(revenue) AS total_rev FROM rev)
        |SELECT rev.r_name AS region, rev.n_name AS nation, rev.revenue,
        |  round(rev.revenue / rt.region_rev, 4) AS share_of_region,
        |  round(rev.revenue / g.total_rev, 4) AS share_of_total
        |FROM rev JOIN rt ON rev.r_name = rt.r_name CROSS JOIN g""".stripMargin,

    "q127_order_gap_stats" ->
      """WITH g AS (
        |  SELECT o_orderdate::DATE -
        |    lag(o_orderdate::DATE) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS gap_days
        |  FROM orders)
        |SELECT count(*) AS n_gaps,
        |  round(avg(gap_days), 4) AS mean_gap_days,
        |  round(quantile_cont(gap_days, 0.5), 4) AS p50_gap_days,
        |  round(quantile_cont(gap_days, 0.9), 4) AS p90_gap_days,
        |  max(gap_days)::INT AS max_gap_days
        |FROM g WHERE gap_days IS NOT NULL""".stripMargin,

    // quintile boundaries via the q109 pattern (quantile_cont ≡ Spark
    // percentile); the segment CASE mirrors the Spark side verbatim
    "q128_rfm_segments" ->
      """WITH wm AS (SELECT max(o_orderdate::DATE) AS watermark FROM orders),
        |pc AS (
        |  SELECT o_custkey,
        |    (wm.watermark - max(o_orderdate::DATE)) AS recency_days,
        |    count(*) AS frequency,
        |    round(sum(o_totalprice), 2) AS monetary
        |  FROM orders CROSS JOIN wm
        |  GROUP BY o_custkey, wm.watermark),
        |b AS (
        |  SELECT quantile_cont(recency_days, [0.2, 0.4, 0.6, 0.8]) AS rq,
        |    quantile_cont(frequency::DOUBLE, [0.2, 0.4, 0.6, 0.8]) AS fq,
        |    quantile_cont(monetary, [0.2, 0.4, 0.6, 0.8]) AS mq
        |  FROM pc),
        |s AS (
        |  SELECT o_custkey, recency_days, frequency, monetary,
        |    (6 - (1 + (CASE WHEN recency_days > rq[1] THEN 1 ELSE 0 END)
        |            + (CASE WHEN recency_days > rq[2] THEN 1 ELSE 0 END)
        |            + (CASE WHEN recency_days > rq[3] THEN 1 ELSE 0 END)
        |            + (CASE WHEN recency_days > rq[4] THEN 1 ELSE 0 END)))::INT AS r_score,
        |    (1 + (CASE WHEN frequency > fq[1] THEN 1 ELSE 0 END)
        |       + (CASE WHEN frequency > fq[2] THEN 1 ELSE 0 END)
        |       + (CASE WHEN frequency > fq[3] THEN 1 ELSE 0 END)
        |       + (CASE WHEN frequency > fq[4] THEN 1 ELSE 0 END))::INT AS f_score,
        |    (1 + (CASE WHEN monetary > mq[1] THEN 1 ELSE 0 END)
        |       + (CASE WHEN monetary > mq[2] THEN 1 ELSE 0 END)
        |       + (CASE WHEN monetary > mq[3] THEN 1 ELSE 0 END)
        |       + (CASE WHEN monetary > mq[4] THEN 1 ELSE 0 END))::INT AS m_score
        |  FROM pc CROSS JOIN b)
        |SELECT o_custkey, recency_days::INT AS recency_days, frequency, monetary,
        |  r_score, f_score, m_score,
        |  CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4 THEN 'champion'
        |       WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk'
        |       WHEN r_score >= 4 AND f_score <= 2 THEN 'recent'
        |       WHEN f_score <= 2 AND m_score <= 2 THEN 'low_value'
        |       ELSE 'regular' END AS segment
        |FROM s""".stripMargin,

    "q129_scd2_intervals" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, floor(epoch(ts))::BIGINT AS ts_s
        |  FROM events),
        |ch AS (
        |  SELECT *, lag(event_type) OVER (PARTITION BY user_id
        |    ORDER BY ts_s, event_id) AS prev_type
        |  FROM e),
        |k AS (
        |  SELECT user_id, event_id, event_type, ts_s FROM ch
        |  WHERE prev_type IS NULL OR prev_type <> event_type)
        |SELECT user_id,
        |  row_number() OVER w AS version,
        |  event_type AS state,
        |  ts_s AS valid_from,
        |  lead(ts_s) OVER w AS valid_to,
        |  (lead(ts_s) OVER w IS NULL) AS is_current
        |FROM k
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)""".stripMargin,

    // id-ordered enumeration (a<b<c): same count as the degree-ordered
    // orientation the Spark side uses for bounded wedge fan-out
    "q130_triangle_count" ->
      """WITH op AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e AS (
        |  SELECT a.l_partkey AS pa, b.l_partkey AS pb
        |  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2
        |  HAVING count(*) >= 2),
        |deg AS (
        |  SELECT node, count(*) AS deg FROM (
        |    SELECT pa AS node FROM e UNION ALL SELECT pb FROM e)
        |  GROUP BY 1),
        |stats AS (
        |  SELECT (SELECT count(*) FROM deg) AS n_nodes,
        |    (SELECT count(*) FROM e) AS n_edges,
        |    (SELECT sum(deg * (deg - 1) // 2) FROM deg)::BIGINT AS n_wedges,
        |    (SELECT count(*) FROM e e1
        |       JOIN e e2 ON e1.pb = e2.pa
        |       JOIN e e3 ON e1.pa = e3.pa AND e2.pb = e3.pb) AS n_triangles)
        |SELECT n_nodes, n_edges, n_wedges, n_triangles,
        |  round(3.0 * n_triangles / n_wedges, 4) AS global_clustering
        |FROM stats""".stripMargin,

    // interval×interval overlap stated as the direct range join; the Spark
    // side runs the day-binned equi-join decomposition of the same predicate
    "q131_maintenance_overlap" ->
      """WITH e AS (
        |  SELECT user_id, event_id, floor(epoch(ts))::BIGINT AS ts_s FROM events),
        |g AS (
        |  SELECT *, ts_s - lag(ts_s) OVER (PARTITION BY user_id ORDER BY ts_s, event_id) AS gap_s FROM e),
        |s AS (
        |  SELECT *, sum(CASE WHEN gap_s IS NULL OR gap_s > 1800 THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts_s, event_id ROWS UNBOUNDED PRECEDING)::BIGINT AS session_id
        |  FROM g),
        |sess AS (
        |  SELECT user_id, session_id, min(ts_s) AS sess_start, max(ts_s) AS sess_end
        |  FROM s GROUP BY 1, 2),
        |b AS (SELECT min(ts_s) // 86400 AS dmin, max(ts_s) // 86400 AS dmax FROM e),
        |w AS (
        |  SELECT unnest(generate_series(dmin, dmax)) AS day FROM b),
        |wi AS (
        |  SELECT day, day * 86400 AS win_start, day * 86400 + 3600 AS win_end FROM w)
        |SELECT wi.day, wi.win_start, count(*) AS n_sessions,
        |  sum(least(sess_end, win_end) - greatest(sess_start, win_start))::BIGINT AS overlap_s
        |FROM wi JOIN sess ON sess_start < win_end AND sess_end >= win_start
        |GROUP BY 1, 2""".stripMargin,

    // integer fixed-point PageRank, 5 iterations unrolled — floor division
    // and exact integer sums make Spark and DuckDB bitwise identical
    "q132_pagerank" ->
      """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e0 AS (
        |  SELECT a.l_partkey AS pa, b.l_partkey AS pb
        |  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |e AS (SELECT pa AS src, pb AS dst FROM e0 UNION ALL SELECT pb, pa FROM e0),
        |d AS (SELECT src, count(*)::BIGINT AS deg FROM e GROUP BY 1),
        |oe AS (SELECT e.src, e.dst, d.deg FROM e JOIN d USING (src)),
        |n AS (SELECT src AS node FROM d),
        |r0 AS (SELECT node, 1000000::BIGINT AS r FROM n),
        |c1 AS (SELECT oe.dst, sum(r.r // oe.deg)::BIGINT AS s FROM oe JOIN r0 r ON oe.src = r.node GROUP BY 1),
        |r1 AS (SELECT n.node, (150000 + (850 * coalesce(c.s, 0)) // 1000)::BIGINT AS r FROM n LEFT JOIN c1 c ON n.node = c.dst),
        |c2 AS (SELECT oe.dst, sum(r.r // oe.deg)::BIGINT AS s FROM oe JOIN r1 r ON oe.src = r.node GROUP BY 1),
        |r2 AS (SELECT n.node, (150000 + (850 * coalesce(c.s, 0)) // 1000)::BIGINT AS r FROM n LEFT JOIN c2 c ON n.node = c.dst),
        |c3 AS (SELECT oe.dst, sum(r.r // oe.deg)::BIGINT AS s FROM oe JOIN r2 r ON oe.src = r.node GROUP BY 1),
        |r3 AS (SELECT n.node, (150000 + (850 * coalesce(c.s, 0)) // 1000)::BIGINT AS r FROM n LEFT JOIN c3 c ON n.node = c.dst),
        |c4 AS (SELECT oe.dst, sum(r.r // oe.deg)::BIGINT AS s FROM oe JOIN r3 r ON oe.src = r.node GROUP BY 1),
        |r4 AS (SELECT n.node, (150000 + (850 * coalesce(c.s, 0)) // 1000)::BIGINT AS r FROM n LEFT JOIN c4 c ON n.node = c.dst),
        |c5 AS (SELECT oe.dst, sum(r.r // oe.deg)::BIGINT AS s FROM oe JOIN r4 r ON oe.src = r.node GROUP BY 1),
        |r5 AS (SELECT n.node, (150000 + (850 * coalesce(c.s, 0)) // 1000)::BIGINT AS r FROM n LEFT JOIN c5 c ON n.node = c.dst)
        |SELECT node, r AS rank_micro FROM r5""".stripMargin,

    // 12 peel rounds unrolled — extra rounds past the fixpoint are no-ops,
    // so the fixed count matches Spark's kCore(rounds = 12) by construction.
    // CTEs are MATERIALIZED: each round references the previous edge set 3×,
    // and DuckDB's default inlining would make the scan tree exponential.
    "q133_kcore" -> {
      val peels = (1 to 12).map { i =>
        s"""d$i AS MATERIALIZED (
           |  SELECT node, count(*) AS deg FROM (
           |    SELECT pa AS node FROM e${i - 1} UNION ALL SELECT pb FROM e${i - 1})
           |  GROUP BY 1),
           |e$i AS MATERIALIZED (
           |  SELECT pa, pb FROM e${i - 1}
           |  WHERE pa IN (SELECT node FROM d$i WHERE deg >= 3)
           |    AND pb IN (SELECT node FROM d$i WHERE deg >= 3))""".stripMargin
      }.mkString(",\n")
      s"""WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |e0 AS MATERIALIZED (
         |  SELECT a.l_partkey AS pa, b.l_partkey AS pb
         |  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         |  GROUP BY 1, 2 HAVING count(*) >= 2),
         |$peels
         |SELECT node, count(*)::BIGINT AS core_deg FROM (
         |  SELECT pa AS node FROM e12 UNION ALL SELECT pb FROM e12)
         |GROUP BY 1""".stripMargin
    },

    // q122's union extended with the exact brute-force cosine edge set
    // (vec_id ≡ doc_id); same fixed-round CC
    "q134_ensemble_full" ->
      ("WITH\n" + ShingleCtes + ",\n" + JaccardPairCtes + ",\n" + FuzzyEdgeCtes + ",\n" +
      """ec AS (
        |  SELECT ea.vec_id AS a, eb.vec_id AS b
        |  FROM embeddings ea JOIN embeddings eb ON ea.vec_id < eb.vec_id
        |  WHERE round(list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]), 4) >= 0.95),
        |e AS (SELECT a, b FROM ej UNION SELECT a, b FROM ef UNION SELECT a, b FROM ec),""".stripMargin + "\n" +
      minLabelCcCtes() + "\n" +
      """SELECT d.doc_id,
        |  coalesce(c.canonical_id, d.doc_id) AS canonical_id,
        |  coalesce(c.canonical_id, d.doc_id) = d.doc_id AS is_canonical
        |FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id""".stripMargin),

    "q135_attribution" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, value, floor(epoch(ts))::BIGINT AS ts_s FROM events),
        |g AS (
        |  SELECT *, ts_s - lag(ts_s) OVER (PARTITION BY user_id ORDER BY ts_s, event_id) AS gap_s FROM e),
        |s AS (
        |  SELECT *, sum(CASE WHEN gap_s IS NULL OR gap_s > 1800 THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts_s, event_id ROWS UNBOUNDED PRECEDING)::BIGINT AS session_id
        |  FROM g),
        |t AS (
        |  SELECT *,
        |    first_value(event_type) OVER (PARTITION BY user_id, session_id ORDER BY ts_s, event_id
        |      ROWS UNBOUNDED PRECEDING) AS first_touch,
        |    coalesce(lag(event_type) OVER (PARTITION BY user_id, session_id ORDER BY ts_s, event_id),
        |      'direct') AS last_touch
        |  FROM s)
        |SELECT first_touch, last_touch, count(*)::BIGINT AS n_purchases,
        |  round(sum(value), 2) AS revenue
        |FROM t WHERE event_type = 'purchase' GROUP BY 1, 2""".stripMargin,

    // q132 with co-purchase support as the edge weight; contribution is
    // (r·w) // W_u — identical integer floor semantics on both engines
    "q136_pagerank_weighted" ->
      """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e0 AS (
        |  SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*)::BIGINT AS w
        |  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |e AS (SELECT pa AS src, pb AS dst, w FROM e0 UNION ALL SELECT pb, pa, w FROM e0),
        |d AS (SELECT src, sum(w)::BIGINT AS wsum FROM e GROUP BY 1),
        |oe AS (SELECT e.src, e.dst, e.w, d.wsum FROM e JOIN d USING (src)),
        |n AS (SELECT src AS node FROM d),
        |r0 AS (SELECT node, 1000000::BIGINT AS r FROM n),
        |c1 AS (SELECT oe.dst, sum((r.r * oe.w) // oe.wsum)::BIGINT AS s FROM oe JOIN r0 r ON oe.src = r.node GROUP BY 1),
        |r1 AS (SELECT n.node, (150000 + (850 * coalesce(c.s, 0)) // 1000)::BIGINT AS r FROM n LEFT JOIN c1 c ON n.node = c.dst),
        |c2 AS (SELECT oe.dst, sum((r.r * oe.w) // oe.wsum)::BIGINT AS s FROM oe JOIN r1 r ON oe.src = r.node GROUP BY 1),
        |r2 AS (SELECT n.node, (150000 + (850 * coalesce(c.s, 0)) // 1000)::BIGINT AS r FROM n LEFT JOIN c2 c ON n.node = c.dst),
        |c3 AS (SELECT oe.dst, sum((r.r * oe.w) // oe.wsum)::BIGINT AS s FROM oe JOIN r2 r ON oe.src = r.node GROUP BY 1),
        |r3 AS (SELECT n.node, (150000 + (850 * coalesce(c.s, 0)) // 1000)::BIGINT AS r FROM n LEFT JOIN c3 c ON n.node = c.dst),
        |c4 AS (SELECT oe.dst, sum((r.r * oe.w) // oe.wsum)::BIGINT AS s FROM oe JOIN r3 r ON oe.src = r.node GROUP BY 1),
        |r4 AS (SELECT n.node, (150000 + (850 * coalesce(c.s, 0)) // 1000)::BIGINT AS r FROM n LEFT JOIN c4 c ON n.node = c.dst),
        |c5 AS (SELECT oe.dst, sum((r.r * oe.w) // oe.wsum)::BIGINT AS s FROM oe JOIN r4 r ON oe.src = r.node GROUP BY 1),
        |r5 AS (SELECT n.node, (150000 + (850 * coalesce(c.s, 0)) // 1000)::BIGINT AS r FROM n LEFT JOIN c5 c ON n.node = c.dst)
        |SELECT node, r AS rank_micro FROM r5""".stripMargin,

    // the oracle recomputes the view directly over the updated snapshot —
    // the Spark side must reach the identical table via the signed merge
    "q137_incremental_agg" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice::DECIMAL(18,2) AS price FROM orders),
        |base AS (SELECT * FROM o WHERE o_orderkey % 10 <> 0),
        |ins AS (SELECT * FROM o WHERE o_orderkey % 10 = 0),
        |net AS (
        |  SELECT * FROM base WHERE o_orderkey % 13 <> 0
        |  UNION ALL SELECT * FROM ins)
        |SELECT o_custkey, count(*)::BIGINT AS n_orders,
        |  sum(price)::DOUBLE AS total_spend
        |FROM net GROUP BY 1""".stripMargin,

    // personalized restart: seed term (150000·n)//|S| on Brand#1 parts,
    // zero elsewhere; initial mass likewise concentrated on the seeds
    "q138_pagerank_personalized" ->
      """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e0 AS (
        |  SELECT a.l_partkey AS pa, b.l_partkey AS pb
        |  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |e AS (SELECT pa AS src, pb AS dst FROM e0 UNION ALL SELECT pb, pa FROM e0),
        |d AS (SELECT src, count(*)::BIGINT AS deg FROM e GROUP BY 1),
        |oe AS (SELECT e.src, e.dst, d.deg FROM e JOIN d USING (src)),
        |sd AS (
        |  SELECT d.src AS node, p.p_partkey IS NOT NULL AS is_seed
        |  FROM d LEFT JOIN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#1') p
        |    ON d.src = p.p_partkey),
        |ct AS (SELECT count(*)::BIGINT AS nn,
        |  sum(CASE WHEN is_seed THEN 1 ELSE 0 END)::BIGINT AS ns FROM sd),
        |b AS (
        |  SELECT sd.node,
        |    (CASE WHEN sd.is_seed THEN (150000 * ct.nn) // ct.ns ELSE 0 END)::BIGINT AS base_r,
        |    (CASE WHEN sd.is_seed THEN (1000000 * ct.nn) // ct.ns ELSE 0 END)::BIGINT AS r
        |  FROM sd, ct),
        |c1 AS (SELECT oe.dst, sum(r.r // oe.deg)::BIGINT AS s FROM oe JOIN b r ON oe.src = r.node GROUP BY 1),
        |r1 AS (SELECT b.node, (b.base_r + (850 * coalesce(c.s, 0)) // 1000)::BIGINT AS r FROM b LEFT JOIN c1 c ON b.node = c.dst),
        |c2 AS (SELECT oe.dst, sum(r.r // oe.deg)::BIGINT AS s FROM oe JOIN r1 r ON oe.src = r.node GROUP BY 1),
        |r2 AS (SELECT b.node, (b.base_r + (850 * coalesce(c.s, 0)) // 1000)::BIGINT AS r FROM b LEFT JOIN c2 c ON b.node = c.dst),
        |c3 AS (SELECT oe.dst, sum(r.r // oe.deg)::BIGINT AS s FROM oe JOIN r2 r ON oe.src = r.node GROUP BY 1),
        |r3 AS (SELECT b.node, (b.base_r + (850 * coalesce(c.s, 0)) // 1000)::BIGINT AS r FROM b LEFT JOIN c3 c ON b.node = c.dst),
        |c4 AS (SELECT oe.dst, sum(r.r // oe.deg)::BIGINT AS s FROM oe JOIN r3 r ON oe.src = r.node GROUP BY 1),
        |r4 AS (SELECT b.node, (b.base_r + (850 * coalesce(c.s, 0)) // 1000)::BIGINT AS r FROM b LEFT JOIN c4 c ON b.node = c.dst),
        |c5 AS (SELECT oe.dst, sum(r.r // oe.deg)::BIGINT AS s FROM oe JOIN r4 r ON oe.src = r.node GROUP BY 1),
        |r5 AS (SELECT b.node, (b.base_r + (850 * coalesce(c.s, 0)) // 1000)::BIGINT AS r FROM b LEFT JOIN c5 c ON b.node = c.dst)
        |SELECT node, r AS rank_micro FROM r5""".stripMargin,

    // 4 synchronous LPA rounds unrolled; (count DESC, label ASC) tie-break
    // makes every round a pure function of the last — MATERIALIZED per the
    // q133 lesson (each round references the previous labeling twice)
    "q139_label_propagation" -> {
      val roundsSql = (1 to 4).map { i =>
        s"""v$i AS MATERIALIZED (
           |  SELECT e.dst, l.lbl, count(*) AS c
           |  FROM e JOIN l${i - 1} l ON e.src = l.node GROUP BY 1, 2),
           |l$i AS MATERIALIZED (
           |  SELECT dst AS node, lbl FROM (
           |    SELECT dst, lbl, row_number() OVER (PARTITION BY dst ORDER BY c DESC, lbl ASC) AS rn
           |    FROM v$i) WHERE rn = 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |e0 AS MATERIALIZED (
         |  SELECT a.l_partkey AS pa, b.l_partkey AS pb
         |  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         |  GROUP BY 1, 2 HAVING count(*) >= 2),
         |e AS MATERIALIZED (SELECT pa AS src, pb AS dst FROM e0 UNION ALL SELECT pb, pa FROM e0),
         |l0 AS MATERIALIZED (SELECT DISTINCT dst AS node, dst AS lbl FROM e),
         |$roundsSql
         |SELECT node, lbl AS community FROM l4""".stripMargin
    },

    "q140_reach2" ->
      """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e0 AS MATERIALIZED (
        |  SELECT a.l_partkey AS pa, b.l_partkey AS pb
        |  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |e AS MATERIALIZED (SELECT pa AS src, pb AS dst FROM e0 UNION ALL SELECT pb, pa FROM e0),
        |p AS (
        |  SELECT src, dst FROM e
        |  UNION
        |  SELECT a.src, b.dst FROM e a JOIN e b ON a.dst = b.src WHERE b.dst <> a.src)
        |SELECT src AS node, count(*)::BIGINT AS n_reach2 FROM p GROUP BY 1""".stripMargin,

    // token-budget waterfilling: the closed-form integer solve restated —
    // g(i) = Σ_{j≤i} t_j + (n−i)·t_i over ascending sources, i* = max
    // feasible, cap from the residual division (the three CASE arms)
    "q197_token_waterfill" ->
      """WITH per AS (
        |  SELECT source, sum(len(regexp_extract_all(text, '\S+')))::BIGINT AS n_tokens
        |  FROM documents GROUP BY source),
        |s AS (SELECT count(*)::BIGINT AS n, sum(n_tokens)::BIGINT AS total FROM per),
        |r AS (
        |  SELECT source, n_tokens,
        |    row_number() OVER (ORDER BY n_tokens ASC, source ASC) AS i,
        |    sum(n_tokens) OVER (ORDER BY n_tokens ASC, source ASC
        |      ROWS UNBOUNDED PRECEDING) AS pre
        |  FROM per),
        |j AS (
        |  SELECT r.*, s.n, (s.total * 60 // 100)::BIGINT AS b,
        |    (pre + (s.n - i) * n_tokens)::BIGINT AS g
        |  FROM r, s),
        |sol AS (
        |  SELECT max(i) AS istar, arg_max(g, i) AS gstar, arg_max(n_tokens, i) AS tstar
        |  FROM j WHERE g <= b),
        |c AS (
        |  SELECT (CASE WHEN sol.istar IS NULL THEN j0.b // j0.n
        |               WHEN sol.istar = j0.n THEN sol.tstar
        |               ELSE sol.tstar + (j0.b - sol.gstar) // (j0.n - sol.istar)
        |          END)::BIGINT AS cap
        |  FROM (SELECT any_value(n) AS n, any_value(b) AS b FROM j) j0, sol)
        |SELECT per.source, per.n_tokens, c.cap,
        |  least(per.n_tokens, c.cap)::BIGINT AS alloc_tokens,
        |  per.n_tokens > c.cap AS capped
        |FROM per, c""".stripMargin,

    // the q197 cap applied doc-by-doc in content-hash priority order
    "q198_waterfill_apply" ->
      """WITH per AS (
        |  SELECT source, sum(len(regexp_extract_all(text, '\S+')))::BIGINT AS n_tokens
        |  FROM documents GROUP BY source),
        |s AS (SELECT count(*)::BIGINT AS n, sum(n_tokens)::BIGINT AS total FROM per),
        |r AS (
        |  SELECT source, n_tokens,
        |    row_number() OVER (ORDER BY n_tokens ASC, source ASC) AS i,
        |    sum(n_tokens) OVER (ORDER BY n_tokens ASC, source ASC
        |      ROWS UNBOUNDED PRECEDING) AS pre
        |  FROM per),
        |j AS (
        |  SELECT r.*, s.n, (s.total * 60 // 100)::BIGINT AS b,
        |    (pre + (s.n - i) * n_tokens)::BIGINT AS g
        |  FROM r, s),
        |sol AS (
        |  SELECT max(i) AS istar, arg_max(g, i) AS gstar, arg_max(n_tokens, i) AS tstar
        |  FROM j WHERE g <= b),
        |c AS (
        |  SELECT (CASE WHEN sol.istar IS NULL THEN j0.b // j0.n
        |               WHEN sol.istar = j0.n THEN sol.tstar
        |               ELSE sol.tstar + (j0.b - sol.gstar) // (j0.n - sol.istar)
        |          END)::BIGINT AS cap
        |  FROM (SELECT any_value(n) AS n, any_value(b) AS b FROM j) j0, sol),
        |cum AS (
        |  SELECT source,
        |    len(regexp_extract_all(text, '\S+'))::BIGINT AS n_tok,
        |    sum(len(regexp_extract_all(text, '\S+'))) OVER (
        |      PARTITION BY source ORDER BY md5(text) ASC, doc_id ASC
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM documents)
        |SELECT cum.source, c.cap, count(*)::BIGINT AS n_kept,
        |  sum(n_tok)::BIGINT AS tok_kept,
        |  (sum(n_tok) * 10000 // c.cap)::BIGINT AS util_bp
        |FROM cum, c WHERE cum.cum <= c.cap
        |GROUP BY cum.source, c.cap""".stripMargin,

    // covariate-matched downsampling: test's length profile in basis
    // points, the min-ratio feasible size, per-bucket quotas, and the
    // hash-priority selection restated (kept set pinned by its id sum)
    "q199_matched_resample" ->
      """WITH d AS (
        |  SELECT doc_id, text,
        |    CASE WHEN (ascii(substring(md5(text), 1, 1)) * 256 + ascii(substring(md5(text), 2, 1))) % 100 < 90 THEN 'train'
        |         WHEN (ascii(substring(md5(text), 1, 1)) * 256 + ascii(substring(md5(text), 2, 1))) % 100 < 95 THEN 'val'
        |         ELSE 'test' END AS split,
        |    least(n_chars // 200, 9)::BIGINT AS bucket
        |  FROM documents),
        |t AS (SELECT bucket, count(*)::BIGINT AS n_test FROM d WHERE split = 'test' GROUP BY 1),
        |tt AS (SELECT sum(n_test) AS t_tot FROM t),
        |tg AS (
        |  SELECT bucket, n_test, (n_test * 10000 // t_tot)::BIGINT AS p_bp
        |  FROM t, tt WHERE (n_test * 10000 // t_tot) > 0),
        |tr AS (SELECT bucket, count(*)::BIGINT AS n_train FROM d WHERE split = 'train' GROUP BY 1),
        |jn AS (
        |  SELECT tg.bucket, coalesce(tr.n_train, 0)::BIGINT AS n_train, tg.n_test, tg.p_bp
        |  FROM tg LEFT JOIN tr USING (bucket)),
        |m AS (SELECT min(n_train * 10000 // p_bp)::BIGINT AS m FROM jn),
        |q AS (SELECT jn.*, (p_bp * m.m // 10000)::BIGINT AS k_quota FROM jn, m),
        |rk AS (
        |  SELECT bucket, doc_id,
        |    row_number() OVER (PARTITION BY bucket ORDER BY md5(text) ASC, doc_id ASC) AS rk
        |  FROM d WHERE split = 'train'),
        |kept AS (
        |  SELECT rk.bucket, sum(rk.doc_id)::BIGINT AS kept_id_sum
        |  FROM rk JOIN q USING (bucket) WHERE rk.rk <= q.k_quota GROUP BY 1)
        |SELECT q.bucket, q.n_train, q.n_test, q.p_bp, q.k_quota,
        |  coalesce(kept.kept_id_sum, 0)::BIGINT AS kept_id_sum
        |FROM q LEFT JOIN kept USING (bucket)""".stripMargin,

    // VARIANT round-trip: the oracle never sees the JSON — it states the
    // same per-(source, lang) statistics from the typed columns
    "q200_variant_extract" ->
      """SELECT source, lang, count(*)::BIGINT AS n_docs,
        |  sum(n_chars)::BIGINT AS sum_chars,
        |  sum(CASE WHEN regexp_extract(text, '\S+') <> '' THEN 1 ELSE 0 END)::BIGINT AS n_with_tok,
        |  coalesce(sum(CASE WHEN regexp_extract(text, '\S+') <> ''
        |    THEN ('0x' || substring(md5(regexp_extract(text, '\S+')), 1, 12))::BIGINT END), 0)::VARCHAR AS tok_checksum
        |FROM documents GROUP BY source, lang""".stripMargin,

    // ORC round-trip: the q186 manifest keyed by source, computed by the
    // oracle from the ORIGINAL parquet (the engine reads its ORC copy)
    "q201_orc_roundtrip" ->
      """SELECT source, count(*)::BIGINT AS n_docs,
        |  sum(len(regexp_extract_all(text, '\S+')))::BIGINT AS n_tokens,
        |  sum(('0x' || substring(md5(doc_id::VARCHAR || '|' || text), 1, 12))::BIGINT)::VARCHAR AS checksum
        |FROM documents GROUP BY 1""".stripMargin,

    // schema evolution: the oracle recomputes each generation from the
    // ORIGINAL typed table — the engine's mergeSchema read must agree
    "q202_schema_evolution" ->
      """SELECT 1::BIGINT AS gen, count(*)::BIGINT AS n_docs,
        |  count(*)::BIGINT AS n_lang_null, 0::BIGINT AS sum_chars,
        |  sum(('0x' || substring(md5(doc_id::VARCHAR || '|' || text), 1, 12))::BIGINT)::VARCHAR AS checksum
        |FROM documents WHERE doc_id % 2 = 0
        |UNION ALL
        |SELECT 2::BIGINT, count(*)::BIGINT, 0::BIGINT, sum(n_chars)::BIGINT,
        |  sum(('0x' || substring(md5(doc_id::VARCHAR || '|' || text), 1, 12))::BIGINT)::VARCHAR
        |FROM documents WHERE doc_id % 2 = 1""".stripMargin,

    // retrieval eval: the BM25 run (q176's scratch chain verbatim) scored
    // against the boolean-AND containment ground truth — all-integer
    // metrics (MRR/recall in basis points, truncating division)
    "q204_retrieval_eval" ->
      """WITH queries(query_id, term) AS (VALUES
        |  (0,'stream'),(0,'table'),(0,'hash'),
        |  (1,'customer'),(1,'order'),(1,'join'),
        |  (2,'window'),(2,'batch'),(2,'spark')),
        |toks AS (
        |  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS term
        |  FROM documents),
        |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
        |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        |tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM toks
        |  WHERE term IN (SELECT DISTINCT term FROM queries)
        |  GROUP BY doc_id, term),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |scored AS (
        |  SELECT q.query_id, t.doc_id,
        |    round(sum(
        |      ln((s.n_docs - f.df + 0.5::DOUBLE) / (f.df + 0.5::DOUBLE) + 1.0::DOUBLE)
        |        * (t.tf * 2.2::DOUBLE)
        |        / (t.tf + 1.2::DOUBLE * (0.25::DOUBLE + 0.75::DOUBLE * d.dl / s.avgdl))), 4)
        |      AS score
        |  FROM tf t JOIN dfreq f USING (term) JOIN dl d USING (doc_id)
        |  CROSS JOIN stats s JOIN queries q USING (term)
        |  GROUP BY q.query_id, t.doc_id),
        |run AS (
        |  SELECT query_id, doc_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id)::BIGINT AS rn
        |  FROM scored QUALIFY rn <= 10),
        |dt AS (SELECT DISTINCT doc_id, term FROM toks),
        |nq AS (SELECT query_id, count(*) AS n_terms FROM queries GROUP BY 1),
        |relc AS (
        |  SELECT q.query_id, dt.doc_id, count(*) AS nm
        |  FROM dt JOIN queries q USING (term) GROUP BY 1, 2),
        |rel AS (
        |  SELECT relc.query_id, relc.doc_id
        |  FROM relc JOIN nq USING (query_id) WHERE nm = n_terms),
        |nrel AS (SELECT query_id, count(*) AS n_rel FROM rel GROUP BY 1),
        |hit AS (
        |  SELECT r.query_id,
        |    sum(CASE WHEN rel.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS hits,
        |    min(CASE WHEN rel.doc_id IS NOT NULL THEN r.rn END) AS fr
        |  FROM run r LEFT JOIN rel ON r.query_id = rel.query_id AND r.doc_id = rel.doc_id
        |  GROUP BY 1)
        |SELECT h.query_id, n.n_rel::BIGINT AS n_rel, h.hits::BIGINT AS hits_at_k,
        |  coalesce(10000 // h.fr, 0)::BIGINT AS mrr_bp,
        |  (h.hits * 10000 // n.n_rel)::BIGINT AS recall_bp
        |FROM hit h JOIN nrel n USING (query_id)""".stripMargin,

    // corrupt-file resilience: the oracle never sees the poisoned copy —
    // it manifests the CLEAN table; the engine must skip exactly the two
    // planted poison files to agree
    "q205_corrupt_resilience" ->
      """SELECT source, count(*)::BIGINT AS n_docs,
        |  sum(len(regexp_extract_all(text, '\S+')))::BIGINT AS n_tokens,
        |  sum(('0x' || substring(md5(doc_id::VARCHAR || '|' || text), 1, 12))::BIGINT)::VARCHAR AS checksum
        |FROM documents GROUP BY 1""".stripMargin,

    // dedup-index DELETE, planted-recall form: plants of deleted docs
    // (content bucket < 20) must come back unfound through BOTH paths —
    // merge-on-read (tombstone log) and the physically purged index;
    // plants of retained docs found at estimate exactly 1.0
    "q206_dedup_index_delete" ->
      """SELECT doc_id + 10000000 AS new_id, doc_id AS orig_id,
        |  cb >= 20 AS found_mor, cb >= 20 AS found_purged
        |FROM (SELECT doc_id,
        |        (ascii(substring(md5(text), 1, 1)) * 256
        |         + ascii(substring(md5(text), 2, 1))) % 100 AS cb
        |      FROM documents)
        |WHERE cb < 40""".stripMargin,

    // ANN-index DELETE: queries 0-4 lost their planted copy (tombstoned,
    // then physically purged from exactly the affected cells); 5-9 keep it
    "q207_ann_index_delete" ->
      """SELECT vec_id AS query_id, vec_id >= 5 AS found_mor,
        |  vec_id >= 5 AS found_purged
        |FROM embeddings WHERE vec_id < 10""".stripMargin,

    // lex-index DELETE: served BM25 after deleting bucket-<10 docs must be
    // indistinguishable from an index that never held them — the oracle is
    // the from-scratch chain over the retained corpus, per served leg
    "q208_lex_index_delete" -> Bm25RetainedDeleteSql,

    // lex generation swap + retention-across-swap: served BM25 after the
    // swap ≡ the from-scratch SQL over the retained corpus (bucket ≥ 10) —
    // the rebuild deployed, pending deletions carried, stats re-anchored
    "q221_lex_swap" -> bm25Sql(
      """WHERE (ascii(substring(md5(text), 1, 1)) * 256
        |       + ascii(substring(md5(text), 2, 1))) % 100 >= 10""".stripMargin),

    // exact substring dedup: maximal per-doc spans covered by an exact
    // 8-token run repeated corpus-wide — the oracle restates the coverage
    // theorem directly over unnested windows (duplicated-window starts,
    // merged where ≤ L apart); 0-based positions match posexplode
    "q222_exact_substring_spans" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(text, '\S+') AS ts FROM documents),
        |grams AS (
        |  SELECT doc_id, u['pos'] AS pos, u['g'] AS g FROM (
        |    SELECT doc_id, unnest(list_transform(range(0, len(ts) - 7),
        |      p -> {'pos': p, 'g': array_to_string(ts[p+1:p+8], ' ')})) AS u
        |    FROM toks)),
        |dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
        |hits AS (
        |  SELECT doc_id, pos,
        |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 8
        |         THEN 1 ELSE 0 END AS newisl
        |  FROM grams JOIN dup USING (g)),
        |isl AS (
        |  SELECT doc_id, pos,
        |    sum(newisl) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM hits)
        |SELECT doc_id, min(pos)::BIGINT AS s, (max(pos) + 7)::BIGINT AS e,
        |  (max(pos) + 7 - min(pos) + 1)::BIGINT AS span_tokens
        |FROM isl GROUP BY doc_id, island""".stripMargin,

    // quantizer refresh training: 3 Lloyd rounds over micro-unit integer
    // vectors, unrolled round-by-round (the q164 BPE-induction oracle
    // pattern) — per-round cell population, assignment objective against
    // the pre-update centroid, and refreshed-centroid component sum, all
    // exact integers
    "q223_lloyd_refresh" -> LloydOracleSql,

    // attribute-filtered ANN: the same-label filter must admit the planted
    // copy (top-1 at 1.0), the other-label filter must exclude it and
    // return only rows satisfying the filter
    "q209_filtered_ann" ->
      """SELECT vec_id AS query_id, true AS found_same,
        |  true AS excluded_other, true AS filter_respected
        |FROM embeddings WHERE vec_id < 10""".stripMargin,

    // footer-statistics aggregate: the pushed-down COUNT/MIN/MAX must
    // agree with the data the footers describe
    "q210_agg_pushdown" ->
      """SELECT count(*)::BIGINT AS n_rows,
        |  min(l_orderkey) AS min_okey, max(l_orderkey) AS max_okey,
        |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
        |FROM lineitem""".stripMargin,

    // delete propagation into the shard layout: the manifest recomputed
    // from the partition-scoped rewrite must equal a manifest over a
    // corpus that never held the deleted docs; touched = shard held one
    "q211_shard_delete" ->
      """WITH d AS (
        |  SELECT doc_id, text,
        |    (ascii(substring(md5(text), 1, 1)) * 256
        |     + ascii(substring(md5(text), 2, 1))) % 100 AS cb,
        |    ('0x' || substring(md5(text), 1, 4))::BIGINT % 16 AS shard_id
        |  FROM documents)
        |SELECT r.shard_id, r.n_docs, r.n_tokens, r.checksum,
        |  coalesce(t.touched, false) AS touched
        |FROM (
        |  SELECT shard_id, count(*) AS n_docs,
        |    sum(len(regexp_extract_all(text, '\S+')))::BIGINT AS n_tokens,
        |    sum(('0x' || substring(md5(doc_id::VARCHAR || '|' || text), 1, 12))::BIGINT)::VARCHAR AS checksum
        |  FROM d WHERE cb >= 10 GROUP BY 1) r
        |LEFT JOIN (SELECT DISTINCT shard_id, true AS touched
        |           FROM d WHERE cb < 10) t USING (shard_id)""".stripMargin,

    // metadata-only manifest delete: stored manifest ⊕ one negative delta
    // from the deleted docs must be BIT-IDENTICAL to recomputing over the
    // retained corpus (exact Long + DECIMAL sums) — so the oracle IS the
    // recomputation
    "q213_manifest_delete" ->
      """WITH d AS (
        |  SELECT doc_id, text,
        |    (ascii(substring(md5(text), 1, 1)) * 256
        |     + ascii(substring(md5(text), 2, 1))) % 100 AS cb,
        |    ('0x' || substring(md5(text), 1, 4))::BIGINT % 16 AS shard_id
        |  FROM documents)
        |SELECT shard_id, count(*) AS n_docs,
        |  sum(len(regexp_extract_all(text, '\S+')))::BIGINT AS n_tokens,
        |  sum(('0x' || substring(md5(doc_id::VARCHAR || '|' || text), 1, 12))::BIGINT)::VARCHAR AS checksum
        |FROM d WHERE cb >= 10 GROUP BY 1""".stripMargin,

    // shard-layout upsert: the manifest from the rolled-forward layout
    // (delete leg + append leg, partitions only) must equal a manifest
    // computed directly over v2 — q190's planted transformation
    "q215_shard_upsert" ->
      """WITH v1 AS (SELECT doc_id, text FROM documents),
        |v2 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
        |  FROM v1 WHERE doc_id % 13 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text FROM v1
        |  WHERE (ascii(substring(md5(text), 1, 1)) * 256 +
        |         ascii(substring(md5(text), 2, 1))) % 100 < 2)
        |SELECT ('0x' || substring(md5(text), 1, 4))::BIGINT % 16 AS shard_id,
        |  count(*) AS n_docs,
        |  sum(len(regexp_extract_all(text, '\S+')))::BIGINT AS n_tokens,
        |  sum(('0x' || substring(md5(doc_id::VARCHAR || '|' || text), 1, 12))::BIGINT)::VARCHAR AS checksum
        |FROM v2 GROUP BY 1""".stripMargin,

    // per-slice Gopher pass rate with its Wilson 95% interval — counts
    // exact, interval in doubles with literal/order parity (1.96 and
    // 3.8416 parsed on both sides, same expression tree), 4-dp edge
    "q214_slice_confidence" ->
      """WITH f AS (
        |  SELECT doc_id, source,
        |    regexp_replace(text, '^\s+|\s+$', '', 'g') AS tt,
        |    regexp_extract_all(text, '\S+') AS t,
        |    len(regexp_extract_all(text, '\S+')) AS n_words,
        |    round(length(regexp_replace(text, '\s', '', 'g'))::DOUBLE /
        |          nullif(len(regexp_extract_all(text, '\S+')), 0), 4) AS mean_word_len,
        |    len(regexp_extract_all(lower(text), '\b(the|a|of|and|in|to)\b')) AS n_stopwords
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, source, n_words, mean_word_len, n_stopwords,
        |    round(1.0 - len(CASE WHEN len(t) >= 2
        |      THEN list_distinct(list_transform(generate_series(1, len(t) - 1),
        |        i -> t[i] || ' ' || t[i+1]))
        |      ELSE [tt] END)::DOUBLE / nullif(len(t) - 1, 0), 4) AS rep_ratio
        |  FROM f),
        |p AS (
        |  SELECT source, count(*) AS n_docs,
        |    sum(CASE WHEN n_words BETWEEN 50 AND 100000
        |          AND mean_word_len BETWEEN 3.0 AND 10.0
        |          AND n_stopwords >= 2 AND rep_ratio <= 0.1
        |        THEN 1 ELSE 0 END) AS n_pass
        |  FROM r GROUP BY 1)
        |SELECT source, n_docs::BIGINT AS n_docs, n_pass::BIGINT AS n_pass,
        |  (n_pass * 10000 // n_docs)::BIGINT AS pass_bp,
        |  round(((n_pass::DOUBLE / n_docs::DOUBLE) + 3.8416 / (2.0 * n_docs::DOUBLE)
        |    - 1.96 * sqrt((((n_pass::DOUBLE / n_docs::DOUBLE) * (1.0 - (n_pass::DOUBLE / n_docs::DOUBLE)))
        |        + 3.8416 / (4.0 * n_docs::DOUBLE)) / n_docs::DOUBLE))
        |    / (1.0 + 3.8416 / n_docs::DOUBLE), 4) AS wilson_lo,
        |  round(((n_pass::DOUBLE / n_docs::DOUBLE) + 3.8416 / (2.0 * n_docs::DOUBLE)
        |    + 1.96 * sqrt((((n_pass::DOUBLE / n_docs::DOUBLE) * (1.0 - (n_pass::DOUBLE / n_docs::DOUBLE)))
        |        + 3.8416 / (4.0 * n_docs::DOUBLE)) / n_docs::DOUBLE))
        |    / (1.0 + 3.8416 / n_docs::DOUBLE), 4) AS wilson_hi
        |FROM p""".stripMargin,

    // k-anonymity generalization lattice over (source, lang, len-bucket):
    // per QI group, the finest level at which its population reaches k=5
    "q218_k_anonymity" ->
      """WITH q AS (
        |  SELECT doc_id, source, lang, n_chars // 500 AS lb FROM documents),
        |g0 AS (SELECT source, lang, lb, count(*) AS n0 FROM q GROUP BY 1,2,3),
        |g1 AS (SELECT source, lang, count(*) AS n1 FROM q GROUP BY 1,2),
        |g2 AS (SELECT source, count(*) AS n2 FROM q GROUP BY 1)
        |SELECT g0.source, g0.lang, g0.lb, g0.n0, g1.n1, g2.n2,
        |  (CASE WHEN n0 >= 5 THEN 0 WHEN n1 >= 5 THEN 1
        |        WHEN n2 >= 5 THEN 2 ELSE 3 END)::INT AS level
        |FROM g0 JOIN g1 USING (source, lang) JOIN g2 USING (source)""".stripMargin,

    // exact Brandes on the planted motif graph: every node's score is a
    // closed-form constant of its (motif, position) role — path / star /
    // 5-cycle / 4-cycle+pendant per group of five consecutive doc ids;
    // constants independently derived (GraphSpec pins them against a
    // reference Brandes with the same integer-micro truncating-div rule)
    "q219_betweenness_exact" ->
      """WITH d AS (SELECT doc_id, doc_id // 5 AS g, doc_id % 5 AS p FROM documents),
        |fg AS (SELECT g FROM d GROUP BY g HAVING count(*) = 5),
        |n AS (SELECT doc_id, (d.g % 4) AS m, p FROM d JOIN fg USING (g))
        |SELECT doc_id AS node, 4::BIGINT AS n_pivots_reached,
        |  (CASE
        |    WHEN m = 0 THEN CASE p WHEN 1 THEN 6000000 WHEN 2 THEN 8000000
        |                           WHEN 3 THEN 6000000 ELSE 0 END
        |    WHEN m = 1 THEN CASE p WHEN 0 THEN 12000000 ELSE 0 END
        |    WHEN m = 2 THEN 2000000
        |    ELSE CASE p WHEN 0 THEN 7000000 WHEN 1 THEN 2000000
        |                WHEN 2 THEN 1000000 WHEN 3 THEN 2000000 ELSE 0 END
        |  END)::BIGINT AS betweenness_micro
        |FROM n""".stripMargin,

    // generation swap: the live name must serve the REBUILT index — every
    // plant (present only in the staged generation) found at exactly 1.0
    "q217_index_swap" ->
      """SELECT vec_id AS query_id, true AS found
        |FROM embeddings WHERE vec_id < 10""".stripMargin,

    // the compliance report over all FIVE persisted families (12
    // surfaces): n_before stated from the corpus wherever the surface is
    // structural (a delete that silently targeted nothing cannot pass),
    // NULL on the two reference surfaces whose held_before boolean
    // carries the proof instead (graph_entries: doc/vec 0 — the slice
    // minimum, hence a cell rep — is in the deletion set by
    // construction; clu_labelmap: structurally empty in this
    // build-then-delete lifecycle, populated-case spec-pinned); zero
    // rows at rest after the purges, logs themselves gone
    "q216_forget_audit" ->
      """WITH g AS (
        |  SELECT doc_id,
        |    (ascii(substring(md5(text), 1, 1)) * 256
        |     + ascii(substring(md5(text), 2, 1))) % 100 AS cb,
        |    len(regexp_extract_all(text, '\S+')) AS n_tok
        |  FROM documents WHERE doc_id % 10 < 2),
        |gone AS (SELECT doc_id, n_tok FROM g WHERE cb < 15 OR doc_id = 0),
        |n AS (SELECT
        |  (SELECT count(*) FROM gone)::BIGINT AS nd,
        |  (SELECT count(*) FROM gone WHERE n_tok >= 1)::BIGINT AS nt,
        |  (SELECT count(*) FROM gone WHERE doc_id IN
        |     (SELECT vec_id FROM embeddings WHERE vec_id % 10 < 2))::BIGINT AS nv,
        |  (SELECT count(*) FROM gone WHERE doc_id IN
        |     (SELECT vec_id FROM embeddings
        |      WHERE vec_id % 10 < 2 AND vec_id < 1250))::BIGINT AS ng)
        |SELECT * FROM (
        |  SELECT 'ann_cells' AS surface, nv AS n_before, true AS held_before,
        |    0::BIGINT AS n_remaining, true AS forgotten, true AS log_cleared FROM n
        |  UNION ALL SELECT 'clu_clusters', nd, true, 0, true, true FROM n
        |  UNION ALL SELECT 'clu_labelmap', NULL::BIGINT, false, 0, true, true FROM n
        |  UNION ALL SELECT 'clu_pfx', nd, true, 0, true, true FROM n
        |  UNION ALL SELECT 'clu_shg', nd, true, 0, true, true FROM n
        |  UNION ALL SELECT 'dedup_bands', nd, true, 0, true, true FROM n
        |  UNION ALL SELECT 'dedup_sigs', nd, true, 0, true, true FROM n
        |  UNION ALL SELECT 'graph_edges', ng, true, 0, true, true FROM n
        |  UNION ALL SELECT 'graph_entries', NULL::BIGINT, true, 0, true, true FROM n
        |  UNION ALL SELECT 'graph_vectors', ng, true, 0, true, true FROM n
        |  UNION ALL SELECT 'lex_dl', nt, true, 0, true, true FROM n
        |  UNION ALL SELECT 'lex_postings', nt, true, 0, true, true FROM n
        |) ORDER BY surface""".stripMargin,

    // index fsck: every reconciliation and invariant must hold on a
    // freshly built trio — the engine computes the verdicts, the oracle
    // states that a correct build has nothing to report
    "q212_index_audit" ->
      """SELECT * FROM (VALUES
        |  ('ann_cells', true, true),
        |  ('dedup_bands', true, true),
        |  ('dedup_sigs', true, true),
        |  ('lex_dl', true, true),
        |  ('lex_postings', true, true),
        |  ('lex_stats', true, true)) AS t(surface, complete, consistent)""".stripMargin,

    // token-window chunking restated: same starts (0, 24, 48, … < n_tok),
    // same 32-token windows, same short tail
    "q203_chunk_profile" ->
      """WITH t AS (
        |  SELECT doc_id, source, regexp_extract_all(text, '\S+') AS toks
        |  FROM documents WHERE len(regexp_extract_all(text, '\S+')) >= 1),
        |c AS (
        |  SELECT doc_id, source, toks,
        |    unnest(generate_series(0, len(toks) - 1, 24)) AS s
        |  FROM t),
        |p AS (
        |  SELECT doc_id, source,
        |    len(toks[s + 1 : s + 32])::BIGINT AS n_tok,
        |    array_to_string(toks[s + 1 : s + 32], ' ') AS ct
        |  FROM c)
        |SELECT source, count(*)::BIGINT AS n_chunks,
        |  count(DISTINCT doc_id)::BIGINT AS n_docs,
        |  sum(n_tok)::BIGINT AS chunk_tokens,
        |  sum(('0x' || substring(md5(ct), 1, 12))::BIGINT)::VARCHAR AS checksum
        |FROM p GROUP BY 1""".stripMargin,

    // modularity of the q139 partition over the common denominator 4m² —
    // numerator/denominator exact integers, one division at the edge
    "q141_modularity" -> {
      val roundsSql = (1 to 4).map { i =>
        s"""v$i AS MATERIALIZED (
           |  SELECT e.dst, l.lbl, count(*) AS c
           |  FROM e JOIN l${i - 1} l ON e.src = l.node GROUP BY 1, 2),
           |l$i AS MATERIALIZED (
           |  SELECT dst AS node, lbl FROM (
           |    SELECT dst, lbl, row_number() OVER (PARTITION BY dst ORDER BY c DESC, lbl ASC) AS rn
           |    FROM v$i) WHERE rn = 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |e0 AS MATERIALIZED (
         |  SELECT a.l_partkey AS pa, b.l_partkey AS pb
         |  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         |  GROUP BY 1, 2 HAVING count(*) >= 2),
         |e AS MATERIALIZED (SELECT pa AS src, pb AS dst FROM e0 UNION ALL SELECT pb, pa FROM e0),
         |l0 AS MATERIALIZED (SELECT DISTINCT dst AS node, dst AS lbl FROM e),
         |$roundsSql,
         |inc AS (
         |  SELECT la.lbl AS community, count(*)::BIGINT AS in_c
         |  FROM e0 JOIN l4 la ON e0.pa = la.node JOIN l4 lb ON e0.pb = lb.node
         |  WHERE la.lbl = lb.lbl GROUP BY 1),
         |dg AS (SELECT src AS node, count(*)::BIGINT AS deg FROM e GROUP BY 1),
         |tot AS (
         |  SELECT l.lbl AS community, sum(d.deg)::BIGINT AS tot_c
         |  FROM dg d JOIN l4 l ON d.node = l.node GROUP BY 1),
         |mm AS (SELECT count(*)::BIGINT AS m FROM e0),
         |agg AS (
         |  SELECT count(*)::BIGINT AS n_communities, max(mm.m) AS m,
         |    sum(4 * mm.m * coalesce(i.in_c, 0) - t.tot_c * t.tot_c)::BIGINT AS q_num
         |  FROM tot t LEFT JOIN inc i USING (community) CROSS JOIN mm)
         |SELECT n_communities, m, q_num, (4 * m * m)::BIGINT AS q_den,
         |  round(q_num::DOUBLE / (4 * m * m)::DOUBLE, 6) AS modularity FROM agg""".stripMargin
    })
}
