package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.documents

/** Deterministic sampling / dataset-split operators for training pipelines.
  *
  * Splits are a pure function of CONTENT (md5), not of row order or
  * partitioning — re-running on a reshuffled, repartitioned, or appended
  * corpus keeps every existing document in the same split. That property is
  * what makes train/test contamination auditable at 100 TB, and is exactly
  * what `df.sample`/`randomSplit` (seeded per-partition RNG — layout-
  * dependent) cannot give.
  */
object Sampling {

  /** Content-derived bucket in [0, 100): two hex chars of md5 → 0..255,
    * mod 100. Engine-portable (ascii/substring/md5 only), so the assignment
    * is oracle-checkable. */
  def contentBucket(c: Column): Column =
    pmod(ascii(substring(md5(c.cast("binary")), 1, 1)) * 256 +
      ascii(substring(md5(c.cast("binary")), 2, 1)), lit(100))

  def splitOf(c: Column, trainPct: Int = 90, valPct: Int = 5): Column = {
    val b = contentBucket(c)
    when(b < trainPct, lit("train"))
      .when(b < trainPct + valPct, lit("val"))
      .otherwise(lit("test"))
  }

  /** q38: per-document deterministic train/val/test assignment. */
  def trainSplit(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir).select(
      col("doc_id"),
      contentBucket(col("text")).as("bucket"),
      splitOf(col("text")).as("split"))

  /** q39: split sizes per language — the contamination/balance audit view. */
  def splitCounts(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .groupBy(splitOf(col("text")).as("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"))

  /** Deterministic fractional sample: keep documents whose content bucket
    * falls below `pct`. Stable under re-partitioning and appends. */
  def deterministicSample(df: DataFrame, textCol: String, pct: Int): DataFrame =
    df.filter(contentBucket(col(textCol)) < pct)

  /** q155: per-domain document cap — the standard pretraining-mix guard
    * against any single domain dominating the corpus (CommonCrawl-style
    * pipelines cap documents per registered domain before mixing). Rank
    * within each `source` by content hash (uniform, deterministic, no
    * popularity bias) with doc_id tie-break, keep the first `cap`. Same
    * WindowGroupLimit shape as q61: the planner pushes the rank bound
    * below the sort, so each map task ships at most `cap` rows per domain
    * into the shuffle — a domain with a billion documents costs the same
    * shuffle as one with a hundred. */
  def domainCap(spark: SparkSession, dir: String, cap: Int = 15): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("pr"), col("doc_id"))
    documents(spark, dir)
      .select(col("source"), col("doc_id"), md5(col("text")).as("pr"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= cap)
      .select(col("source"), col("doc_id"), col("rk"))
  }

  /** q158: curriculum ordering — the corpus arranged for quality-first
    * training: documents fall into quality DECILES (1 = best), and within
    * each decile the presentation order is a deterministic content-hash
    * shuffle (uniform, replayable, no popularity bias). Output: doc_id,
    * quality, decile, and the within-decile position.
    *
    * The decile here is NTILE over the exact global quality order (with
    * doc_id tie-break so the cut is engine-exact) — chosen because the
    * oracle can state it verbatim. At warehouse scale the same query
    * replaces NTILE with decile BOUNDARIES from the mergeable quantile
    * sketch (q102's `graft_quantile_sketch`) broadcast onto a narrow
    * per-row bucket map — no global sort; the within-decile window then
    * hash-partitions by decile, which is the shape this query already
    * uses. */
  def curriculumOrder(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("quality").desc, col("doc_id"))
    val wd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("decile")).orderBy(col("h"), col("doc_id"))
    TextStats.qualityScore(spark, dir).select(col("doc_id"), col("quality"))
      .join(documents(spark, dir).select(col("doc_id"), md5(col("text")).as("h")),
        "doc_id")
      .withColumn("decile", ntile(10).over(w))
      .withColumn("pos_in_decile", row_number().over(wd))
      .select(col("doc_id"), col("quality"), col("decile"), col("pos_in_decile"))
  }

  /** q158's 100 TB shape made real code: decile BOUNDARIES come from the
    * mergeable quantile sketch (q102's `graft_quantile_sketch` — one
    * partial+final aggregate, kilobyte buffers through the shuffle),
    * broadcast back onto the scan as a narrow per-row bucket map — no
    * global sort anywhere in the plan. The within-decile presentation
    * order is the same content-hash window, which hash-partitions by
    * decile. Decile 1 = best quality; agrees with q158's exact NTILE up
    * to sketch rank error at the 9 cut points (spec pins within-one
    * agreement; q159 gates the share/monotonicity claims). */
  def curriculumOrderScalable(spark: SparkSession, dir: String): DataFrame = {
    val scored = TextStats.qualityScore(spark, dir)
      .select(col("doc_id"), col("quality"))
      .join(documents(spark, dir).select(col("doc_id"), md5(col("text")).as("h")),
        "doc_id")
    val bounds = scored.agg(graft.functions.QuantileSketch
      .quantileSketch(col("quality"), (1 to 9).map(_ / 10.0)).as("bs"))
    val wd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("decile")).orderBy(col("h"), col("doc_id"))
    scored.crossJoin(broadcast(bounds))
      .withColumn("decile",
        (lit(1) + size(filter(col("bs"), b => b > col("quality")))).cast("int"))
      .drop("bs")
      .withColumn("pos_in_decile", row_number().over(wd))
      .select(col("doc_id"), col("quality"), col("decile"), col("pos_in_decile"))
  }

  /** q159: the oracle gate for the sketch-bucketed curriculum (DuckDB
    * cannot run the sketch, so — q102/q157-style — the output states the
    * per-decile CLAIMS as booleans the oracle asserts verbatim): all 10
    * deciles exist (row-count match), each holds its ~10% share within
    * the sketch rank bound (0.04·n + 8, generous vs the ≈0.15% theory
    * bound at k=1024 plus worst-case tie mass at a boundary), and decile
    * quality ranges are strictly layered (min of decile d ≥ max of
    * decile d+1 — exact by construction of threshold bucketing, pinning
    * the bucket direction). The 10-row final window is driver-trivial. */
  def curriculumSketchGate(spark: SparkSession, dir: String): DataFrame = {
    // the 10-row per-decile frame feeds two branches (the total and the
    // main select); unmaterialized, the whole curriculum pipeline —
    // quality scoring, sketch, window — ran once per branch
    val per = graft.functions.Materialize(curriculumOrderScalable(spark, dir)
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("quality")).as("qmin"), max(col("quality")).as("qmax")))
    val tot = per.agg(sum(col("n_docs")).as("n"))
    val wnext = org.apache.spark.sql.expressions.Window.orderBy(col("decile"))
    per.crossJoin(broadcast(tot))
      .withColumn("next_qmax", lead(col("qmax"), 1).over(wnext))
      .select(col("decile"),
        (abs(col("n_docs") - col("n") / 10.0) <=
          lit(0.04) * col("n") + lit(8.0)).as("share_ok"),
        (col("next_qmax").isNull || col("qmin") >= col("next_qmax"))
          .as("monotone_ok"))
  }

  /** q61: stratified per-language sample of EXACT size k — rank documents
    * within each language by content hash (uniform pseudo-random but fully
    * deterministic) and keep the first k. The rebalancing step of corpus
    * mixing: fractional sampling (q46) can't hit exact per-stratum counts.
    * The planner's WindowGroupLimit pushes the k-bound below the sort, so
    * each partition feeds at most k rows per language to the shuffle — this
    * stays cheap even when a language holds most of the corpus. */
  def stratifiedSample(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
      .orderBy(col("h").asc, col("doc_id").asc)
    documents(spark, dir)
      .select(col("doc_id"), col("lang"), md5(col("text").cast("binary")).as("h"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("lang"), col("rk").cast("int").as("rk"))
  }

  /** q62: token-budget sequence packing — assign documents to fixed-budget
    * training sequences (greedy in-order fill, budget overflows start a new
    * sequence). Packing is inherently sequential, so it is parallelized the
    * way a real pipeline does it: documents are first bucketed by content
    * hash (deterministic, layout-independent), and packing runs per bucket —
    * a window over the high-cardinality bucket key, integer arithmetic only,
    * so the result is exact and engine-portable. Output: every doc's
    * (bucket, seq_id) home. */
  def tokenPacking(spark: SparkSession, dir: String, budget: Int = 2048,
      buckets: Int = 32): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("bucket"))
      .orderBy(col("doc_id").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    documents(spark, dir)
      .select(col("doc_id"),
        pmod(contentBucket(col("text")), lit(buckets)).as("bucket"),
        size(TextStats.tokens(col("text"))).cast("long").as("n_tok"))
      .withColumn("cum_tok", sum(col("n_tok")).over(w))
      .select(col("doc_id"), col("bucket"), col("n_tok"),
        expr(s"(cum_tok - n_tok) div $budget").as("seq_id"))
  }

  /** q84: deterministic weighted sampling without replacement (Efraimidis–
    * Spirakis A-ES, 2006): each item draws a pseudo-uniform u from its
    * content digest and competes on cost = −ln(u)/w; the k smallest costs
    * are EXACTLY a weight-proportional sample without replacement. Here
    * w = n_chars (longer documents proportionally likelier — the standard
    * token-budget-aware corpus subsampling). u comes from md5 bytes 3-4
    * (bytes 1-2 belong to [[contentBucket]] — disjoint bytes keep the
    * sample independent of the train/val/test split), so the whole draw is
    * deterministic, layout-independent, and engine-portable; cost is
    * rounded to 4 dp BEFORE ranking (the q55 round-before-rank pattern)
    * with doc_id as the tie-break, so Spark and DuckDB agree exactly.
    *
    * Plan shape: a narrow per-row map, then global top-k — Spark plans
    * `orderBy.limit(k)` as TakeOrderedAndProject: each partition keeps only
    * its local k, the driver merges k·P rows. No full sort, no shuffle of
    * the corpus; at 100 TB this is one scan + a k-sized merge. */
  def weightedSample(spark: SparkSession, dir: String, k: Int = 50): DataFrame = {
    val h = md5(col("text").cast("binary"))
    // two hex chars → 16-bit-ish value in [12336, 26214]; +1 / 26216 keeps
    // u in (0, 1) strictly, so ln(u) is finite and negative
    val v = ascii(substring(h, 3, 1)) * 256 + ascii(substring(h, 4, 1))
    val u = (v + 1).cast("double") / lit(26216.0)
    documents(spark, dir)
      .select(col("doc_id"), col("n_chars").as("weight"),
        round(-log(u) * 1e6 / col("n_chars"), 4).as("cost"))
      .orderBy(col("cost").asc, col("doc_id").asc)
      .limit(k)
  }

  /** q67: deterministic domain-mixture sampling — re-weight the corpus to a
    * per-source target rate (the "domain mixing" step of every pre-training
    * recipe: up-/down-sample web vs books vs code). The mixture spec is a
    * tiny (source → keep-pct) table broadcast against the corpus; the keep
    * decision is the content-hash bucket, so the sample is exact-rate in
    * expectation, layout-independent, and stable under appends — rerunning
    * after ingesting more data never flips an existing document's fate.
    * Here the spec is derived declaratively (even source index → 100%, odd
    * → 25%) so the whole operator is oracle-checkable; in production the
    * spec is a user config table with identical plan shape. */
  def mixtureSample(spark: SparkSession, dir: String): DataFrame = {
    val d = documents(spark, dir)
    val spec = d.select(col("source")).distinct()
      .select(col("source"),
        when(substring(col("source"), 4, 10).cast("int") % 2 === 0, lit(100))
          .otherwise(lit(25)).as("target_pct"))
    d.join(broadcast(spec), "source")
      .filter(contentBucket(col("text")) < col("target_pct"))
      .select(col("doc_id"), col("source"), col("target_pct"))
  }

  /** q181: temperature (α=0.5) mixture sampling — the standard multilingual
    * /multi-source rebalance (mC4, XLM-R, ROOTS): sources are sampled with
    * share ∝ p_s^α instead of their natural share p_s, up-weighting
    * low-resource sources. With α=1/2 the α-power is an integer-exact
    * computation: per-source weight w_s = ⌊√n_s⌋ (sqrt is IEEE
    * exactly-rounded in both engines, and ⌊·⌋ of it is stable — exact for
    * perfect squares, irrational otherwise, never on a rounding cliff), the
    * weight total S = Σw_s is a LONG sum (no FP aggregation order), and the
    * per-source keep rate for a half-corpus budget B = N div 2 is pure
    * integer arithmetic: r_bp = min(10⁴, B·w_s·10⁴ div (S·n_s)) basis
    * points. The keep decision hashes CONTENT (4 md5 hex chars mod 10⁴ —
    * contentBucket's discipline at basis-point granularity), so it is
    * layout-independent and stable under appends: re-running after ingest
    * never flips an existing document's fate, only recomputes rates.
    * Overflow bound: B·w·10⁴ < 2⁶³ holds to N ≈ 4·10¹¹ docs.
    * Plan: per-source counts are an O(sources) aggregate, the rate table
    * broadcasts, and the decision is a narrow map over the corpus scan. */
  def temperatureMixture(spark: SparkSession, dir: String): DataFrame = {
    // strata: the 4-char source prefix folds src1,src10..src19 into one
    // 11×-sized domain — a deterministic skewed taxonomy (the testdata's
    // raw sources are uniform, which would degenerate every α to the same
    // rate); in production this column is the user's source/language tag
    val d = documents(spark, dir)
      .withColumn("domain", substring(col("source"), 1, 4))
    val n = d.groupBy(col("domain")).agg(count(lit(1)).as("n_domain"))
    val w = n.withColumn("w", floor(sqrt(col("n_domain").cast("double"))).cast("long"))
    val s = w.agg(sum(col("w")).as("sw"), sum(col("n_domain")).as("total"))
    val r = w.crossJoin(broadcast(s))
      .withColumn("r_bp",
        least(lit(10000L), expr("((total div 2) * w * 10000) div (sw * n_domain)")))
      .select(col("domain"), col("n_domain"), col("w"), col("r_bp"))
    def hx(i: Int) = ascii(substring(md5(col("text").cast("binary")), i, 1))
    val b = pmod(((hx(1) * 256 + hx(2)) * 256 + hx(3)) * 256 + hx(4), lit(10000))
    d.join(broadcast(r), "domain")
      .select(col("doc_id"), col("source"), col("domain"), col("n_domain"),
        col("w"), col("r_bp"), (b < col("r_bp")).as("keep"))
  }

  /** q69: eval-set decontamination audit — the OTHER standard contamination
    * check next to q53's near-dup audit: exact word n-gram collision between
    * the held-out (test) split and the training split, the method used to
    * scrub benchmark leakage from pre-training corpora (a train document
    * sharing even one long n-gram with an eval document is a memorization
    * vector even when the documents aren't near-duplicates). Output: every
    * (train_id, eval_id) pair with the count of shared distinct n-grams.
    * Plan: one scan produces distinct shingles per doc (codegen'd kernel);
    * the eval side — tiny by construction, eval sets are MBs against a
    * 100 TB corpus — broadcasts; per-pair counts are a partial+final hash
    * aggregate. The corpus side never shuffles before the aggregate. */
  def decontamination(spark: SparkSession, dir: String, n: Int = 5): DataFrame = {
    val grams = documents(spark, dir)
      .select(col("doc_id"), splitOf(col("text")).as("split"),
        explode(TextStats.wordShingles(col("text"), n)).as("g"))
    val ev = grams.filter(col("split") === "test")
      .select(col("doc_id").as("eval_id"), col("g"))
    val tr = grams.filter(col("split") === "train")
      .select(col("doc_id").as("train_id"), col("g"))
    tr.join(broadcast(ev), "g")
      .groupBy(col("train_id"), col("eval_id"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** q174: SEMANTIC contamination audit — the embedding-level member of
    * the contamination matrix (q69 exact n-gram, q78 Bloom, q145
    * containment, q53 near-dup): a training document whose EMBEDDING is
    * near-parallel to an eval document leaks the benchmark even when no
    * n-gram survives (paraphrase, translation, format-shuffle — exactly
    * what modern decontamination sweeps additionally check). vec_id ≡
    * doc_id is the generator's table-alignment convention.
    *
    * Candidates come from the multi-table sign-LSH buckets (the q30
    * machinery — O(n) bucket rows, never eval × train), verified exactly
    * at the rounded threshold. Gated with the planted-leak harness: eval
    * = vec_id < 50; train = the rest PLUS a ×2-scaled copy (ids +10⁶) of
    * every eval vector — a planted paraphrase-grade leak at cosine
    * exactly 1.0 that shares its original's sign pattern in every table,
    * so the audit MUST surface each one; the isotropic corpus contributes
    * no organic pair ≥ τ, so the output is exactly the planted leak set
    * (precision gated too — a false positive adds a row the oracle never
    * states). */
  def semanticContamination(spark: SparkSession, dir: String,
      tau: Double = 0.95): DataFrame = {
    val e = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val eval = e.filter(col("vec_id") < 50)
    val planted = eval.select((col("vec_id") + 1000000L).as("vec_id"),
      expr("transform(v, x -> x * 2.0d)").as("v"))
    val all = e.unionByName(planted)
    Similarity.embeddingNearDupOn(all, tau - 1e-4)
      .filter(col("cos_sim") >= tau)
      // keep only split-CROSSING pairs: eval side < 50, train side is
      // everything else (organic ≥ 50 or planted ≥ 10⁶)
      .filter(col("vec_a") < 50 && col("vec_b") >= 50)
      .select(col("vec_a").as("eval_id"), col("vec_b").as("train_id"),
        col("cos_sim"))
  }

  /** q145: n-gram CONTAINMENT scores — the directional contamination metric
    * that q69's raw collision counts feed: containment(train, eval) =
    * |grams(train) ∩ grams(eval)| / |grams(eval)|, i.e. what fraction of the
    * EVAL document is covered by shared n-grams. Containment, not Jaccard
    * resemblance, is the right statistic for benchmark leakage: a 100-word
    * eval prompt fully embedded in a 10k-word train document has Jaccard
    * ≈ 0.01 (invisible to near-dup thresholds) but containment 1.0. The
    * denominator is eval-side on purpose — it makes the score independent
    * of train-document length, so one threshold works across the corpus.
    *
    * Plan: identical shape to q69 (eval grams broadcast, corpus side never
    * shuffles before the partial+final pair count); the per-eval gram
    * totals are an O(|eval docs|) aggregate broadcast into the final join.
    * Exactness: n_shared and n_eval are exact integers; the one division
    * happens at the edge in double with identical operands on both
    * engines, rounded 4 dp. */
  def containmentScores(spark: SparkSession, dir: String, n: Int = 5): DataFrame = {
    val grams = documents(spark, dir)
      .select(col("doc_id"), splitOf(col("text")).as("split"),
        explode(TextStats.wordShingles(col("text"), n)).as("g"))
    val ev = grams.filter(col("split") === "test")
      .select(col("doc_id").as("eval_id"), col("g"))
    // wordShingles emits DISTINCT grams per doc, so count(*) = |grams(eval)|
    val evSizes = ev.groupBy(col("eval_id")).agg(count(lit(1)).as("n_eval"))
    val tr = grams.filter(col("split") === "train")
      .select(col("doc_id").as("train_id"), col("g"))
    tr.join(broadcast(ev), "g")
      .groupBy(col("train_id"), col("eval_id"))
      .agg(count(lit(1)).as("n_shared"))
      .join(broadcast(evSizes), "eval_id")
      .select(col("train_id"), col("eval_id"), col("n_shared"),
        round(col("n_shared").cast("double") / col("n_eval"), 4).as("containment"))
  }

  /** q70: the decontaminated training set — q69's audit applied: train-split
    * documents with every n-gram-colliding document removed (left-anti join
    * against the flagged id set). This is the actual deliverable of a
    * decontamination pass; composing it from the gated q38 split and the
    * gated q69 audit keeps the whole pipeline oracle-checkable end-to-end.
    * The flagged set is O(collisions) — tiny — so the anti-join broadcasts;
    * the corpus is scanned once and never shuffled. */
  def decontaminatedTrain(spark: SparkSession, dir: String, n: Int = 5): DataFrame = {
    val flagged = decontamination(spark, dir, n)
      .select(col("train_id").as("doc_id")).distinct()
    documents(spark, dir)
      .filter(splitOf(col("text")) === "train")
      .join(broadcast(flagged), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"))
  }

  /** q78: Bloom-filter decontamination audit — the runtime-filter version of
    * q69, which is how the n-gram scrub actually runs at 100 TB: the eval
    * side's distinct n-grams (MBs — eval sets are tiny by construction) are
    * folded into a Bloom filter on the driver and shipped to every task, so
    * the corpus-side probe is a per-row codegen'd bit test (Blooms.
    * BloomMightContain) with NO join, NO shuffle, and no broadcast-hash
    * build — the corpus is scanned once and only Bloom-positive rows
    * survive to any downstream exact check. Blooms admit false POSITIVES
    * only, so the filter can only over-flag, never leak: exactly the safe
    * direction for decontamination.
    *
    * Output pins both properties against the gated exact audit (q69):
    * `superset_ok` — every exactly-flagged train doc is Bloom-flagged (no
    * false negatives, the correctness half) — and `fp_bounded` — Bloom
    * over-flagging stays under max(5 docs, 5% of the train split) at
    * fpp = 1e-4 (the efficiency half: the pre-filter actually filters).
    * Both are oracle-checkable booleans; n_flagged_exact is the shared
    * ground truth. Filter hashing is fixed-seed Murmur3, so the whole
    * result is deterministic. */
  def decontaminationBloom(spark: SparkSession, dir: String,
      n: Int = 5, fpp: Double = 1e-4): DataFrame = {
    val grams = documents(spark, dir)
      .select(col("doc_id"), splitOf(col("text")).as("split"),
        explode(TextStats.wordShingles(col("text"), n)).as("g"))
    val ev = grams.filter(col("split") === "test").select(col("g")).distinct()
    // the one driver-side step of the pattern: size + build the filter over
    // the tiny side (two jobs over eval grams only — never the corpus)
    val bloom = ev.stat.bloomFilter("g", math.max(ev.count(), 1024L), fpp)
    val bloomFlagged = grams.filter(col("split") === "train")
      .filter(graft.functions.Blooms.mightContain(col("g"), bloom))
      .select(col("doc_id").as("train_id")).distinct()
    val exactFlagged = decontamination(spark, dir, n)
      .select(col("train_id")).distinct()
    val trainDocs = documents(spark, dir).filter(splitOf(col("text")) === "train")
    exactFlagged.agg(count(lit(1)).as("n_flagged_exact"))
      .crossJoin(exactFlagged.join(bloomFlagged, Seq("train_id"), "left_anti")
        .agg(count(lit(1)).as("n_missed")))
      .crossJoin(bloomFlagged.agg(count(lit(1)).as("n_bloom")))
      .crossJoin(trainDocs.agg(count(lit(1)).as("n_train")))
      .select(col("n_flagged_exact"),
        (col("n_missed") === 0).as("superset_ok"),
        ((col("n_bloom") - col("n_flagged_exact")).cast("double") <=
          greatest(lit(5.0), col("n_train").cast("double") * 0.05)).as("fp_bounded"))
  }

  /** q73: the end-to-end clean-corpus pipeline — what a production
    * pre-training data build actually ships, composed entirely from gated
    * operators so the WHOLE pipeline is oracle-checkable: a document
    * survives iff it (a) passes the Gopher quality gates (q66), (b) is the
    * quality-elected representative of its near-dup cluster (q71), and
    * (c) sits in the train split with no eval n-gram collision (q70).
    * All three membership sets join on doc_id — the filter side of each is
    * tiny relative to the corpus at the final join (quality pass is a
    * per-row predicate; keep-best and decontamination reduce to id sets),
    * and every constituent keeps its own scale shape from its gated form. */
  def cleanCorpus(spark: SparkSession, dir: String): DataFrame = {
    val pass = TextStats.gopherFilter(spark, dir)
      .filter(col("pass")).select(col("doc_id"))
    val keep = Dedup.dedupKeepBest(spark, dir)
      .filter(col("keep")).select(col("doc_id"))
    decontaminatedTrain(spark, dir)
      .join(pass, "doc_id")
      .join(keep, "doc_id")
      .select(col("doc_id"), col("lang"), col("source"))
  }

  /** q184: the pipeline FUNNEL — the one-row audit a production
    * training-data build ships with its output: document and token counts
    * surviving each successive gate (raw → train split → Gopher quality →
    * dedup keep-best → decontamination → temperature mixture), i.e. the
    * cumulative-conjunction form of q175's per-document decision table
    * plus the q181 mixture as the final stage. This is the number
    * everybody asks first ("how many tokens made it, and which stage ate
    * them?") and the regression canary between pipeline versions.
    * Composes only gated operators; one corpus-wide aggregate at the end.
    * Mixture rates are the q181 full-corpus rates applied to survivors —
    * composition of the gated ops verbatim, so the oracle restates each
    * stage exactly. */
  def pipelineFunnel(spark: SparkSession, dir: String): DataFrame = {
    val dec = curationDecision(spark, dir)
    val temp = temperatureMixture(spark, dir)
      .select(col("doc_id"), col("keep").as("temp_keep"))
    val toks = documents(spark, dir).select(col("doc_id"),
      size(TextStats.tokens(col("text"))).cast("long").as("n_tokens"))
    val j = dec.join(temp, "doc_id").join(toks, "doc_id")
      .withColumn("s1", col("in_train"))
      .withColumn("s2", col("s1") && col("gopher_ok"))
      .withColumn("s3", col("s2") && col("dedup_keep"))
      .withColumn("s4", col("s3") && col("decontaminated"))
      .withColumn("s5", col("s4") && col("temp_keep"))
    def cnt(c: String) = sum(when(col(c), 1L).otherwise(0L))
    def tok(c: String) = sum(when(col(c), col("n_tokens")).otherwise(0L))
    j.agg(
      count(lit(1)).as("docs_raw"), sum(col("n_tokens")).as("tokens_raw"),
      cnt("s1").as("docs_train"), tok("s1").as("tokens_train"),
      cnt("s2").as("docs_quality"), tok("s2").as("tokens_quality"),
      cnt("s3").as("docs_dedup"), tok("s3").as("tokens_dedup"),
      cnt("s4").as("docs_decontam"), tok("s4").as("tokens_decontam"),
      cnt("s5").as("docs_final"), tok("s5").as("tokens_final"))
  }

  /** q175: the curation DECISION TABLE — q73's clean-corpus pipeline
    * re-emitted as an audit view: instead of silently producing the
    * surviving subset, every document gets one row with every gate's
    * verdict (train-split membership, Gopher hard rule, dedup keep-best,
    * eval-n-gram decontamination) and the final conjunction. This is the
    * "why was my document dropped" view a production curation pass ships
    * next to its output — the drop REASON distribution is one groupBy on
    * this table. Composes only gated operators (q38/q66/q71/q69), all
    * riding the session memo where they share work (the cluster map, the
    * pair graph), plus one broadcast-able anti-flag join on the flagged
    * train ids. Oracle: the q73 WITH chain with a per-gate boolean tail
    * instead of the inner-join filter. */
  def curationDecision(spark: SparkSession, dir: String): DataFrame = {
    val splits = documents(spark, dir)
      .select(col("doc_id"), (splitOf(col("text")) === "train").as("in_train"))
    val gopher = TextStats.gopherFilter(spark, dir)
      .select(col("doc_id"), col("pass").as("gopher_ok"))
    val keep = Dedup.dedupKeepBest(spark, dir)
      .select(col("doc_id"), col("keep").as("dedup_keep"))
    val flagged = decontamination(spark, dir)
      .select(col("train_id").as("doc_id")).distinct()
      .withColumn("contaminated", lit(true))
    splits.join(gopher, "doc_id").join(keep, "doc_id")
      .join(flagged, Seq("doc_id"), "left")
      .select(col("doc_id"), col("in_train"), col("gopher_ok"), col("dedup_keep"),
        coalesce(!col("contaminated"), lit(true)).as("decontaminated"))
      .withColumn("keep_final",
        col("in_train") && col("gopher_ok") && col("dedup_keep") && col("decontaminated"))
  }

  /** q53: train/test contamination audit — near-duplicate pairs (the exact
    * Jaccard graph, q25) that STRADDLE split boundaries. A test document
    * with a train-side near-duplicate is leakage: eval scores measure
    * memorization, not generalization. This is the audit every serious
    * training pipeline runs before an eval split ships; composing it from
    * the gated dedup + split operators keeps it oracle-checkable end-to-end.
    * One extra broadcast-able join over the (tiny) pair graph. */
  def splitContamination(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.nearDupPairs(spark, dir)
    val splits = documents(spark, dir)
      .select(col("doc_id"), splitOf(col("text")).as("split"))
    pairs
      .join(splits.select(col("doc_id").as("doc_a"), col("split").as("split_a")), "doc_a")
      .join(splits.select(col("doc_id").as("doc_b"), col("split").as("split_b")), "doc_b")
      .filter(col("split_a") =!= col("split_b"))
      .select(col("doc_a"), col("doc_b"), col("split_a"), col("split_b"), col("jaccard"))
  }

  /** q101: split distribution drift — per-language KL-divergence terms
    * between the train and val splits' language mixtures: the monitoring
    * view that catches a content-hash split (or an upstream filter) that
    * skews a language's share between what a model trains on and what it
    * validates against. Probabilities are Laplace-smoothed (+1 per
    * language), so a language absent from one split contributes a finite,
    * well-defined term instead of a division by zero — the standard
    * mixture-drift formulation. Plan: one scan → per-(lang) conditional
    * partial+final aggregate; the split totals and language count are a
    * one-row aggregate broadcast back (never a window). KL terms are
    * natural-log doubles rounded at 4 dp (q60's ln-parity rule). */
  def splitDrift(spark: SparkSession, dir: String): DataFrame = {
    val counts = documents(spark, dir)
      .select(col("lang"), splitOf(col("text")).as("split"))
      .filter(col("split").isin("train", "val"))
      .groupBy(col("lang"))
      .agg(sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
        sum(when(col("split") === "val", 1L).otherwise(0L)).as("n_val"))
    val totals = counts.agg(
      sum(col("n_train")).as("tot_train"),
      sum(col("n_val")).as("tot_val"),
      count(lit(1)).as("n_langs"))
    counts.crossJoin(broadcast(totals))
      .select(col("lang"), col("n_train"), col("n_val"),
        ((col("n_train") + 1).cast("double") / (col("tot_train") + col("n_langs")))
          .as("p_train"),
        ((col("n_val") + 1).cast("double") / (col("tot_val") + col("n_langs")))
          .as("p_val"))
      .select(col("lang"), col("n_train"), col("n_val"),
        round(col("p_train"), 4).as("p_train"),
        round(col("p_val"), 4).as("p_val"),
        round(col("p_train") * log(col("p_train") / col("p_val")), 4).as("kl_term"))
  }

  /** Per-document shard assignment: 16 content-hash bits mod `nShards`.
    * Hash-mod (never row_number over a global sort) is the point — shard
    * membership is a pure function of content, so there is NO global sort
    * at any scale, appends never move existing documents between shards,
    * and a rerun after ingest only touches the shards the new documents
    * landed in. The hash is four hex digits PARSED as an integer (conv /
    * '0x' cast — the q110 rule), not the q38 ascii trick: ascii-of-hex-char
    * mod 16 collapses to the last nibble's 10 glyph values, leaving shards
    * 10-15 empty. Parsed nibbles are uniform for any power-of-two count. */
  def shardOf(c: Column, nShards: Int): Column =
    pmod(conv(substring(md5(c.cast("binary")), 1, 4), 16, 10).cast("long"),
      lit(nShards.toLong))

  /** q186: the training-shard MANIFEST — the WebDataset-style contract a
    * trainer validates before reading a shard: per shard, how many
    * documents, how many tokens, and an order-insensitive content checksum
    * (sum of 48-bit md5 prefixes, the q110 discipline — commutative, so
    * partitioning-invariant and engine-portable). Shards are content-hash
    * assigned ([[shardOf]]); the plan is one scan → one partial+final
    * aggregate keyed by shard_id (nShards groups of state through the
    * shuffle, whatever the corpus size). At 100 TB this exact query runs
    * ahead of the shard writer, and re-running it after an append charges
    * only a full scan — no shard reassignment, no sort. */
  def shardManifest(spark: SparkSession, dir: String, nShards: Int = 16): DataFrame =
    manifestOn(documents(spark, dir), nShards)

  /** The q186 aggregate with the checksum still DECIMAL(38,0) — the
    * mergeable form ([[graft.streaming.ShardManifestStream]] sums it
    * incrementally; decimal addition is exact and associative, so
    * incremental ≡ recompute bit-for-bit). Computes shard_id from content
    * unless the frame already carries one (the written-layout path of
    * q189 reads it back as a partition column). */
  private[graft] def manifestRaw(docs: DataFrame, nShards: Int): DataFrame = {
    val withShard =
      if (docs.columns.contains("shard_id")) docs
      else docs.withColumn("shard_id", shardOf(col("text"), nShards))
    withShard
      .select(col("shard_id"),
        size(TextStats.tokens(col("text"))).cast("long").as("n_tokens"),
        // 48-bit hash prefixes summed in exact decimal (the q110 rule: a
        // Long sum crosses 2^63 at ~30k rows/shard) and gated as a string
        conv(substring(md5(concat_ws("|", col("doc_id"), col("text"))), 1, 12), 16, 10)
          .cast("decimal(38,0)").as("h"))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("h")).cast("decimal(38,0)").as("checksum"))
  }

  /** The gate edge: checksum as a string (a float64 oracle edge would
    * silently round past 2^53). */
  private def manifestOn(docs: DataFrame, nShards: Int): DataFrame =
    manifestRaw(docs, nShards)
      .select(col("shard_id"), col("n_docs"), col("n_tokens"),
        col("checksum").cast("string").as("checksum"))

  /** q189: the shard WRITER round-trip — materialize the corpus as a
    * shard_id-partitioned managed table (the physical layout a trainer's
    * data loader reads: one directory per shard, shard choice content-pure
    * per [[shardOf]]), then recompute the q186 manifest FROM THE WRITTEN
    * LAYOUT, with shard_id read back as a partition column. The gate is
    * the no-answer-change contract (the q47/q167 pattern): writing must
    * lose, duplicate, and reorder nothing — rows, token sums, and the
    * order-insensitive checksums all hash-match the oracle computed from
    * the SOURCE table. Reading one shard back prunes to its directory
    * (PartitionFilters — pinned in CurationSpec). At 100 TB the write is
    * one shuffle-free pass (shard_id is a narrow projection; the dynamic
    * writer splits files by partition value). */
  def shardedWriteGate(spark: SparkSession, dir: String, nShards: Int = 16): DataFrame = {
    // drop + delete the managed location (a previous session's files would
    // otherwise fail the create — the AnnIndex.build discipline)
    spark.sql("DROP TABLE IF EXISTS graft_shards")
    graft.sink.ManagedPaths.clearStale(spark, "graft_shards")
    documents(spark, dir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        shardOf(col("text"), nShards).as("shard_id"))
      .write.mode("overwrite").format("parquet").partitionBy("shard_id")
      .saveAsTable("graft_shards")
    manifestOn(spark.table("graft_shards"), nShards)
  }

  /** Partition-scoped DELETE from a written shard layout — how a deletion
    * reaches the delivery layer at 100 TB: `gone` (doc_id, shard_id —
    * shard membership is content-pure, so the request can compute it
    * without touching the table) names the affected partitions; only
    * those are rewritten, via one semi-join-scoped scan + anti-join +
    * dynamic partition overwrite. Untouched shards' files are never
    * opened.
    *
    * The emptied-partition trap: a shard whose EVERY document was deleted
    * contributes no rows to the snapshot, so dynamic overwrite never
    * claims its partition — the deleted files would stay live. Affected
    * shards absent from the snapshot are dropped explicitly (metadata +
    * files); the decision list is ≤ nShards rows of driver metadata. */
  def deleteFromShards(spark: SparkSession, table: String, gone: DataFrame): Unit = {
    val affected = graft.functions.Materialize(
      gone.select(col("shard_id")).distinct())
    val cols = spark.table(table).columns
    val snap = graft.functions.Materialize(
      spark.table(table)
        .join(broadcast(affected), Seq("shard_id"), "left_semi")
        .join(broadcast(gone.select(col("doc_id"))), Seq("doc_id"), "left_anti")
        .select(cols.toIndexedSeq.map(col): _*)
        .repartition(col("shard_id")))
    // conf-isolated dynamic overwrite — a session set/restore dance races
    // concurrent legs (see graft.sink.DynamicOverwrite)
    graft.sink.DynamicOverwrite.insertInto(snap, table)
    val present = snap.select(col("shard_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    val emptied = affected.collect().map(_.getLong(0)).filterNot(present)
    for (s <- emptied)
      spark.sql(s"ALTER TABLE $table DROP IF EXISTS PARTITION (shard_id=$s)")
  }

  /** q211: the GDPR loop closed at the DELIVERY layer — deletions must
    * reach the training shards a loader actually reads, not just the
    * indexes. Writes the shard layout, deletes every content-bucket-<10
    * document through [[deleteFromShards]] (affected partitions only),
    * then emits the manifest RECOMPUTED FROM THE WRITTEN LAYOUT plus a
    * per-shard `touched` flag. The oracle states the manifest straight
    * from the retained corpus — the rewritten layout must be
    * indistinguishable from one never containing the deleted docs — and
    * restates `touched` as "this shard held a deleted doc". */
  def shardedDeleteGate(spark: SparkSession, dir: String, nShards: Int = 16): DataFrame = {
    val t = "graft_shards_del"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    graft.sink.ManagedPaths.clearStale(spark, t)
    documents(spark, dir)
      .select(col("doc_id"), col("text"),
        shardOf(col("text"), nShards).as("shard_id"))
      .write.mode("overwrite").format("parquet").partitionBy("shard_id")
      .saveAsTable(t)
    val gone = graft.functions.Materialize(documents(spark, dir)
      .filter(contentBucket(col("text")) < 10)
      .select(col("doc_id"), shardOf(col("text"), nShards).as("shard_id")))
    deleteFromShards(spark, t, gone)
    val touched = gone.select(col("shard_id")).distinct()
      .withColumn("touched", lit(true))
    manifestOn(spark.table(t), nShards)
      .join(touched, Seq("shard_id"), "left")
      .select(col("shard_id"), col("n_docs"), col("n_tokens"), col("checksum"),
        coalesce(col("touched"), lit(false)).as("touched"))
  }

  /** UPSERT into a written shard layout — the corpus version rollover:
    * remove the outgoing rows (deleted docs AND the old versions of edited
    * docs) through [[deleteFromShards]], then append the incoming rows
    * (new versions + brand-new docs) into their content-addressed
    * partitions with a plain append — no overwrite, so the append leg
    * touches exactly the partitions the new rows land in. Because shard
    * membership is content-pure ([[shardOf]]), an EDIT naturally moves a
    * document between shards: its old shard is rewritten by the delete
    * leg, its new shard gains a file from the append leg, and every other
    * partition of a 100 TB layout is untouched. */
  def upsertShards(spark: SparkSession, table: String, gone: DataFrame,
      incoming: DataFrame): Unit = {
    deleteFromShards(spark, table, gone)
    val cols = spark.table(table).columns
    incoming.select(cols.toIndexedSeq.map(col): _*)
      .write.mode("append").insertInto(table)
  }

  /** q215: the version-rollover gate — v1 is written as the shard layout,
    * then q190's planted v2 transformation (every 7th doc edited, every
    * 13th dropped, content-bucket-<2 docs appended under +10⁶ ids) is
    * applied INCREMENTALLY through [[upsertShards]]. The manifest
    * recomputed from the upserted layout must equal a manifest computed
    * directly over v2 — the layout rolled forward partition-by-partition
    * must be indistinguishable from one written from v2 scratch. */
  def shardUpsertGate(spark: SparkSession, dir: String, nShards: Int = 16): DataFrame = {
    val t = "graft_shards_up"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    graft.sink.ManagedPaths.clearStale(spark, t)
    val v1 = documents(spark, dir).select(col("doc_id"), col("text"))
    v1.select(col("doc_id"), col("text"), shardOf(col("text"), nShards).as("shard_id"))
      .write.mode("overwrite").format("parquet").partitionBy("shard_id")
      .saveAsTable(t)
    // outgoing: dropped docs + the OLD versions of edited docs (old shard!)
    val gone = v1.filter(col("doc_id") % 13 === 0 ||
        (col("doc_id") % 7 === 0 && col("doc_id") % 13 =!= 0))
      .select(col("doc_id"), shardOf(col("text"), nShards).as("shard_id"))
    // incoming: edited docs' new versions (new content → possibly new
    // shard) + brand-new appends
    val incoming = v1
      .filter(col("doc_id") % 7 === 0 && col("doc_id") % 13 =!= 0)
      .select(col("doc_id"), concat(col("text"), lit(" v2")).as("text"))
      .unionByName(
        v1.filter(contentBucket(col("text")) < 2)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      .select(col("doc_id"), col("text"),
        shardOf(col("text"), nShards).as("shard_id"))
    upsertShards(spark, t, gone, incoming)
    manifestOn(spark.table(t), nShards)
  }

  /** q213: the METADATA-ONLY delete at the manifest layer. Every manifest
    * component is a commutative EXACT sum (Long counts, DECIMAL(38,0)
    * checksum — the ShardManifestStream merge discipline), so a deletion's
    * effect on the manifest is one NEGATIVE delta computed from the
    * deleted docs alone: stored ⊕ (−manifest(gone)) is bit-identical to
    * recomputing over the retained corpus, with the corpus never
    * rescanned. This is what makes q190's "which shards changed" diff a
    * kilobyte operation even under deletions at 100 TB. A shard whose
    * every doc was deleted folds to n_docs = 0 and drops out — exactly
    * the recomputed manifest's shape. The oracle IS the recomputation:
    * the q186 statement over the retained docs. */
  def manifestDeleteGate(spark: SparkSession, dir: String, nShards: Int = 16): DataFrame = {
    val all = documents(spark, dir).select(col("doc_id"), col("text"))
    val stored = manifestRaw(all, nShards) // stands in for the maintained view
    val gone = all.filter(contentBucket(col("text")) < 10)
    val delta = manifestRaw(gone, nShards)
      .select(col("shard_id"), col("n_docs").as("d_docs"),
        col("n_tokens").as("d_tokens"), col("checksum").as("d_sum"))
    stored.join(delta, Seq("shard_id"), "full_outer")
      .select(col("shard_id"),
        (coalesce(col("n_docs"), lit(0L)) - coalesce(col("d_docs"), lit(0L))).as("n_docs"),
        (coalesce(col("n_tokens"), lit(0L)) - coalesce(col("d_tokens"), lit(0L))).as("n_tokens"),
        (coalesce(col("checksum"), lit(0).cast("decimal(38,0)"))
          - coalesce(col("d_sum"), lit(0).cast("decimal(38,0)")))
          .cast("decimal(38,0)").as("checksum"))
      .filter(col("n_docs") > 0)
      .select(col("shard_id"), col("n_docs"), col("n_tokens"),
        col("checksum").cast("string").as("checksum"))
  }

  /** q190: SHARD-LEVEL snapshot diff — the "which shards must the trainer
    * re-fetch" decision between two corpus versions, answered from two
    * manifests (kilobytes) instead of a doc-level table diff (the q113
    * form): per shard, both versions' doc counts and whether the exact
    * checksums agree. Uses q113's deterministically planted v2 (every 7th
    * doc edited, every 13th dropped, content-bucket<2 appended under +10⁶
    * ids). Because shard choice is content-pure, an EDIT moves the
    * document between shards — both its old and new shard correctly flag
    * changed, which is exactly what a content-addressed layout must do.
    * Plan: two q186 aggregates + one full-outer merge of ≤nShards rows.
    * At 100 TB the v2 manifest comes from
    * [[graft.streaming.ShardManifestStream]]'s maintained view, making
    * this diff a metadata-only operation. */
  def manifestDiff(spark: SparkSession, dir: String, nShards: Int = 16): DataFrame = {
    val v1 = documents(spark, dir).select(col("doc_id"), col("text"))
    val v2 = v1.filter(col("doc_id") % 13 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"))
      .unionByName(
        v1.filter(contentBucket(col("text")) < 2)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    val m1 = manifestRaw(v1, nShards)
      .select(col("shard_id"), col("n_docs").as("d1"), col("checksum").as("s1"))
    val m2 = manifestRaw(v2, nShards)
      .select(col("shard_id"), col("n_docs").as("d2"), col("checksum").as("s2"))
    m1.join(m2, Seq("shard_id"), "full_outer")
      .select(col("shard_id"),
        coalesce(col("d1"), lit(0L)).as("docs_v1"),
        coalesce(col("d2"), lit(0L)).as("docs_v2"),
        (col("s1") <=> col("s2")).as("unchanged"))
  }

  /** q192: deterministic EPOCH ordering — the data-loader shuffle, done
    * engine-side with zero global sorts: within each shard, each epoch
    * orders documents by a salted content hash (md5 of "epoch:text"), so
    * every epoch sees a different permutation, every permutation is a pure
    * function of (epoch, content) — replayable across reruns, clusters,
    * and partitionings — and consecutive epochs are decorrelated without
    * any RNG state to manage. The gate emits the first `k` documents per
    * (shard, epoch): the rank bound is pushed below the per-shard sort
    * (WindowGroupLimit, the q61 shape — pinned in PlanShapeSpec), so each
    * map task ships at most k rows per (shard, epoch) into the shuffle
    * whatever the corpus size. The full-ordering form (drop the filter) is
    * what a shard-local loader consumes: per-shard sorts only, nShards
    * independent tasks, never a corpus-wide ordering. */
  def epochOrder(spark: SparkSession, dir: String, epochs: Int = 2, k: Int = 3,
      nShards: Int = 16): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard_id"), col("epoch"))
      .orderBy(md5(concat(col("epoch").cast("string"), lit(":"), col("text"))
        .cast("binary")).asc, col("doc_id").asc)
    documents(spark, dir)
      .select(col("doc_id"), col("text"), shardOf(col("text"), nShards).as("shard_id"))
      .crossJoin(broadcast(
        spark.range(1, epochs + 1).select(col("id").cast("int").as("epoch"))))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("epoch"), col("shard_id"), col("doc_id"), col("rk"))
  }

  /** q193: PACKING-EFFICIENCY audit over q62's greedy token packing —
    * per bucket: sequence count, packed token total, nominal capacity
    * (n_seqs · budget) and the integer basis-point fill rate. Fill can
    * exceed 10000 bp: the greedy cum-div assignment charges a straddling
    * document wholly to the sequence it starts in — the metric honestly
    * shows where the packer over-stuffs (long docs) vs leaves tail waste
    * (short buckets). One extra `buckets`-group aggregate over the q62
    * plan; all-integer, so the audit hash-matches the oracle's restated
    * chain. */
  /** q194: the per-source DATA CARD — the one-table corpus profile a
    * dataset release ships: per source, document and token counts, the
    * Gopher-quality pass rate and the near-duplicate rate, both in integer
    * basis points (exact, so the whole card hash-matches an oracle that
    * recomputes every underlying gate). Composes only gated operators
    * (q66 Gopher, q71 keep-best — both riding the session memo's shared
    * cluster map), plus ONE source-keyed aggregate; the source column of
    * q191's leakage matrix and this card together are the mixture
    * designer's source-selection evidence. */
  def sourceProfile(spark: SparkSession, dir: String): DataFrame = {
    val docs = documents(spark, dir).select(col("doc_id"), col("source"),
      size(TextStats.tokens(col("text"))).cast("long").as("n_tok"))
    val gopher = TextStats.gopherFilter(spark, dir).select(col("doc_id"), col("pass"))
    val keep = Dedup.dedupKeepBest(spark, dir).select(col("doc_id"), col("keep"))
    docs.join(gopher, "doc_id").join(keep, "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        sum(when(col("pass"), 1L).otherwise(0L)).as("nq"),
        sum(when(col("keep"), 0L).otherwise(1L)).as("nd"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        expr("(nq * 10000L) div n_docs").as("quality_bp"),
        expr("(nd * 10000L) div n_docs").as("dup_bp"))
  }

  /** q195: contamination-method AGREEMENT matrix — the audit of the
    * audits: three lexical leak detectors (exact shared 5-gram q69,
    * containment ≥ 0.5 q145, near-dup train↔test straddle q53) each
    * reduced to its flagged TRAIN-doc set, with per-method counts and the
    * overlap against the exact-5-gram reference set. This is how a
    * pipeline picks its decontamination battery: a method whose flags are
    * a subset of exact's adds nothing; one with near-zero overlap is
    * finding a different leak class (paraphrase vs verbatim) and earns
    * its runtime. Composes only gated operators (the pair graph rides the
    * session memo); three O(flagged) anti/semi joins + one 3-row union. */
  def contaminationAgreement(spark: SparkSession, dir: String): DataFrame = {
    val exact = decontamination(spark, dir).select(col("train_id")).distinct()
    val cont = containmentScores(spark, dir)
      .filter(col("containment") >= 0.5).select(col("train_id")).distinct()
    val straddle = splitContamination(spark, dir)
      .filter((col("split_a") === "train" && col("split_b") === "test") ||
        (col("split_a") === "test" && col("split_b") === "train"))
      .select(when(col("split_a") === "train", col("doc_a"))
        .otherwise(col("doc_b")).as("train_id"))
      .distinct()
    val ref = exact.withColumn("in_exact", lit(true))
    Seq(("exact_5gram", exact), ("containment_0_5", cont),
        ("neardup_straddle", straddle))
      .map { case (name, ids) =>
        ids.join(ref, Seq("train_id"), "left")
          .agg(count(lit(1)).as("n_flagged"),
            // coalesce: an empty flagged set sums to NULL, the gate wants 0
            coalesce(sum(when(col("in_exact"), 1L).otherwise(0L)), lit(0L))
              .as("overlap_exact"))
          .select(lit(name).as("method"), col("n_flagged"), col("overlap_exact"))
      }.reduce(_ unionByName _)
  }

  def packingEfficiency(spark: SparkSession, dir: String, budget: Int = 2048,
      buckets: Int = 32): DataFrame =
    tokenPacking(spark, dir, budget, buckets)
      .groupBy(col("bucket"))
      .agg(countDistinct(col("seq_id")).as("n_seqs"),
        sum(col("n_tok")).as("total_tokens"))
      .select(col("bucket"), col("n_seqs"), col("total_tokens"),
        (col("n_seqs") * budget).as("capacity"),
        expr(s"(total_tokens * 10000L) div (n_seqs * ${budget}L)").as("fill_bp"))

  private def W = org.apache.spark.sql.expressions.Window

  /** The waterfilling solve on an already-aggregated (source, n_tokens)
    * table — factored out so the spec can drive it with hand corpora.
    * Finds the LARGEST integer cap C with Σ_s min(t_s, C) ≤ B, closed
    * form, no iteration: with sources sorted ascending by tokens,
    * g(i) = Σ_{j≤i} t_j + (n−i)·t_i equals Σ_s min(t_s, t_i); take
    * i* = max{i : g(i) ≤ B} and C = t_{i*} + ⌊(B − g(i*)) / (n − i*)⌋.
    * No qualifying i (a balanced corpus, where even the smallest source's
    * level exceeds the budget) → C = ⌊B/n⌋; i* = n happens only when
    * B ≥ total → C = t_n and nothing is capped. The solve runs on the
    * #sources-row table: the single-partition window orders dozens of
    * rows, never data. */
  private[graft] def waterfillOn(per: DataFrame, budget: Column): DataFrame = {
    val w = W.orderBy(col("n_tokens").asc, col("source").asc)
    val ranked = per
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("pre", sum(col("n_tokens")).over(w.rowsBetween(Long.MinValue, 0)))
    val stats = per.agg(count(lit(1)).cast("long").as("n"),
        sum(col("n_tokens")).as("total"))
      .withColumn("b", budget)
    val g = ranked.crossJoin(broadcast(stats))
      .withColumn("g", col("pre") + (col("n") - col("i")) * col("n_tokens"))
    // argmax-by-i via struct max: i is unique and leads the struct.
    val cap = g.agg(
        max(when(col("g") <= col("b"),
          struct(col("i"), col("g"), col("n_tokens")))).as("s"),
        first(col("n")).as("n"), first(col("b")).as("b"))
      .select(when(col("s").isNull, expr("b div n"))
        .when(col("s.i") === col("n"), col("s.n_tokens"))
        .otherwise(col("s.n_tokens") + expr("(b - s.g) div (n - s.i)"))
        .as("cap"))
    per.crossJoin(broadcast(cap))
      .select(col("source"), col("n_tokens"), col("cap"),
        least(col("n_tokens"), col("cap")).as("alloc_tokens"),
        (col("n_tokens") > col("cap")).as("capped"))
  }

  /** q197: token-budget WATERFILLING — the mixture-capping policy solve a
    * training-mixture designer runs before sampling: given per-source
    * exact token totals and a global budget (60 % of the corpus here),
    * find the largest per-source cap whose allocation fits the budget
    * ([[waterfillOn]]) and state every source's allocation under it.
    * All-integer, so cap and allocations hash-match the oracle's restated
    * solve. Scale: one source-keyed partial+final aggregate over the
    * corpus feeds a #sources-row solve — corpus size only ever crosses
    * the first aggregate. */
  def waterfillCaps(spark: SparkSession, dir: String, budgetPct: Int = 60): DataFrame = {
    val per = documents(spark, dir)
      .groupBy(col("source"))
      .agg(sum(size(TextStats.tokens(col("text"))).cast("long")).as("n_tokens"))
    waterfillOn(per, expr(s"(total * ${budgetPct}L) div 100L"))
  }

  /** q198: the q197 policy APPLIED — deterministic doc-level selection
    * under each source's cap: within a source, documents are ranked by
    * content hash (md5(text), doc_id — the q192 kernel: layout-, order-
    * and partitioning-independent), and a document is kept while the
    * running token total stays within the cap. Per source the gate states
    * docs kept, tokens kept and the basis-point cap utilization — an
    * inclusion-priority contract a 100 TB rerun reproduces byte-for-byte
    * after any repartition, and under appends only lower-priority
    * documents can be displaced. Scale: the cumulative sum is a
    * per-source window (sources partition the corpus — no global sort);
    * the cap table broadcasts. */
  def waterfillApply(spark: SparkSession, dir: String, budgetPct: Int = 60): DataFrame = {
    val caps = waterfillCaps(spark, dir, budgetPct).select(col("source"), col("cap"))
    val docs = documents(spark, dir)
      .select(col("doc_id"), col("source"),
        size(TextStats.tokens(col("text"))).cast("long").as("n_tok"),
        md5(col("text").cast("binary")).as("h"))
    saltedCumsum(docs)
      .join(broadcast(caps), "source")
      .filter(col("cum") <= col("cap"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_tok")).as("tok_kept"),
        first(col("cap")).as("cap"))
      .select(col("source"), col("cap"), col("n_kept"), col("tok_kept"),
        expr("(tok_kept * 10000L) div cap").as("util_bp"))
  }

  /** Exact distributed running-total in content-hash priority order —
    * the scale form of `sum OVER (PARTITION BY source ORDER BY h)`. A
    * window partitioned only by `source` funnels each source's ENTIRE
    * doc set through one task (5 TB/task at 100 TB with 20 sources); but
    * the priority key IS the md5 hex string, so its first two hex chars
    * `p` are an order-preserving salt: ordering by h ≡ ordering by
    * (p, h). Phase 1 aggregates token sums per (source, p) — 256·n_src
    * rows — and prefix-sums them with a TINY window; phase 2 broadcasts
    * those bases back and runs the real window partitioned by
    * (source, p), 256× finer, stragglerless. Exact, not approximate:
    * cum(doc) = base(source, p) + within-(source, p) running total. */
  private[graft] def saltedCumsum(docs: DataFrame): DataFrame = {
    val salted = docs.withColumn("p", substring(col("h"), 1, 2))
    val base = salted.groupBy(col("source"), col("p"))
      .agg(sum(col("n_tok")).as("ptok"))
      .withColumn("base", coalesce(sum(col("ptok")).over(
        W.partitionBy(col("source")).orderBy(col("p").asc)
          .rowsBetween(Long.MinValue, -1)), lit(0L)))
      .select(col("source"), col("p"), col("base"))
    val w = W.partitionBy(col("source"), col("p"))
      .orderBy(col("h").asc, col("doc_id").asc)
    salted.join(broadcast(base), Seq("source", "p"))
      .withColumn("cum", col("base") + sum(col("n_tok")).over(w.rowsBetween(Long.MinValue, 0)))
  }

  /** q199: covariate-matched DOWNSAMPLING — reshape train's length
    * distribution to test's (the held-out set is the profile the
    * evaluation actually sees): per 200-char length bucket, test's share
    * in integer basis points is the target; the largest feasible matched
    * size M = min_b ⌊n_train_b · 10000 / p_b⌋ over test-occupied buckets;
    * per-bucket quota k_b = ⌊p_b · M / 10000⌋; each bucket keeps its k_b
    * highest-priority train docs (content-hash order, the q198
    * discipline). The gate states, per bucket, both counts, the target,
    * the quota and the order-insensitive sum of kept doc_ids — the
    * selection pinned exactly without ordering the output. All-integer.
    * Scale: two bucket-keyed aggregates and one per-bucket window; the
    * quota solve touches a ≤10-row table. */
  def matchedResample(spark: SparkSession, dir: String): DataFrame = {
    val d = documents(spark, dir).select(col("doc_id"), col("text"),
      splitOf(col("text")).as("split"),
      least(expr("n_chars div 200L"), lit(9L)).as("bucket"))
    val test = d.filter(col("split") === "test")
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_test"))
    val target = test.crossJoin(broadcast(test.agg(sum(col("n_test")).as("t_tot"))))
      .select(col("bucket"), col("n_test"),
        expr("(n_test * 10000L) div t_tot").as("p_bp"))
      .filter(col("p_bp") > 0L)
    val train = d.filter(col("split") === "train")
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_train"))
    val joined = target.join(train, Seq("bucket"), "left")
      .na.fill(0L, Seq("n_train"))
    val quota = joined
      .crossJoin(broadcast(
        joined.agg(min(expr("(n_train * 10000L) div p_bp")).as("m"))))
      .select(col("bucket"), col("n_train"), col("n_test"), col("p_bp"),
        expr("(p_bp * m) div 10000L").as("k_quota"))
    // distributed exact rank (the saltedCumsum discipline): rank within
    // bucket by (h, doc_id) = count of earlier salt groups + rank within
    // the 256× finer (bucket, p) partition — no whole-bucket sort task
    val salted = d.filter(col("split") === "train")
      .withColumn("h", md5(col("text").cast("binary")))
      .withColumn("p", substring(col("h"), 1, 2))
    val base = salted.groupBy(col("bucket"), col("p"))
      .agg(count(lit(1)).as("pn"))
      .withColumn("base", coalesce(sum(col("pn")).over(
        W.partitionBy(col("bucket")).orderBy(col("p").asc)
          .rowsBetween(Long.MinValue, -1)), lit(0L)))
      .select(col("bucket"), col("p"), col("base"))
    val w = W.partitionBy(col("bucket"), col("p"))
      .orderBy(col("h").asc, col("doc_id").asc)
    val kept = salted.join(broadcast(base), Seq("bucket", "p"))
      .withColumn("rk", col("base") + row_number().over(w).cast("long"))
      .join(broadcast(quota.select(col("bucket"), col("k_quota"))), "bucket")
      .filter(col("rk") <= col("k_quota"))
      .groupBy(col("bucket")).agg(sum(col("doc_id")).as("kept_id_sum"))
    quota.join(kept, Seq("bucket"), "left")
      .na.fill(0L, Seq("kept_id_sum"))
  }
}
