package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.documents
import graft.functions.Materialize

/** Model-based quality filtering — the curation step the big pretraining
  * pipelines run after rule filters: distill an expensive labeling rule
  * into a cheap learned scorer and apply THAT to the corpus. The engine
  * trains the model itself, as a Spark job, with the exact-integer
  * fixed-point discipline of the PageRank family (Graph.pageRankOn)
  * applied to LEARNING:
  *
  *  - features and labels are integer micro-units (10⁶ = 1.0) from the
  *    q22 character-class/stopword/length statistics;
  *  - training is full-batch gradient descent on least squares, `iters`
  *    fixed iterations at learning rate 1/8 — every step is integer
  *    multiply / truncating `div` (Spark `div` and DuckDB `//` agree on
  *    negatives: both truncate toward zero), so the trained weights and
  *    every score are BITWISE identical across partitionings AND engines,
  *    and the q163 gate hash-matches an unrolled DuckDB twin of the whole
  *    training run — the oracle re-trains the model and agrees weight for
  *    weight, score for score;
  *  - per iteration the plan is: broadcast the 5-weight row onto the
  *    feature scan, one partial+final aggregate for the 5 gradient sums —
  *    kilobytes of state through the shuffle, no collect, no driver math.
  *    At 100 TB each iteration is one pass; the feature frame is
  *    `Materialize`d once and reused by all iterations.
  *
  * Label: a Gopher-style hard rule (alpha ratio ≥ 0.55 ∧ ≥ 5 tokens ∧ ≥ 1
  * stopword) — a THRESHOLD rule the linear probe can only approximate,
  * which is the realistic distillation setting. Overflow headroom: the
  * gradient sum |Σ e·f| ≤ n·2·10¹², safe in Long to ~4.6M rows; at
  * warehouse scale set `spark.graft.quality.decimalGrads=true` and the
  * sums move to DECIMAL(38,0) (exact and associative, so bit-exactness
  * survives — see [[trainOn]]; Long default keeps oracle parity with
  * DuckDB's BIGINT inputs at gate scale).
  */
object QualityProbe {

  private val M = 1000000L

  /** (doc_id, y, f0..f4) — all integer micro-units; f0 is the bias. */
  private[graft] def features(docs: DataFrame): DataFrame = {
    val t = col("text")
    docs.select(col("doc_id"),
        length(t).cast("long").as("L"),
        (length(t) - length(regexp_replace(t, "[A-Za-z]", ""))).cast("long").as("n_alpha"),
        (length(t) - length(regexp_replace(t, "[0-9]", ""))).cast("long").as("n_digit"),
        size(regexp_extract_all(t, lit("\\S+"), lit(0))).cast("long").as("n_tokens"),
        size(regexp_extract_all(lower(t),
          lit("\\b(the|a|of|and|in|to)\\b"), lit(0))).cast("long").as("n_stop"))
      .selectExpr("doc_id",
        s"""CASE WHEN (n_alpha * ${M}L) div greatest(L, 1L) >= 550000
           | AND n_tokens >= 5 AND n_stop > 0
           | THEN ${M}L ELSE 0L END AS y""".stripMargin,
        s"${M}L AS f0",
        s"(n_alpha * ${M}L) div greatest(L, 1L) AS f1",
        s"least(${M}L, (n_stop * 4L * ${M}L) div greatest(n_tokens, 1L)) AS f2",
        s"least(${M}L, (n_tokens * ${M}L) div 64L) AS f3",
        s"(n_digit * ${M}L) div greatest(L, 1L) AS f4")
  }

  private val Dot = "w0*f0 + w1*f1 + w2*f2 + w3*f3 + w4*f4"

  /** Trained weights after `iters` GD steps, as a 1-row (w0..w4) frame.
    *
    * Overflow headroom knob: `spark.graft.quality.decimalGrads=true` sums
    * the gradients in DECIMAL(38,0) instead of Long. The per-row product
    * |e·f| ≤ 2·10¹² always fits a Long; only the corpus-wide SUM crosses
    * the Long cliff (documented: >4.6M rows). Decimal addition is exact
    * and associative, and both `div` paths truncate toward zero
    * (IntegralDivide on Long and on Decimal), so below the cliff the two
    * modes are BITWISE identical — QualityProbeSpec pins score-for-score
    * equality — and above it only the decimal mode stays correct. Default
    * off: Long keeps the hot path in primitive codegen and matches the
    * oracle's BIGINT inputs at gate scale. */
  private[graft] def trainOn(f: DataFrame, iters: Int): DataFrame = {
    val spark = f.sparkSession
    val decimalGrads = spark.conf
      .getOption("spark.graft.quality.decimalGrads").contains("true")
    def grad(j: Int): org.apache.spark.sql.Column =
      if (decimalGrads)
        expr(s"max(w$j) - (sum(cast(e * f$j as decimal(38,0))) div (8 * count(*) * ${M}L))").as(s"w$j")
      else
        expr(s"max(w$j) - sum(e * f$j) div (8 * count(*) * ${M}L)").as(s"w$j")
    var w: DataFrame = spark.range(1)
      .select((0 to 4).map(j => lit(0L).as(s"w$j")): _*)
    for (_ <- 1 to iters) {
      val e = f.crossJoin(broadcast(w))
        .withColumn("e", expr(s"($Dot) div ${M}L - y"))
      val agg = e.agg(grad(0), grad(1), grad(2), grad(3), grad(4))
      // The weight state is ONE row of five values — collect it and
      // re-inject as a local relation (schema preserved, so types and
      // values are bitwise identical to the former checkpoint). The
      // Materialize shape cost TWO jobs per iteration (the localCheckpoint
      // plus the next iteration's broadcast-build over the checkpoint
      // scan); a local relation broadcasts driver-side with no job, so
      // each GD step is exactly one pass over the feature checkpoint.
      w = spark.createDataFrame(
        java.util.Arrays.asList(agg.collect()(0)), agg.schema)
    }
    w
  }

  /** q163: train on the corpus, score every document — (doc_id, label,
    * score_micro), each value bitwise-reproduced by the oracle's unrolled
    * twin. */
  def trainedScores(spark: SparkSession, dir: String, iters: Int = 8): DataFrame = {
    // session-memoized: q163 and the q187 calibration both need the
    // feature table and the trained weights — train once per session.
    // decimalGrads is part of the weight key (bit-equal below the Long
    // cliff, but the key must encode every result-affecting input).
    val f = graft.functions.SessionMemo(spark, s"qp_features:$dir") {
      features(documents(spark, dir))
    }
    val dg = spark.conf.getOption("spark.graft.quality.decimalGrads").contains("true")
    val w = graft.functions.SessionMemo(spark, s"qp_weights:$dir:$iters:$dg") {
      trainOn(f, iters)
    }
    f.crossJoin(broadcast(w))
      .select(col("doc_id"), col("y").as("label"),
        expr(s"($Dot) div ${M}L").as("score_micro"))
  }

  /** q187: the probe's CALIBRATION TABLE (reliability diagram) — the
    * audit that decides whether the trained scorer's threshold is usable:
    * scores bucketed into `bins` equal-width bins over [0, 1.0) micro-units
    * (clamped at the ends — a linear probe can overshoot the label range),
    * per bin the document count, positive-label count, positive rate in
    * integer basis points, and the truncating mean score. Every output is
    * exact integer arithmetic on q163's bitwise-reproducible scores, so the
    * whole diagram hash-matches an oracle that RE-TRAINS the model and
    * re-derives each bin. Plan: the q163 train-and-score plan plus ONE
    * `bins`-group aggregate — at 100 TB the marginal cost over scoring is
    * a kilobyte of aggregate state. */
  def calibration(spark: SparkSession, dir: String, iters: Int = 8,
      bins: Int = 10): DataFrame = {
    trainedScores(spark, dir, iters)
      .select(
        expr(s"least(${bins - 1}L, greatest(0L, (score_micro * $bins) div ${M}L))")
          .as("bin"),
        col("label"), col("score_micro"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("label") === M, 1L).otherwise(0L)).as("n_pos"),
        sum(col("score_micro")).as("sum_score"))
      .select(col("bin"), col("n_docs"), col("n_pos"),
        expr("(n_pos * 10000L) div n_docs").as("pos_rate_bp"),
        expr("sum_score div n_docs").as("mean_score_micro"))
  }

  /** The q187 oracle: the full q163 training-run SQL as a derived table,
    * then the same integer binning/aggregation. */
  def calibrationOracleSql(iters: Int = 8, bins: Int = 10): String =
    s"""WITH scores AS (
       |${oracleSql(iters)}
       |)
       |SELECT bin, n_docs, n_pos,
       |  (n_pos * 10000 // n_docs)::BIGINT AS pos_rate_bp,
       |  (sum_score // n_docs)::BIGINT AS mean_score_micro
       |FROM (
       |  SELECT least(${bins - 1}, greatest(0, (score_micro * $bins) // 1000000))::BIGINT AS bin,
       |    count(*) AS n_docs,
       |    sum(CASE WHEN label = 1000000 THEN 1 ELSE 0 END)::BIGINT AS n_pos,
       |    sum(score_micro)::BIGINT AS sum_score
       |  FROM scores GROUP BY 1)""".stripMargin

  /** The q163 oracle: the ENTIRE training run unrolled in DuckDB SQL —
    * same features, same label rule, same `iters` integer GD steps. */
  def oracleSql(iters: Int = 8): String = {
    val steps = (1 to iters).map { i =>
      s"""e$i AS (SELECT f.*, w0, w1, w2, w3, w4,
         |  ((w0*f0 + w1*f1 + w2*f2 + w3*f3 + w4*f4) // 1000000) - y AS e
         |  FROM f CROSS JOIN w${i - 1}c),
         |w${i}c AS (SELECT
         |  max(w0) - ((sum(e*f0) // (8 * count(*) * 1000000))::BIGINT) AS w0,
         |  max(w1) - ((sum(e*f1) // (8 * count(*) * 1000000))::BIGINT) AS w1,
         |  max(w2) - ((sum(e*f2) // (8 * count(*) * 1000000))::BIGINT) AS w2,
         |  max(w3) - ((sum(e*f3) // (8 * count(*) * 1000000))::BIGINT) AS w3,
         |  max(w4) - ((sum(e*f4) // (8 * count(*) * 1000000))::BIGINT) AS w4
         |  FROM e$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH raw AS (
       |  SELECT doc_id,
       |    length(text)::BIGINT AS L,
       |    (length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')))::BIGINT AS n_alpha,
       |    (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::BIGINT AS n_digit,
       |    len(regexp_extract_all(text, '\\S+'))::BIGINT AS n_tokens,
       |    len(regexp_extract_all(lower(text), '\\b(the|a|of|and|in|to)\\b'))::BIGINT AS n_stop
       |  FROM documents),
       |f AS (
       |  SELECT doc_id,
       |    CASE WHEN (n_alpha * 1000000 // greatest(L, 1)) >= 550000
       |          AND n_tokens >= 5 AND n_stop > 0
       |         THEN 1000000::BIGINT ELSE 0::BIGINT END AS y,
       |    1000000::BIGINT AS f0,
       |    (n_alpha * 1000000 // greatest(L, 1))::BIGINT AS f1,
       |    least(1000000, n_stop * 4 * 1000000 // greatest(n_tokens, 1))::BIGINT AS f2,
       |    least(1000000, n_tokens * 1000000 // 64)::BIGINT AS f3,
       |    (n_digit * 1000000 // greatest(L, 1))::BIGINT AS f4
       |  FROM raw),
       |w0c AS (SELECT 0::BIGINT AS w0, 0::BIGINT AS w1, 0::BIGINT AS w2,
       |  0::BIGINT AS w3, 0::BIGINT AS w4),
       |$steps
       |SELECT doc_id, y AS label,
       |  ((w0*f0 + w1*f1 + w2*f2 + w3*f3 + w4*f4) // 1000000)::BIGINT AS score_micro
       |FROM f CROSS JOIN w${iters}c""".stripMargin
  }
}
