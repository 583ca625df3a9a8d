package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registers the engine's custom Catalyst expressions as SQL functions, so
  * `spark.sql("SELECT minhash_signature(word_shingles(text)) ...")` works —
  * the full API surface is available from both the Column API and SQL.
  *
  * Wire up either via config
  * `spark.sql.extensions=graft.functions.GraftExtensions` or imperatively
  * with `GraftExtensions.register(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.registrations.foreach { case (name, builder) =>
      ext.injectFunction(
        (FunctionIdentifier(name),
          new ExpressionInfo("graft.functions.Sketches", name),
          builder))
    }
}

object GraftExtensions {
  import Sketches._

  private def one(f: Expression => Expression): Seq[Expression] => Expression =
    exprs => f(exprs.head)
  private def two(f: (Expression, Expression) => Expression): Seq[Expression] => Expression =
    exprs => f(exprs.head, exprs(1))
  private def three(f: (Expression, Expression, Expression) => Expression): Seq[Expression] => Expression =
    exprs => f(exprs.head, exprs(1), exprs(2))

  val registrations: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "word_shingles"     -> one(WordShingles(_)),
    "word_ngrams_all"   -> one(WordNgramsAll(_)),
    "sort_by_hash"      -> one(SortByHash(_)),
    "sign_buckets"      -> one(SignBuckets(_)),
    "minhash_signature" -> one(MinHashSignature(_)),
    "simhash64"         -> one(SimHash64(_)),
    "simhash128"        -> one(SimHash128(_)),
    "jaccard_sim"       -> two(JaccardSim(_, _)),
    "signature_agreement" -> two(SignatureAgreement(_, _)),
    "cosine_sim"        -> two(CosineSim(_, _)),
    "dot_product"       -> two(DotProduct(_, _)),
    "hamming_distance"  -> two(HammingDistance(_, _)),
    "nearest_centroid"  -> three(NearestCentroid(_, _, _)),
    "pq_encode"         -> two(PqEncode(_, _)),
    "pq_adc_sim"        -> three(PqAdcSim(_, _, _)),
    "sq_scale"          -> one(SqScale(_)),
    "sq_encode"         -> one(SqEncode(_)),
    "sq_adc_sim"        -> three(SqAdcSim(_, _, _)),
    "nfc_normalize"     -> one(UnicodeNorm.NfcNormalize(_)),
    "deflate_ratio"     -> one(Compress.DeflateRatio(_)),
    "kmv_estimate"      -> one(KmvSketch.KmvEstimate(_)),
    "kmv_union"         -> two(KmvSketch.KmvUnion(_, _)),
    "kmv_intersect_estimate" -> two(KmvSketch.KmvIntersectEstimate(_, _)),
    "kmv_jaccard"       -> two(KmvSketch.KmvJaccard(_, _)),
    // kmv aggregates: k must be a foldable int literal
    "kmv_sketch" -> (exprs => {
      require(exprs.length <= 2, "kmv_sketch(hash_long[, k])")
      val k = if (exprs.length == 2) {
        require(exprs(1).foldable, "k must be a literal")
        exprs(1).eval().asInstanceOf[Number].intValue()
      } else 1024
      KmvSketch.KmvSketchAgg(exprs.head, k)
    }),
    "kmv_merge" -> one(KmvSketch.KmvMergeAgg(_)),
    // custom aggregate: the registry builder returns the AggregateFunction
    // itself; the analyzer wraps it. Percentiles must be a foldable literal
    // (scalar or array) — evaluated once at plan time.
    "graft_quantile_sketch" -> (exprs => {
      require(exprs.length == 2,
        "graft_quantile_sketch(value, percentile | array(percentiles))")
      val pExpr = exprs(1)
      require(pExpr.foldable, "percentiles must be a literal")
      def toD(v: Any): Double = v match {
        case d: Double => d
        case d: org.apache.spark.sql.types.Decimal => d.toDouble
        case f: Float => f.toDouble
        case i: Int => i.toDouble
        case l: Long => l.toDouble
        case other => throw new IllegalArgumentException(
          s"percentile literal must be numeric, got $other")
      }
      val ps = (pExpr.eval(), pExpr.dataType) match {
        case (a: org.apache.spark.sql.catalyst.util.ArrayData,
            org.apache.spark.sql.types.ArrayType(et, _)) =>
          a.toObjectArray(et).map(toD).toSeq
        case (v, _) => Seq(toD(v))
      }
      QuantileSketch.QuantileSketchAgg(exprs.head, ps)
    }))

  /** Imperative registration on an existing session (tests, REPL). */
  def register(spark: SparkSession): Unit =
    registrations.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}
