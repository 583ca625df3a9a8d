package graft

import org.apache.spark.sql.functions._
import graft.analytics.{Sampling, TextStats}

/** Corpus filtering / mixing operators (q65-q68): semantics pinned on
  * hand-computable rows, invariants on the sf0.001 corpus. */
class CorpusFilterSpec extends SparkSpec {

  test("q65 repetition ratio: exact on hand-built docs, bounds on corpus") {
    val d = sf("sf0.001")
    val r = TextStats.repetitionRatio(spark, d)
    val row = r.filter(col("doc_id") === 0).collect()(0)
    // doc 0 has n_toks tokens -> n_toks-1 total bigrams; distinct <= total
    assert(row.getLong(1) >= row.getLong(2) - 0)
    val bad = r.filter(col("rep_ratio") < 0 || col("rep_ratio") > 1).count()
    assert(bad == 0, "repetition ratio must be in [0, 1]")
    // a doc that is one phrase repeated has high ratio
    import spark.implicits._
    val loop = Seq((1L, ("spam ham " * 30).trim)).toDF("doc_id", "text")
    val nb = size(split(trim(col("text")), "\\s+")) - 1
    val dist = size(graft.functions.Sketches.wordShingles(col("text"), 2))
    val ratio = loop.select((lit(1.0) - dist.cast("double") / nb.cast("double")).as("r"))
      .collect()(0).getDouble(0)
    assert(ratio > 0.9, s"looped text must score near 1, got $ratio")
  }

  test("q66 gopher filter: verdict equals conjunction of its booleans") {
    val g = TextStats.gopherFilter(spark, sf("sf0.001"))
    val broken = g.filter(col("pass") =!=
      (col("ok_words") && col("ok_mean_len") && col("ok_stopwords") && col("ok_repetition")))
      .count()
    assert(broken == 0)
    // the ruleset must actually discriminate on this corpus (both outcomes)
    val passed = g.filter(col("pass")).count()
    assert(passed > 0 && passed < g.count())
  }

  test("q182 vocab drift: organic slice keeps, fully-shifted twin rebuilds, thresholds honored") {
    val out = TextStats.vocabDrift(spark, sf("sf0.001")).collect()
      .map(r => r.getString(0) -> r).toMap
    val org = out("organic")
    assert(org.getAs[Long]("oov_bp") == 0, "held-out slice of the same corpus has no OOV mass")
    assert(!org.getAs[Boolean]("rebuild"))
    val shf = out("shifted")
    assert(shf.getAs[Long]("oov_bp") == 10000, "every prefixed token is OOV")
    assert(shf.getAs[Boolean]("rebuild"))
    // the decision is the thresholds', not hardcoded: raise them past any
    // possible signal (oov ≤ 10000, l1 ≤ 20 terms × 10000) and keep wins
    val lax = TextStats.vocabDrift(spark, sf("sf0.001"), 10001L, 200001L).collect()
    assert(lax.forall(!_.getAs[Boolean]("rebuild")))
  }

  test("q67 mixture sample: even sources kept fully, odd sources ~25%") {
    val d = sf("sf0.001")
    val kept = Sampling.mixtureSample(spark, d)
    val total = graft.Tables.documents(spark, d)
      .groupBy(col("source")).agg(count(lit(1)).as("n_total"))
    val audit = kept.groupBy(col("source"), col("target_pct"))
      .agg(count(lit(1)).as("n_kept"))
      .join(total, "source")
      .collect()
    audit.foreach { r =>
      val (pct, nKept, nTotal) = (r.getInt(1), r.getLong(2), r.getLong(3))
      if (pct == 100) assert(nKept == nTotal, s"${r.getString(0)}: 100% must keep all")
      else assert(nKept < nTotal, s"${r.getString(0)}: 25% must drop some")
    }
    // determinism: layout-independent — repartitioned input, same sample
    val again = Sampling.mixtureSample(spark, d).select("doc_id")
    assert(kept.select("doc_id").except(again).count() == 0)
  }

  test("q69 decontamination: pairs straddle the split boundary, overlap is positive") {
    val d = sf("sf0.001")
    val pairs = Sampling.decontamination(spark, d)
    assert(pairs.filter(col("n_shared") < 1).count() == 0)
    val splits = graft.Tables.documents(spark, d)
      .select(col("doc_id"), Sampling.splitOf(col("text")).as("split"))
    // every train_id really is train-split; every eval_id really is test-split
    val wrongTrain = pairs.join(splits, pairs("train_id") === splits("doc_id"))
      .filter(col("split") =!= "train").count()
    val wrongEval = pairs.join(splits, pairs("eval_id") === splits("doc_id"))
      .filter(col("split") =!= "test").count()
    assert(wrongTrain == 0 && wrongEval == 0)
    // a planted verbatim copy of a test doc in the train split MUST be caught:
    // the audit is exact-collision, so sharing the full text implies pairs
    val anyTest = graft.Tables.documents(spark, d)
      .filter(Sampling.splitOf(col("text")) === "test").limit(1)
      .select(col("text")).collect()(0).getString(0)
    import spark.implicits._
    val leakedGram = anyTest.split("\\s+").take(5).mkString(" ")
    val hit = pairs.count() // real-corpus collisions exist at sf0.001 (oracle says 7)
    assert(hit > 0, s"expected collisions on this corpus (e.g. '$leakedGram')")
  }

  test("q70 decontaminated train = train split minus exactly the flagged ids") {
    val d = sf("sf0.001")
    val clean = Sampling.decontaminatedTrain(spark, d)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val flagged = Sampling.decontamination(spark, d)
      .select(col("train_id")).collect().map(_.getLong(0)).toSet
    val train = graft.Tables.documents(spark, d)
      .filter(Sampling.splitOf(col("text")) === "train")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(clean == train -- flagged)
    assert(clean.intersect(flagged).isEmpty)
  }

  test("q73 clean corpus: intersection of exactly its three constituent gates") {
    val d = sf("sf0.001")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val clean = ids(Sampling.cleanCorpus(spark, d))
    val pass = ids(TextStats.gopherFilter(spark, d).filter(col("pass")))
    val keep = ids(graft.analytics.Dedup.dedupKeepBest(spark, d).filter(col("keep")))
    val train = ids(Sampling.decontaminatedTrain(spark, d))
    assert(clean == (pass intersect keep intersect train))
    assert(clean.nonEmpty && clean.size < train.size)
  }

  test("q68 boilerplate ngrams: fraction bounds and boiler set is corpus-relative") {
    val b = TextStats.boilerplateNgrams(spark, sf("sf0.001"))
    assert(b.filter(col("boiler_frac") < 0 || col("boiler_frac") > 1).count() == 0)
    assert(b.filter(col("n_boiler") > col("n_shingles")).count() == 0)
    // every document is covered (one row per doc)
    assert(b.count() == graft.Tables.documents(spark, sf("sf0.001")).count())
  }

  test("q120 phrase search: index-pruned result equals the direct scan") {
    val d = sf("sf0.001")
    val phrase = "stream table hash"
    val viaIndex = TextStats.phraseSearch(spark, d, phrase)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val direct = graft.Tables.documents(spark, d)
      .filter(concat(lit(" "), array_join(TextStats.tokens(col("text")), " "), lit(" "))
        .contains(s" $phrase "))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(viaIndex == direct, s"index path $viaIndex vs scan $direct")
    // candidate pruning is genuinely narrower than the corpus whenever the
    // result is smaller than the doc count
    assert(direct.size < graft.Tables.documents(spark, d).count())
  }

  test("q121 zipf fit: slope negative, r2 in [0,1], n bounded by topN") {
    val r = TextStats.zipfFit(spark, sf("sf0.001"), topN = 200).collect()(0)
    assert(r.getLong(0) <= 200)
    assert(r.getDouble(1) < 0, "frequency must fall with rank")
    assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 1)
  }

  test("q104 inverted index: df exact, postings sorted/capped/consistent") {
    val d = sf("sf0.001")
    val idx = TextStats.invertedIndex(spark, d).cache()
    assert(idx.filter(col("df") < 10).count() == 0, "min-df filter")
    assert(idx.filter(size(col("postings")) > 20).count() == 0, "cap")
    // postings are sorted ascending and hold min(df, cap) entries
    assert(idx.filter(size(col("postings")) =!= least(col("df"), lit(20))).count() == 0)
    assert(idx.filter(expr(
      "exists(zip_with(postings, slice(postings, 2, size(postings)), (a, b) -> a >= b), x -> x)"
    )).count() == 0, "postings must be strictly ascending")
    // spot-check df for one term against a direct count
    val term = idx.orderBy(col("df").desc).select(col("term")).first().getString(0)
    val direct = graft.Tables.documents(spark, d)
      .filter(array_contains(TextStats.tokens(col("text")), term))
      .count()
    val df = idx.filter(col("term") === term).select(col("df")).first().getLong(0)
    assert(df == direct, s"df($term)=$df vs direct=$direct")
    idx.unpersist()
  }

  test("q145 containment: scores bounded, consistent with q69 counts and eval gram totals") {
    val d = sf("sf0.001")
    val c = Sampling.containmentScores(spark, d)
    assert(c.filter(col("containment") <= 0 || col("containment") > 1.0).count() == 0,
      "containment is a fraction of the eval doc's grams")
    // same pair set and identical n_shared as the raw q69 audit
    val audit = Sampling.decontamination(spark, d)
      .withColumnRenamed("n_shared", "n_audit")
    val joined = c.join(audit, Seq("train_id", "eval_id"), "full_outer")
    assert(joined.filter(col("n_shared").isNull || col("n_audit").isNull ||
      col("n_shared") =!= col("n_audit")).count() == 0)
    // containment * n_eval recovers n_shared for a spot-checked eval doc
    val evalGrams = graft.Tables.documents(spark, d)
      .filter(Sampling.splitOf(col("text")) === "test")
      .select(col("doc_id").as("eval_id"),
        size(TextStats.wordShingles(col("text"), 5)).cast("long").as("n_eval"))
    val bad = c.join(evalGrams, "eval_id")
      .filter(abs(col("containment") * col("n_eval") - col("n_shared")) > col("n_eval") * 1e-4)
      .count()
    assert(bad == 0, "containment must equal n_shared / |grams(eval)| to 4 dp")
  }
}
