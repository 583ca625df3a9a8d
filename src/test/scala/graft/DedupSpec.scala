package graft

import org.apache.spark.sql.functions._
import graft.analytics.{Dedup, TextStats}
import graft.functions.BitOps.hammingDistance

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("shingles: distinct char 5-grams, short-text fallback") {
    val got = docs((1L, "abcdefg"), (2L, "abc"))
      .select($"doc_id", TextStats.shingles($"text").as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L) == Seq("abcde", "bcdef", "cdefg"))
    assert(got(2L) == Seq("abc"))
  }

  test("exact dedup groups identical texts") {
    val d = docs((1L, "same text here"), (2L, "same text here"), (3L, "other"))
      .createOrReplaceTempView("t")
    val got = spark.table("t")
      .groupBy(md5($"text".cast("binary")).as("h"))
      .agg(min($"doc_id").as("canonical"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 2L, 3L -> 1L))
  }

  test("minhash signature: deterministic, equal for equal sets, 64 slots") {
    val sig = docs((1L, "hello world hello"), (2L, "hello world hello"), (3L, "completely different"))
      .select($"doc_id", Dedup.minhashSignature(TextStats.shingles($"text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sig(1L).size == 64)
    assert(sig(1L) == sig(2L))
    assert(sig(1L) != sig(3L))
  }

  test("simhash: identical texts → distance 0; hamming expression evals + codegens") {
    val sims = docs((1L, "the quick brown fox jumps"), (2L, "the quick brown fox jumps"),
        (3L, "zzz qqq completely unrelated www"))
      .select($"doc_id", Dedup.simhash64(TextStats.shingles($"text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sims(1L) == sims(2L))
    assert(sims(1L) != sims(3L))

    val hd = Seq((0xFFL, 0x0FL), (5L, 5L))
      .toDF("a", "b")
      .select(hammingDistance($"a", $"b"))
      .collect().map(_.getInt(0)).toSeq
    assert(hd == Seq(4, 0))
    // null-safe
    val hn = Seq((Some(1L), Option.empty[Long])).toDF("a", "b")
      .select(hammingDistance($"a", $"b")).collect()
    assert(hn.head.isNullAt(0))
  }

  test("jaccard near-dup finds planted dupes exactly (vs brute force)") {
    val d = sf("sf0.001")
    val got = Dedup.jaccardNearDup(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute-force reference computed in-Spark (same word-trigram shingling)
    val sh = graft.Tables.documents(spark, d)
      .select($"doc_id", TextStats.wordShingles($"text").as("sh"))
    val brute = sh.as("a").join(sh.as("b"), $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("x"), $"b.doc_id".as("y"),
        (size(array_intersect($"a.sh", $"b.sh")).cast("double") /
          size(array_union($"a.sh", $"b.sh")).cast("double")).as("j"))
      .filter(round($"j", 4) >= 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute)
    assert(got.nonEmpty) // planted near-dups exist in the testdata
  }

  test("connected components: chains collapse to min label, singletons self") {
    val edges = Seq((2L, 5L), (5L, 9L), (20L, 21L)).toDF("a", "b")
    val labels = graft.analytics.Dedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(2L -> 2L, 5L -> 2L, 9L -> 2L, 20L -> 20L, 21L -> 20L))
    val full = graft.analytics.Dedup.dedupCorpus(spark, sf("sf0.001"))
    assert(full.count() == 500)
    // every canonical is the min of its cluster and flagged
    val byCanon = full.collect().groupBy(_.getLong(1))
    byCanon.foreach { case (canon, members) =>
      assert(members.map(_.getLong(0)).min == canon)
      assert(members.count(_.getBoolean(2)) == 1)
    }
  }

  test("minhash LSH recall on planted dupes") {
    val d = sf("sf0.001")
    val exact = Dedup.jaccardNearDup(spark, d, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLsh(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // at j ≥ 0.8 the 16×4 banding miss probability is ~1e-6 per pair
    assert(exact.subsetOf(lsh))
  }

  test("simhash128: identical texts distance 0 and always surfaced; near-identical within d<=3") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today"), // exact copy
      (3L, "the quick brown fox jumps over the lazy dog again and again tonight"), // 1-token edit
      (4L, "completely unrelated text about spark catalyst expression codegen")
    ).toDF("doc_id", "text")
    val pairs = graft.analytics.Dedup.simhash128CandidatesOn(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Number](2).longValue).toMap
    assert(pairs((1L, 2L)) == 0L, "exact copies must collide at distance 0")
    assert(pairs.get((1L, 3L)).forall(_ >= 0L)) // near-identical: surfaced via some chunk
    // fingerprint determinism: same text → same 2-word signature
    val sigs = docs.select(graft.functions.Sketches.simhash128(
        graft.analytics.TextStats.wordShingles($"text")).as("s"))
      .collect().map(_.getSeq[Long](0))
    assert(sigs(0) == sigs(1) && sigs(0).length == 2)
  }

  test("q71 keep-best: exactly one keeper per cluster, and it has the max quality") {
    import org.apache.spark.sql.functions._
    val d = sf("sf0.001")
    val kb = Dedup.dedupKeepBest(spark, d)
    // one keeper per cluster
    val multi = kb.groupBy(col("canonical_id"))
      .agg(sum(when(col("keep"), 1).otherwise(0)).as("n_keep"))
      .filter(col("n_keep") =!= 1).count()
    assert(multi == 0, "every cluster must elect exactly one representative")
    // the keeper's quality is the cluster max
    val bad = kb.as("k").filter(col("keep"))
      .join(kb.as("o"), "canonical_id")
      .filter(col("o.quality") > col("k.quality")).count()
    assert(bad == 0, "no member may out-score its cluster's keeper")
    // every document appears exactly once
    assert(kb.count() == graft.Tables.documents(spark, d).count())
  }

  test("q72 dedup stats: size histogram accounts for every document") {
    import org.apache.spark.sql.functions._
    val d = sf("sf0.001")
    val st = Dedup.dedupStats(spark, d)
    val total = st.agg(sum(col("cluster_size") * col("n_clusters"))).collect()(0).getLong(0)
    assert(total == graft.Tables.documents(spark, d).count())
    // removed = docs - clusters, and no cluster of size 1 removes anything
    val removedAt1 = st.filter(col("cluster_size") === 1 && col("n_removed") =!= 0).count()
    assert(removedAt1 == 0)
  }

  test("q170 soft weights: weights are 1e6 div cluster size; corpus mass conserved-ish") {
    val d = sf("sf0.01")
    val r = Dedup.dedupWeights(spark, d).collect()
    val docs = Tables.documents(spark, d).count()
    assert(r.length == docs, "every document gets a weight")
    // per-cluster: every member carries the same weight, = 1e6 div size
    r.groupBy(_.getAs[Long]("canonical_id")).foreach { case (cid, members) =>
      val size = members.head.getAs[Long]("cluster_size")
      assert(members.length == size, s"cluster $cid size mismatch")
      assert(members.forall(_.getAs[Long]("weight_micro") == 1000000L / size))
    }
    // singletons weigh exactly 1.0; no weight exceeds it
    assert(r.filter(_.getAs[Long]("cluster_size") == 1L)
      .forall(_.getAs[Long]("weight_micro") == 1000000L))
    assert(r.forall(_.getAs[Long]("weight_micro") <= 1000000L))
  }

  test("q79 span dedup: copied span flagged at ANY offset (content-defined boundaries)") {
    import spark.implicits._
    // build a span guaranteed to contain ≥ 3 cut tokens (md5 high nibble 0),
    // so it carries ≥ 2 full interior chunks wherever it lands
    def isCut(tok: String): Boolean = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8"))
      (d(0) & 0xF0) == 0
    }
    val cuts = (1 to 2000).map(i => s"w$i").filter(isCut).take(3)
    assert(cuts.length == 3, "fixture needs three cut tokens")
    val filler = (1 to 2000).map(i => s"w$i").filterNot(isCut)
    val span = (cuts(0) +: filler.slice(0, 6)) ++ (cuts(1) +: filler.slice(6, 12)) :+ cuts(2)
    val spanTxt = span.mkString(" ")
    // the same span at offset 0, mid-doc, and end-of-doc — different
    // surrounding vocab per doc (disjoint, cut-free filler)
    val docs = Seq(
      (1L, spanTxt + " " + filler.slice(20, 30).mkString(" ")),
      (2L, filler.slice(30, 37).mkString(" ") + " " + spanTxt + " " + filler.slice(37, 40).mkString(" ")),
      (3L, filler.slice(40, 52).mkString(" ") + " " + spanTxt),
      (4L, filler.slice(60, 90).mkString(" ")), // no cut tokens → whole-text fallback
      (5L, "short doc"), (6L, "short doc")).toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet("target/span_docs/documents.parquet")
    val got = graft.analytics.Dedup.spanDedup(spark, "target/span_docs")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // all three span carriers share the two interior chunks, at three
    // different offsets — exactly what fixed-stride windows cannot do
    (1L to 3L).foreach(id =>
      assert(got(id)._2 >= 2, s"doc $id must flag the copied span's chunks: $got"))
    assert(got(4L)._2 == 0, "cut-free unique doc must be clean")
    // short docs fall back to whole text → exact duplicates caught
    assert(got(5L) == ((1L, 1L)) && got(6L) == ((1L, 1L)))
  }

  test("q122 ensemble dedup: cluster forms only through the UNION of measures") {
    import spark.implicits._
    // doc 2 = exact copy of doc 1 (Jaccard edge); doc 3 shares doc 2's
    // 16-char prefix with small char edits in EVERY later token (edit_sim
    // ≈ 0.92 → fuzzy edge) but trigram Jaccard ≈ 0.14 (no Jaccard edge).
    // Only the union of the two edge sets chains 1-2-3 into one cluster.
    val base = "alpha beta gamma delta epsilon zeta"
    val edited = "alpha beta gamma deltax epsilonx zetax"
    val docs = Seq(
      (1L, base), (2L, base), (3L, edited),
      (4L, "completely unrelated singleton text body")).toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet("target/ensemble_docs/documents.parquet")
    val dir = "target/ensemble_docs"

    val jac = Dedup.jaccardNearDup(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(jac == Set((1L, 2L)), s"Jaccard alone must NOT reach doc 3: $jac")
    val fuzzy = graft.analytics.Relational.fuzzyNearDup(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fuzzy.contains((2L, 3L)) && !fuzzy.contains((1L, 4L)))

    val got = Dedup.ensembleDedup(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got == Map(
      1L -> ((1L, true)), 2L -> ((1L, false)), 3L -> ((1L, false)),
      4L -> ((4L, true))), s"union must chain 1-2-3: $got")
  }

  test("q134 full ensemble: cosine leg merges docs no text measure can see") {
    import spark.implicits._
    // docs 1-3 chain through text measures exactly as in the q122 spec;
    // docs 5 and 6 share NO tokens and no prefix — only their embeddings
    // are parallel, so only the cosine leg can merge them
    val base = "alpha beta gamma delta epsilon zeta"
    val edited = "alpha beta gamma deltax epsilonx zetax"
    val docs = Seq(
      (1L, base), (2L, base), (3L, edited),
      (4L, "completely unrelated singleton text body"),
      (5L, "the quick brown fox jumps over lazy dogs"),
      (6L, "un texto distinto sin palabras compartidas aqui")).toDF("doc_id", "text")
    val dir = "target/ensemble_full_docs"
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def unit(i: Int): Array[Float] = Array.tabulate(8)(j => if (j == i) 1.0f else 0.0f)
    Seq(
      (1L, unit(0)), (2L, unit(1)), (3L, unit(2)), (4L, unit(3)),
      (5L, unit(5)), (6L, unit(5)))  // 5 and 6: identical → cosine 1.0
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    // the text-only ensemble must NOT merge 5-6...
    val textOnly = Dedup.ensembleDedup(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(textOnly(5L) == 5L && textOnly(6L) == 6L)
    // ...and the exact cosine edge set is precisely {(5,6)}
    val emb = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cosEdges = Dedup.cosineEdgesOn(emb, 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cosEdges == Set((5L, 6L)), s"cosine edges: $cosEdges")

    val got = Dedup.ensembleDedupFull(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got == Map(
      1L -> ((1L, true)), 2L -> ((1L, false)), 3L -> ((1L, false)),
      4L -> ((4L, true)), 5L -> ((5L, true)), 6L -> ((5L, false))),
      s"cosine leg must chain 5-6 and nothing else: $got")
  }

  test("q134 cosine leg: sign-LSH candidates reproduce the brute-force edge set") {
    // round-7 verdict item 2: the gated query now uses the sign-LSH
    // candidate generator; the exact all-pairs twin (cosineEdgesOn) is the
    // spec-level verify. On the gate corpus (organic isotropic noise, no
    // pair ≥ τ) PLUS planted scaled copies — which share their original's
    // sign pattern in every table, so LSH must surface them — the two edge
    // sets must be identical. LSH ⊆ brute always (same exact verify);
    // planted recall pins ⊇ on everything that matters.
    val d = sf("sf0.001")
    val organic = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val planted = organic.filter(col("vec_id") < 10)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        expr("transform(v, x -> x * 2.0d)").as("v"))
    val emb = organic.unionByName(planted)
    def edgeSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = edgeSet(Dedup.cosineEdgesOn(emb, 0.95).select("a", "b"))
    val lsh = edgeSet(graft.analytics.Similarity.embeddingNearDupOn(emb, 0.95 - 1e-4)
      .filter(col("cos_sim") >= 0.95).select("vec_a", "vec_b"))
    assert(brute.nonEmpty, "planted copies must appear in the brute edge set")
    assert(lsh == brute, s"LSH edge set ${lsh.size} != brute ${brute.size}")
  }

  test("pair-graph cache flag: one shared materialized graph, identical rows") {
    val d = sf("sf0.001")
    val base = Dedup.jaccardNearDup(spark, d)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    Dedup.clearPairGraphCache()
    spark.conf.set("spark.graft.pairgraph.cache", "true")
    try {
      val a = Dedup.nearDupPairs(spark, d)
      val b = Dedup.nearDupPairs(spark, d)
      assert(a eq b, "second call must reuse the materialized graph")
      assert(a.collect().map(_.toSeq).sortBy(_.toString).toSeq == base)
    } finally {
      spark.conf.unset("spark.graft.pairgraph.cache")
      Dedup.clearPairGraphCache()
    }
  }

  test("q185 span scrub: owner keeps, exact copy empties, embedded copy loses only the span") {
    import spark.implicits._
    def uniq(tag: String, k: Int): String = (1 to k).map(i => s"$tag$i").mkString(" ")
    val run = (1 to 12).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"$run ${uniq("a", 8)}"),              // owner (min doc_id with the run)
      (2L, s"$run ${uniq("a", 8)}"),              // exact copy -> fully scrubbed
      (3L, s"${uniq("b", 9)} $run ${uniq("c", 9)}"), // embedded copy -> loses the 12 tokens
      (4L, uniq("d", 30))).toDF("doc_id", "text") // unique -> untouched, absent
    val out = Dedup.spanScrubOn(docs, 10).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(!out.contains(1L), "the owner is never rewritten")
    assert(!out.contains(4L), "unique docs are untouched")
    assert(out(2L) == ((20L, 0L, "")), s"exact copy must empty: ${out(2L)}")
    val (b3, a3, t3) = out(3L)
    assert(b3 == 30 && a3 == 18, s"embedded copy loses exactly the run: ${out(3L)}")
    assert(t3 == s"${uniq("b", 9)} ${uniq("c", 9)}", s"survivors reassemble in order: $t3")
  }

  test("q183 repeated spans: embedded repeat found with exact mass, unique docs silent") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 12 shared tokens (s1..s12) embedded at different offsets inside
    // otherwise-unique 30-token docs; doc 3 carries the SAME run twice with
    // a wide unique gap; doc 4 is entirely unique
    def uniq(tag: String, k: Int): String = (1 to k).map(i => s"$tag$i").mkString(" ")
    val run = (1 to 12).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"${uniq("a", 9)} $run ${uniq("b", 9)}"),
      (2L, s"${uniq("c", 4)} $run ${uniq("d", 14)}"),
      (3L, s"$run ${uniq("e", 25)} $run"),
      (4L, uniq("f", 30))).toDF("doc_id", "text")
    val out = Dedup.repeatedSpansOn(docs, 10).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    assert(!out.contains(4L), "a fully-unique doc must not appear")
    // a 12-token repeat yields 3 dup 10-gram starts -> one merged span of 12
    assert(out(1L) == ((1L, 12L, (12L * 10000) / 30L)), s"doc1: ${out(1L)}")
    assert(out(2L) == ((1L, 12L, (12L * 10000) / 30L)), s"doc2: ${out(2L)}")
    // doc 3: the run at both ends, 25 unique tokens between -> TWO spans
    val (n3, mass3, _) = out(3L)
    assert(n3 == 2 && mass3 == 24, s"doc3 expected two 12-token spans: ${out(3L)}")
  }

  test("exact substring spans: planted repeat found with exact token boundaries") {
    // a 12-token run shared by docs 1 and 2 at different offsets, unique
    // elsewhere — exactly one span per doc, boundaries exact (L = 8)
    val run = (0 until 12).map(i => s"shared$i").mkString(" ")
    def uniq(p: String, n: Int) = (0 until n).map(i => s"$p$i").mkString(" ")
    val d = docs(
      (1L, uniq("a", 5) + " " + run + " " + uniq("b", 7)),   // run at 5..16
      (2L, uniq("c", 9) + " " + run),                        // run at 9..20
      (3L, uniq("z", 30)))                                   // no repeats
    val spans = Dedup.exactSubstringSpansOn(d, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(spans.toSet == Set((1L, 5L, 16L, 12L), (2L, 9L, 20L, 12L)),
      s"exact boundaries wrong: ${spans.mkString(", ")}")
  }

  test("exact substring spans: within-doc repeat covered; one-token edit splits exactly") {
    // doc 10 repeats its own 8-token run twice — both occurrences covered;
    // doc 20/21 share runs A and B separated by a differing middle token:
    // the changed position must NOT be covered (two spans, exact split)
    val run8 = (0 until 8).map(i => s"r$i").mkString(" ")
    val runA = (0 until 8).map(i => s"A$i").mkString(" ")
    val runB = (0 until 8).map(i => s"B$i").mkString(" ")
    def uniq(p: String, n: Int) = (0 until n).map(i => s"$p$i").mkString(" ")
    val d = docs(
      (10L, run8 + " " + uniq("m", 12) + " " + run8), // self-repeat at 0..7 and 20..27
      (20L, runA + " xMID " + runB + " " + uniq("p", 9)),  // A at 0..7, B at 9..16
      (21L, runA + " yMID " + runB + " " + uniq("q", 9)))
    val got = Dedup.exactSubstringSpansOn(d, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got((10L, 0L, 7L)) && got((10L, 20L, 27L)),
      s"within-doc repeat not fully covered: $got")
    // position 8 (the MID token) uncovered in both docs
    for (doc <- Seq(20L, 21L))
      assert(got((doc, 0L, 7L)) && got((doc, 9L, 16L)),
        s"one-token edit did not split spans exactly for doc $doc: $got")
    assert(got.size == 6, s"unexpected extra spans: $got")
  }

  test("exact substring spans: forced hash collisions ≡ full hash ≡ strings-only form") {
    // hashBuckets = 4 forces unrelated windows into shared hash groups —
    // the string-equality verify must reject them, leaving output
    // identical to the full-width hash AND to a reference that never
    // hashes at all. This is what makes a 64-bit collision harmless.
    val corpus = Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("text")).limit(200)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val full = canon(Dedup.exactSubstringSpansOn(corpus, 8))
    val collided = canon(Dedup.exactSubstringSpansOn(corpus, 8, hashBuckets = 4L))
    assert(collided == full, "verify leg failed under forced collisions")
    // strings-only reference: duplicated windows by text, no hash stage
    import org.apache.spark.sql.expressions.Window
    val win = corpus.select(col("doc_id"),
      posexplode(graft.functions.Sketches.wordNgramsAll(col("text"), 8))
        .as(Seq("pos", "g")))
    val dup = win.groupBy(col("g")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).select(col("g"))
    val wo = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val ref = canon(win.join(dup, "g").select(col("doc_id"), col("pos"))
      .withColumn("newisl",
        when(col("pos") - lag(col("pos"), 1).over(wo) > 8, 1).otherwise(0))
      .withColumn("island", sum(col("newisl"))
        .over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("s"), (max(col("pos")) + lit(7)).as("e"))
      .select(col("doc_id"), col("s").cast("long"), col("e").cast("long"),
        (col("e") - col("s") + 1).cast("long")))
    assert(full == ref, "hash-group path drifted from the strings-only form")
    assert(full.nonEmpty, "sf0.001 corpus should contain repeated 8-runs")
  }

  test("exact substring spans: stage-1 shuffle carries the 8-byte hash, never window text") {
    // the 100 TB contract: the first exchange aggregates (h, count) with
    // map-side partial aggregation; window strings appear only after the
    // hash semi-join prunes to collided groups
    val d = docs((1L, (0 until 40).map(i => s"w$i").mkString(" ")))
    val plan = Dedup.exactSubstringSpansOn(d, 8).queryExecution.executedPlan
    val aggs = plan.toString
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    val helper = new org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {}
    val hashAggs = helper.collectWithSubqueries(plan) {
      case a: HashAggregateExec if a.groupingExpressions.exists(
        _.toString.contains("h#")) => a
    }
    assert(hashAggs.nonEmpty, s"stage-1 hash aggregate missing:\n$aggs")
    assert(hashAggs.exists(a => !a.groupingExpressions.exists(
      _.toString.contains("g#"))),
      s"stage-1 aggregate groups on the window text:\n$aggs")
    assert(hashAggs.exists(_.aggregateExpressions.exists(
      _.mode == org.apache.spark.sql.catalyst.expressions.aggregate.Partial)),
      s"no map-side partial aggregation in the hash stage:\n$aggs")
  }
}
