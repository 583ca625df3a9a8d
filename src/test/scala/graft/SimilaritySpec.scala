package graft

import org.apache.spark.sql.functions._
import graft.analytics.Similarity
import graft.functions.VectorOps._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("vector ops: dot / norm / cosine semantics") {
    val df = Seq((Seq(1.0, 0.0, 2.0), Seq(3.0, 4.0, 0.5))).toDF("a", "b")
    val r = df.select(
      dot($"a", $"b").as("d"),
      norm2($"a").as("na"),
      cosine($"a", $"a").as("self"),
      cosine($"a", typedLit(Seq(0.0, 0.0, 0.0))).as("zero")).head()
    assert(r.getDouble(0) == 4.0)
    assert(math.abs(r.getDouble(1) - math.sqrt(5.0)) < 1e-12)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
    assert(r.isNullAt(3)) // zero-norm → null, not div-by-zero
  }

  test("l2Normalize produces unit vectors") {
    val r = Seq(Seq(3.0, 4.0)).toDF("v")
      .select(l2Normalize($"v")).head().getSeq[Double](0)
    assert(r == Seq(0.6, 0.8))
  }

  test("brute-force top-k: deterministic, k rows per query, self excluded") {
    val got = Similarity.bruteForceTopK(spark, sf("sf0.001")).collect()
    val byQuery = got.groupBy(_.getLong(0))
    assert(byQuery.keySet == (0L until 10L).toSet)
    byQuery.values.foreach { rows =>
      assert(rows.length == 5)
      assert(rows.map(_.getInt(3)).sorted.toSeq == Seq(1, 2, 3, 4, 5))
      rows.foreach(r => assert(r.getLong(0) != r.getLong(1)))
    }
  }

  test("LSH top-k: planted high-similarity neighbors are retrieved") {
    // The driver testdata embeddings are isotropic noise (max pairwise cosine
    // ≈ 0.35) — LSH is specified to find NEAR things, so recall is asserted
    // on planted near-duplicates, not on noise top-k.
    val rnd = new scala.util.Random(7)
    def vec() = Seq.fill(64)(rnd.nextGaussian())
    val corpus = (0L until 200L).map(i => (i, vec()))
    val queries = corpus.take(5).map { case (i, v) =>
      (1000L + i, v.map(x => x + rnd.nextGaussian() * 0.05)) // cos ≈ 0.999
    }
    val c = corpus.toDF("vec_id", "v")
    val q = queries.toDF("query_id", "qv")
    val got = Similarity.lshTopKOn(c, q, 3).filter($"rn" === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hits = (0 until 5).count(i => got.get(1000L + i).contains(i.toLong))
    assert(hits >= 4, s"planted neighbor found for only $hits/5 queries: $got")
  }

  test("LSH near-dup: empty on isotropic data, finds planted duplicate pair") {
    assert(Similarity.embeddingNearDup(spark, sf("sf0.001")).count() == 0)
  }

  test("IVF top-k: planted near-duplicates retrieved through probed cells") {
    val rnd = new scala.util.Random(11)
    def vec() = Seq.fill(64)(rnd.nextGaussian())
    val corpus = (0L until 200L).map(i => (i, vec()))
    val queries = corpus.take(5).map { case (i, v) =>
      (1000L + i, v.map(x => x + rnd.nextGaussian() * 0.05)) // cos ≈ 0.999
    }
    val c = corpus.toDF("vec_id", "v")
    val q = queries.toDF("query_id", "qv")
    val got = Similarity.ivfTopKOn(c, q, k = 3, numCentroids = 16, nprobe = 4)
      .filter($"rn" === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the near-twin shares its base vector's cell assignment with high prob;
    // nprobe=4 of 16 cells gives slack for boundary cases
    val hits = (0 until 5).count(i => got.get(1000L + i).contains(i.toLong))
    assert(hits >= 4, s"planted neighbor found for only $hits/5 queries: $got")
  }

  test("IVF returns k rows per query with exact re-ranked similarities") {
    val got = Similarity.ivfTopK(spark, sf("sf0.001")).collect()
    val byQuery = got.groupBy(_.getLong(0))
    assert(byQuery.keySet == (0L until 10L).toSet)
    byQuery.values.foreach { rows =>
      assert(rows.length == 5)
      rows.foreach(r => assert(r.getLong(0) != r.getLong(1)))
    }
    // every IVF similarity must equal the exact cosine for that pair (IVF
    // approximates by SKIPPING pairs, never by changing scores) — recomputed
    // here with the same left-to-right FP order as the codegen'd kernel
    val vecs = graft.Tables.embeddings(spark, sf("sf0.001"))
      .select($"vec_id", $"embedding".cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cosRound4(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    got.foreach { r =>
      val expect = cosRound4(vecs(r.getLong(0)), vecs(r.getLong(1)))
      assert(expect == r.getDouble(2),
        s"IVF score for (${r.getLong(0)},${r.getLong(1)}) diverges from exact: $expect vs ${r.getDouble(2)}")
    }
  }

  test("IVF k-means refinement flag: planted recall still holds, output shape intact") {
    spark.conf.set("spark.graft.ivf.kmeans.iters", "2")
    try {
      val rec = graft.analytics.Accuracy.ivfPlantedRecall(spark, sf("sf0.001")).head()
      assert(rec.getAs[Boolean]("planted_ok"),
        "refined quantizer must still probe every planted duplicate's cell")
      val topk = graft.analytics.Similarity.ivfTopK(spark, sf("sf0.001"))
      assert(topk.count() == 50) // 10 queries × k=5 regardless of quantizer
    } finally spark.conf.unset("spark.graft.ivf.kmeans.iters")
  }

  test("PQ: deterministic codes, identical vectors collide, planted copy at rank 1") {
    val e = graft.Tables.embeddings(spark, sf("sf0.001"))
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    // codes: 8 subspaces, values within [0, 16), equal vectors → equal codes
    val cbs = e.orderBy($"vec_id").limit(16)
      .agg(array_sort(collect_list(struct($"vec_id", $"v"))).as("sv"))
      .select(expr(
        """flatten(transform(sequence(0, size(sv[0].v) div 8 - 1), s ->
          |  transform(sv, x -> slice(x.v, s * 8 + 1, 8))))""".stripMargin).as("cbs"))
    val codes = e.limit(5).crossJoin(broadcast(cbs))
      .select(graft.functions.Sketches.pqEncode($"v", $"cbs").as("c"))
      .collect().map(_.getSeq[Int](0))
    assert(codes.forall(c => c.length == 8 && c.forall(x => x >= 0 && x < 16)))
    val twice = e.limit(5).crossJoin(broadcast(cbs))
      .select(graft.functions.Sketches.pqEncode($"v", $"cbs").as("c"))
      .collect().map(_.getSeq[Int](0))
    assert(codes.sameElements(twice))
    // planted scaled copy: identical unit vector → retrieved at rank 1, cos 1
    val q = e.filter($"vec_id" < 3)
    val planted = q.select(($"vec_id" + 1000000L).as("vec_id"),
      expr("transform(v, x -> x * 2.0d)").as("v"))
    val topk = Similarity.pqTopKOn(e.unionByName(planted),
      q.select($"vec_id".as("query_id"), $"v".as("qv")), k = 5)
    val rank1 = topk.filter($"rn" === 1).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    (0L until 3L).foreach { qid =>
      assert(rank1(qid) == (qid + 1000000L, 1.0),
        s"query $qid: planted copy must be rank 1 at cos 1.0, got ${rank1(qid)}")
    }
  }

  test("q220 RP: projection linear, planted copy at rank 1, full-fetch degenerates to exact") {
    // linearity: proj(2v) == 2·proj(v) component-for-component (FP-exact —
    // each term is a double doubled), which is why the planted gate's
    // cos 1.0 survives the projected candidate cut
    val v = Seq.tabulate(64)(i => math.sin(i + 1.0))
    val pair = Seq((v, v.map(_ * 2.0))).toDF("a", "b")
    val (pa, pb) = {
      val r = pair.select(Similarity.rpProject("a", 16).as("pa"),
        Similarity.rpProject("b", 16).as("pb")).head()
      (r.getSeq[Double](0), r.getSeq[Double](1))
    }
    assert(pa.length == 16 && pb == pa.map(_ * 2.0),
      s"projection not linear: $pa vs $pb")

    // planted near-copy surfaces at rank 1 through the projected cut
    val e = graft.Tables.embeddings(spark, sf("sf0.001"))
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val plants = e.filter(col("vec_id") < 3)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        expr("transform(v, x -> x * 2.0d)").as("v"))
    val q = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val got = Similarity.rpTopKOn(e.unionByName(plants), q, k = 5)
      .filter(col("neighbor_id") === col("query_id") + 1000000L)
      .collect().map(r => r.getLong(0) -> (r.getInt(3), r.getDouble(2))).toMap
    assert(got.keySet == Set(0L, 1L, 2L), s"plants lost in projection: $got")
    got.foreach { case (qid, (rn, sim)) =>
      assert(rn == 1 && sim == 1.0, s"query $qid plant at ($rn, $sim)") }

    // with the candidate cut covering the whole corpus, RP ≡ the exact
    // brute-force path (the re-rank is exact) — pins re-rank + output shape
    val n = e.count().toInt
    val exact = Similarity.bruteForceTopK(spark, sf("sf0.001"), k = 5)
      .collect().map(_.toSeq).toSet
    val full = Similarity.rpTopKOn(e,
      e.filter(col("vec_id") < 10).select(col("vec_id").as("query_id"), col("v").as("qv")),
      k = 5, candMult = n)
      .collect().map(_.toSeq).toSet
    assert(full == exact, "full-fetch RP differs from exact brute force")
  }

  test("nearest_centroid kernel is bit-identical to the explode/max-struct assignment") {
    val e = graft.Tables.embeddings(spark, sf("sf0.001"))
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val cents = e.orderBy($"vec_id").limit(16)
      .select($"vec_id".as("cid"), $"v".as("cv"))
    // round-2 formulation: K-fold explode + partial/final max over (sim, -cid)
    val viaAgg = e.crossJoin(broadcast(cents))
      .groupBy($"vec_id")
      .agg(max(struct(cosine($"v", $"cv").as("s"), (-$"cid").as("nc"))).as("m"))
      .select($"vec_id", (-$"m.nc").as("cid"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // round-3 kernel: single-row broadcast of packed arrays, narrow map
    val packed = cents.agg(array_sort(collect_list(struct($"cid", $"cv"))).as("cs"))
      .select(expr("transform(cs, c -> c.cid)").as("cids"),
        expr("transform(cs, c -> c.cv)").as("cvs"))
    val kernelDf = e.crossJoin(broadcast(packed))
      .select($"vec_id",
        graft.functions.Sketches.nearestCentroid($"v", $"cvs", $"cids").as("cid"))
    // the scale property: assignment never shuffles the corpus — the only
    // exchange is the single-row centroid broadcast
    assert(!kernelDf.queryExecution.executedPlan.toString.contains("hashpartitioning"),
      "kernel assignment must not shuffle the corpus")
    val viaKernel = kernelDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaKernel == viaAgg)
    // SQL registration works too
    graft.functions.GraftExtensions.register(spark)
    packed.createOrReplaceTempView("packed_cents")
    e.createOrReplaceTempView("corpus_vecs")
    val viaSql = spark.sql(
      """SELECT vec_id, nearest_centroid(v, cvs, cids) AS cid
        |FROM corpus_vecs CROSS JOIN packed_cents""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == viaAgg)
  }

  test("nearest_centroid: zero-norm vector (NaN cosine) matches max-struct — assigned, not dropped") {
    // cosine(0-vector, c) is NaN for every centroid; Spark's ordering ranks
    // NaN greatest, so max(struct(sim, -cid)) ties all cells and resolves to
    // the smallest cid. The kernel must reproduce that, not skip the row.
    val rows = Seq(
      (0L, Seq(0.0, 0.0, 0.0, 0.0)),            // zero-norm → all-NaN sims
      (1L, Seq(1.0, 0.0, 0.0, 0.0)),
      (2L, Seq(0.0, 0.0, 1.0, 0.0))).toDF("vec_id", "v")
    val cents = Seq(
      (3L, Seq(0.9, 0.1, 0.0, 0.0)),
      (7L, Seq(0.0, 0.0, 0.9, 0.1))).toDF("cid", "cv")
    val viaAgg = rows.crossJoin(broadcast(cents))
      .groupBy($"vec_id")
      .agg(max(struct(cosine($"v", $"cv").as("s"), (-$"cid").as("nc"))).as("m"))
      .select($"vec_id", (-$"m.nc").as("cid"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val packed = cents.agg(array_sort(collect_list(struct($"cid", $"cv"))).as("cs"))
      .select(expr("transform(cs, c -> c.cid)").as("cids"),
        expr("transform(cs, c -> c.cv)").as("cvs"))
    val viaKernel = rows.crossJoin(broadcast(packed))
      .select($"vec_id",
        graft.functions.Sketches.nearestCentroid($"v", $"cvs", $"cids").as("cid"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaKernel == viaAgg, s"kernel $viaKernel vs max-struct $viaAgg")
    assert(viaKernel(0L) == 3L, "zero-norm row must land in the smallest cid")
  }

  test("q144 cell stats: every vector assigned exactly once, centroids self-assign") {
    val d = sf("sf0.001")
    val stats = Similarity.ivfCellStats(spark, d).collect()
    val total = stats.map(_.getLong(1)).sum
    assert(total == graft.Tables.embeddings(spark, d).count(),
      "cell sizes must partition the corpus")
    val cids = stats.map(_.getLong(0)).toSet
    assert(cids.subsetOf((0L until 16L).toSet), s"cells come from the first 16 ids: $cids")
    // each centroid's own vector has cosine 1.0 to itself -> its own cell
    // is non-empty
    assert((0L until 16L).toSet.subsetOf(cids), "every centroid keeps its own vector")
  }

  test("q143 drift: label centroids cover the corpus, geometry in range") {
    val d = sf("sf0.001")
    val r = Similarity.embeddingDrift(spark, d).collect()
    assert(r.map(_.getLong(1)).sum == graft.Tables.embeddings(spark, d).count())
    r.foreach { row =>
      assert(row.getDouble(2) >= 0, "norms are non-negative")
      assert(math.abs(row.getDouble(3)) <= 1.0001, "cosine bounded")
    }
    // isotropic noise: per-label centroid of n vectors concentrates at
    // O(1/sqrt(n)) — far below the ~1 norm of any single vector
    assert(r.forall(_.getDouble(2) < 0.5), r.mkString(","))
  }

  test("q148 ivf near-dup: deep-in-cell pairs found, boundary pairs missed by contract") {
    import spark.implicits._
    // centroids = two smallest ids (axes); c/d hug the x-axis (same cell,
    // cos ≈ 0.9998); e/f straddle the diagonal (split cells, cos ≈ 0.999)
    val vecs = Seq(
      0L -> Seq(1.0, 0.0), 1L -> Seq(0.0, 1.0),
      2L -> Seq(0.95, 0.10), 3L -> Seq(0.93, 0.12),
      4L -> Seq(0.72, 0.69), 5L -> Seq(0.69, 0.72))
      .toDF("vec_id", "v")
    val found = graft.analytics.Similarity
      .ivfNearDupOn(vecs, numCentroids = 2, tau = 0.95)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found.contains((2L, 3L)), "same-cell near-dup must be found")
    assert(!found.contains((4L, 5L)),
      "cross-cell pair is missed — the documented geometric-recall trade")
    // planted gate on the real corpus: exactly the 100 scaled plants
    val d = sf("sf0.001")
    val gate = graft.analytics.Accuracy.ivfNearDupGate(spark, d).collect()
    assert(gate.length == 100)
    assert(gate.forall(r => r.getLong(1) == r.getLong(0) + 1000000L &&
      r.getDouble(2) == 1.0))
  }

  test("PQ kernels reject malformed codebooks with clear errors") {
    def fails(df: => org.apache.spark.sql.DataFrame, frag: String): Unit = {
      val e = intercept[Exception](df.collect())
      val msg = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).mkString(" | ")
      assert(msg.contains(frag), s"expected '$frag' in: $msg")
    }
    import graft.functions.Sketches
    val v6 = typedLit(Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0))
    val one = Seq(Tuple1(1)).toDF("x")
    // empty codebook
    fails(one.select(Sketches.pqEncode(v6, typedLit(Seq.empty[Seq[Double]]))), "empty codebook")
    // dim 6 not divisible by codeword dim 4
    fails(one.select(Sketches.pqEncode(v6, typedLit(Seq(Seq(1.0, 2.0, 3.0, 4.0))))),
      "not divisible by codeword dim 4")
    // 3 codewords of dim 2 → m = 3 subspaces, 3 % 3 == 0 is fine; 4 codewords
    // of dim 4 → m = 1 (ok); 3 codewords with m = 2 subspaces → misaligned
    fails(one.select(Sketches.pqEncode(typedLit(Seq(1.0, 2.0, 3.0, 4.0)),
      typedLit(Seq(Seq(1.0, 2.0), Seq(3.0, 4.0), Seq(5.0, 6.0))))),
      "not divisible by 2 subspaces")
    // ADC: query dim mismatch
    fails(one.select(Sketches.pqAdcSim(v6, typedLit(Seq(0)),
      typedLit(Seq(Seq(1.0, 2.0))))), "query dim 6 != 1 codes x codeword dim 2")
  }

  test("q162: cluster-balanced sample — k per cell, dense ranks, WindowGroupLimit") {
    val out = Similarity.clusterBalancedSample(spark, sf("sf0.01"), numCentroids = 16, k = 5)
    val rows = out.collect()
    val byCell = rows.groupBy(_.getAs[Long]("cid"))
    // the q144 cell-stats view gives the true per-cell sizes
    val sizes = Similarity.ivfCellStats(spark, sf("sf0.01"), 16).collect()
      .map(r => r.getAs[Long]("cid") -> r.getAs[Long]("n_vectors")).toMap
    byCell.foreach { case (cid, rs) =>
      assert(rs.length == math.min(5L, sizes(cid)),
        s"cell $cid: ${rs.length} sampled of ${sizes(cid)}")
      assert(rs.map(_.getAs[Int]("rk")).sorted.toSeq == (1 to rs.length))
    }
    // replayable and layout-independent: hash order, not insertion order
    val again = Similarity.clusterBalancedSample(spark, sf("sf0.01"), 16, 5)
    assert(out.exceptAll(again).isEmpty)
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"),
      "per-cell cap must prune below the sort:\n" + p)
  }

  test("lloyd refresh: planted clusters converge to exact membership and fixpoint") {
    // 4 well-separated prototypes on coordinate axes; member m of cluster c
    // is the prototype plus a small unique offset on a far component. Seeds
    // (smallest vec_ids) are one per cluster by construction, so 3 rounds
    // settle: per-cell n equals the planted sizes and the last two rounds'
    // (n, c_sum) agree — an assignment fixpoint on the integer lattice.
    val dim = 8
    val rows = for {
      c <- 0 until 4
      m <- 0 until (10 + c)
    } yield {
      val v = Array.fill(dim)(0.0)
      v(c) = 1.0
      v(4 + ((c + m) % 4)) = 0.001 * (m + 1)
      // ids: first four ids are one member of each cluster (the seeds)
      val id = if (m == 0) c.toLong else 4L + c * 100 + m
      (id, v.toSeq)
    }
    val vecs = rows.toDF("vec_id", "v")
    val out = Similarity.lloydRefineOn(vecs, k = 4, iters = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val byIter = out.groupBy(_._1)
    assert(byIter(3).map(_._3).sorted.toSeq == Seq(10L, 11L, 12L, 13L),
      s"planted cluster sizes not recovered: ${byIter(3).mkString(", ")}")
    val last2 = Seq(2, 3).map(t => byIter(t).map(r => (r._2, r._3, r._5)).toSet)
    assert(last2(0) == last2(1),
      s"no fixpoint on the integer lattice: ${last2(0)} vs ${last2(1)}")
  }

  test("lloyd refresh: engine ≡ in-memory reference on real embeddings") {
    // same quantization (floor(x·1e6 + 0.5)), same argmin tie rule, same
    // floor-mean update, same empty-cell carry — computed in plain Scala
    // over the collected vectors, then compared row-for-row
    val vecs = Tables.embeddings(spark, sf("sf0.001"))
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val got = Similarity.lloydRefineOn(vecs, k = 8, iters = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet

    val data = vecs.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).map(x => math.floor(x * 1e6 + 0.5).toLong).toArray)
      .sortBy(_._1)
    var cents: Seq[(Long, Array[Long])] = data.take(8).map { case (id, x) => (id, x.clone) }
    val ref = scala.collection.mutable.Set[(Int, Long, Long, Long, Long)]()
    for (t <- 1 to 3) {
      val assigned = data.map { case (id, x) =>
        val (cid, dist) = cents.map { case (cc, c) =>
          (cc, x.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum)
        }.minBy { case (cc, d) => (d, cc) }
        (id, cid, dist, x)
      }
      val byCell = assigned.groupBy(_._2)
      cents = cents.map { case (cid, cOld) =>
        byCell.get(cid) match {
          case Some(members) =>
            val n = members.length
            val c = (0 until cOld.length).map { j =>
              math.floor(members.map(_._4(j)).sum.toDouble / n).toLong
            }.toArray
            (cid, c)
          case None => (cid, cOld)
        }
      }
      cents.foreach { case (cid, c) =>
        val members = byCell.getOrElse(cid, Array.empty[(Long, Long, Long, Array[Long])])
        ref += ((t, cid, members.length.toLong, members.map(_._3).sum, c.sum))
      }
    }
    assert(got == ref.toSet,
      s"engine diverged from the reference:\n got=${got.toSeq.sorted.take(5)}...\n ref=${ref.toSeq.sorted.take(5)}...")
  }

  test("lloyd refresh plan: the k-row centroid table broadcasts into the assignment scan") {
    val q = Tables.embeddings(spark, sf("sf0.001"))
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5D) AS BIGINT))").as("xq"))
    val cents = q.orderBy(col("vec_id")).limit(4)
      .select(col("vec_id").as("cid"), col("xq").as("c"))
    val plan = Similarity.lloydAssign(q, cents)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "assignment stage must broadcast the centroid side:\n" + plan.take(4000))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      "corpus must never shuffle for the assignment:\n" + plan.take(4000))
  }
}
