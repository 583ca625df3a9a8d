package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time the q00 shared build under alternative fan shapes —
  * the round-15 adjudication harness for VERDICT item 1 (driver ground
  * truth 12.66 → 31.67 s at 32 cores after round 14's chained fan; this
  * container's calm-window bench shows 7.59 s with the same shape, so the
  * shapes must be A/B'd in ONE window to attribute anything).
  *
  * Usage: runMain graft.Q00Probe <sfDir> <shape>
  *   shape ∈ chained | twowave | capped | serial
  * Each invocation is one fresh JVM (SessionMemo is session-scoped — a
  * second in-JVM run would hit the memos and time nothing), so steady
  * state per shape = median of ≥3 invocations.
  */
object Q00Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val shape = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
    spark.range(1000000L).selectExpr("sum(id)").collect()
    try spark.read.parquet(s"$sfDir/region.parquet").count()
    catch { case _: Throwable => () }

    val legSecs = new java.util.concurrent.ConcurrentHashMap[String, Double]()
    def leg(n: String)(body: => Unit): () => Unit = () => {
      val t = System.nanoTime()
      try body finally legSecs.put(n, (System.nanoTime() - t) / 1e9)
    }
    val bpe = leg("bpe")(graft.analytics.BpeInduction.tokenCounts(spark, sfDir))
    val probe = leg("probe")(graft.analytics.QualityProbe.trainedScores(spark, sfDir))
    val edges = leg("edges")(graft.analytics.Graph.warmSharedEdges(spark, sfDir))
    val pairs = leg("pairs")(graft.analytics.Dedup.nearDupPairs(spark, sfDir))
    val fuzzy = leg("fuzzy")(graft.analytics.Relational.fuzzyNearDup(spark, sfDir))
    val corpus = leg("corpus")(graft.analytics.Dedup.dedupCorpus(spark, sfDir))
    val ensemble = leg("ensemble")(graft.analytics.Dedup.ensembleDedup(spark, sfDir))
    val gateins = leg("gateins")(graft.analytics.IndexAudit.warmSharedInputs(spark, sfDir))
    val trio = leg("trio")(graft.analytics.IndexAudit.warmPristineTrio(spark, sfDir))

    import graft.functions.Par.inParallel
    val t0 = System.nanoTime()
    shape match {
      case "chained" => // round-14 Bench shape
        inParallel(Seq(
          bpe, probe, edges,
          () => { inParallel(Seq(pairs, fuzzy)); inParallel(Seq(corpus, ensemble)) },
          () => { gateins(); trio() }))
      case "twowave" => // round-13 Bench shape
        inParallel(Seq(bpe, probe, edges, pairs, fuzzy, gateins))
        inParallel(Seq(corpus, ensemble, trio))
      case "capped" => // chained dependencies, ≤3 legs in flight
        val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
        def submit(b: () => Unit) = pool.submit(new java.util.concurrent.Callable[Option[Throwable]] {
          def call(): Option[Throwable] =
            try { b(); None } catch { case t: Throwable => Some(t) }
        })
        val fs = Seq(
          submit(bpe), submit(probe), submit(edges),
          submit(() => { inParallel(Seq(pairs, fuzzy)); inParallel(Seq(corpus, ensemble)) }),
          submit(() => { gateins(); trio() }))
        val errs = fs.flatMap(_.get())
        pool.shutdown()
        errs.headOption.foreach(throw _)
      case "serial" =>
        Seq(bpe, probe, edges, pairs, fuzzy, corpus, ensemble, gateins, trio).foreach(_())
    }
    val total = (System.nanoTime() - t0) / 1e9
    import scala.jdk.CollectionConverters._
    println("Q00PROBE legs " + legSecs.asScala.toSeq.sortBy(-_._2)
      .map { case (k, v) => f"$k=$v%.2f" }.mkString(" "))
    println(f"Q00PROBE shape=$shape cpus=$cpus total=$total%.2f")
    spark.stop()
  }
}
