package graft.streaming

import java.time.Duration

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues}

/** Streaming SEMANTIC near-duplicate alerts — the embedding twin of
  * [[DedupStream]] (which buckets MinHash bands over text), and the
  * second `transformWithState` member next to [[ProfileStream]]: state is
  * a typed `ListState` of bucket members with store-owned TTL, exercising
  * the list-state + TTL corner of Spark 4's arbitrary-state API.
  *
  * An embedding arriving on the stream (a document leaving the encoder)
  * is hashed into its multi-table sign-LSH buckets (the q30 kernel, a
  * pure narrow projection — `Sketches.signBuckets`); per (table, bucket)
  * key the processor retains the first `capPerBucket` member vectors and
  * EXACT-verifies each new arrival against them, alerting only pairs at
  * rounded cosine ≥ `tau` — unlike the text twin (which emits unverified
  * band collisions), the vectors are small enough to keep in state, so
  * alerts here are verified semantic duplicates, not candidates.
  *
  * State posture: ≤ cap 64-double vectors per active bucket (~cap·512
  * bytes), total O(active buckets · cap); the TTL evicts dormant buckets
  * store-side. Same documented trade as the text twin: a pair whose
  * bucket was capped or expired can be missed — the batch pass (q30/
  * q174) stays the recall authority, the stream buys bounded latency.
  * The same pair may alert from several tables (the `tbl` column says
  * which); consumers dedup downstream.
  *
  * Determinism: arrivals fold in vec_id order within a batch, cosine is
  * the same sequential kernel as the batch verify (Sketches.cosineSim's
  * formula), and the alert threshold applies to the 4-dp rounded value —
  * StreamingSpec pins planted cross-batch duplicates and the absence of
  * false alerts exactly.
  */
object SemanticDedupStream {

  case class VecArrival(vec_id: Long, v: Seq[Double])
  case class Bucketed(vec_id: Long, v: Seq[Double], tbl: Int, bk: Int)
  case class Member(vec_id: Long, v: Seq[Double])
  case class SemanticAlert(vec_id: Long, prior_id: Long, tbl: Int, cos_sim: Double)

  private def cosine(a: Seq[Double], b: Seq[Double]): Double = {
    val d = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < d) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  class BucketProcessor(cap: Int, tau: Double, ttl: Option[Duration])
      extends StatefulProcessor[(Int, Int), Bucketed, SemanticAlert] {
    @transient private var members: ListState[Member] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      members = getHandle.getListState[Member]("members",
        Encoders.product[Member],
        ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))

    override def handleInputRows(key: (Int, Int), rows: Iterator[Bucketed],
        timerValues: TimerValues): Iterator[SemanticAlert] = {
      var retained: List[Member] = if (members.exists()) members.get().toList else Nil
      val out = scala.collection.mutable.ListBuffer.empty[SemanticAlert]
      for (r <- rows.toSeq.sortBy(_.vec_id)) {
        if (!retained.exists(_.vec_id == r.vec_id)) {
          retained.foreach { m =>
            val c = math.rint(cosine(r.v, m.v) * 1e4) / 1e4
            if (c >= tau) out += SemanticAlert(r.vec_id, m.vec_id, key._1, c)
          }
          if (retained.size < cap) {
            retained = retained :+ Member(r.vec_id, r.v)
            members.appendValue(Member(r.vec_id, r.v))
          }
        }
      }
      out.iterator
    }
  }

  /** The standing query. Requires the RocksDB state-store provider
    * (`spark.sql.streaming.stateStore.providerClass`). */
  def alerts(vecs: Dataset[VecArrival], capPerBucket: Int = 8,
      tau: Double = 0.95, ttl: Option[Duration] = None): Dataset[SemanticAlert] = {
    import vecs.sparkSession.implicits._
    val bucketed = vecs.toDF()
      .select(col("vec_id"), col("v"),
        posexplode(graft.functions.Sketches.signBuckets(col("v"))).as(Seq("tbl", "bk")))
      .as[Bucketed]
    bucketed.groupByKey(r => (r.tbl, r.bk))
      .transformWithState(new BucketProcessor(capPerBucket, tau, ttl),
        if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append())
  }
}
