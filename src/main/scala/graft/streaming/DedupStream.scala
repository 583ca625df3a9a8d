package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-duplicate detection — the STREAMING member of the dedup
  * family: a crawl/ingest stream raises a candidate alert the moment a new
  * document lands in an LSH bucket that already holds one, instead of
  * waiting for the nightly batch pass (q26). The batch reference repo's
  * consumer topology (Kafka → transform → store) gains the one thing batch
  * dedup can't give: bounded-latency duplicate signals during ingest.
  *
  * Design — the q26 banding, re-expressed against Structured Streaming's
  * state contract:
  *  - signature + band keys are a pure NARROW projection per arriving doc
  *    (the codegen'd MinHash kernel; no shuffle, no state) — `bandKeysFor`;
  *  - state is keyed by (band, band_key): each bucket retains the first
  *    `capPerBucket` doc_ids it has seen. A new arrival alerts against every
  *    retained prior, then joins the retained set if there is room.
  *
  * Scale/state posture: per-bucket state is ≤ capPerBucket longs no matter
  * how hot the bucket (the BoundedMinK argument applied to streaming state),
  * so total state is O(active buckets · cap) and the processing-time timeout
  * evicts idle buckets — state tracks the ACTIVE working set, not corpus
  * history. Alerts are candidates in exactly q26's sense (signature-bucket
  * collisions): the same pair may alert from several bands (the `band`
  * column says which; consumers dedup downstream or exact-verify like q25's
  * verify stage), and a pair whose buckets were evicted or capped can be
  * missed — at-most-cap memory is the documented trade, tuned by
  * `capPerBucket` and the timeout, both orthogonal to the plan shape.
  */
object DedupStream {

  case class DocArrival(doc_id: Long, text: String)
  case class BandKeyed(doc_id: Long, band: Int, band_key: Long)
  case class BucketState(docIds: List[Long])
  case class NearDupAlert(doc_id: Long, prior_id: Long, band: Int)

  def nearDupAlerts(docs: Dataset[DocArrival], capPerBucket: Int = 8,
      timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout,
      stateTtlMs: Long = 3600L * 1000): Dataset[NearDupAlert] = {
    import docs.sparkSession.implicits._
    val useTimeout = timeout != GroupStateTimeout.NoTimeout
    val keyed = graft.analytics.Dedup.bandKeysFor(docs.toDF()).as[BandKeyed]
    keyed
      .groupByKey(r => (r.band, r.band_key))
      .flatMapGroupsWithState(OutputMode.Append, timeout)(
        (key: (Int, Long), batch: Iterator[BandKeyed], state: GroupState[BucketState]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var retained = state.getOption.map(_.docIds).getOrElse(Nil)
            val out = scala.collection.mutable.ListBuffer.empty[NearDupAlert]
            // doc_id order makes re-delivered batches deterministic
            for (r <- batch.toSeq.sortBy(_.doc_id)) {
              if (!retained.contains(r.doc_id)) {
                retained.foreach(p => out += NearDupAlert(r.doc_id, p, key._1))
                if (retained.size < capPerBucket) retained = retained :+ r.doc_id
              }
            }
            state.update(BucketState(retained))
            if (useTimeout) state.setTimeoutDuration(stateTtlMs)
            out.iterator
          }
        })
  }
}
