package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-stream analytics: watermarked tumbling-window aggregation and
  * stateful gap-based sessionization (`flatMapGroupsWithState`) — the
  * streaming counterparts of Relational.hourlyEvents / Relational.sessionize.
  * Tests drive these from MemoryStream (no broker needed). */
object EventStream {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  case class SessionState(start: Long, last: Long, n: Long, sum: Double)

  case class Session(user_id: Long, sess_start: Long, sess_end: Long,
      n_events: Long, sum_value: Double)

  /** Tumbling 1-hour windowed counts with a 10-minute watermark: late events
    * beyond the watermark are dropped, windows finalize exactly once.
    * (The reference has no event-time processing at all — it files records
    * by ingest wall-clock, SURVEY.md §2.7 T3.) */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Stream-static enrichment: a streaming event frame joined to a static
    * dimension (broadcast per micro-batch — the static side is re-read each
    * trigger, so slowly-changing dims stay fresh without restarting the
    * query). The streaming analogue of the reference's batch-only
    * enrichment gap. */
  def enriched(events: DataFrame, userDim: DataFrame): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(userDim), Seq("user_id"), "left")

  /** Windowed distinct-user KMV sketches: each closed window emits a
    * mergeable 2 KB sketch plus its estimate. The aggregate's buffer lives
    * in the state store between micro-batches, so incremental arrival
    * produces the same bottom-k set (bitwise) as one batch pass — and the
    * per-window sketch binaries can be persisted and later `kmv_merge`d
    * across windows/days without touching raw events (q153's rollup
    * contract, streaming edition). */
  def windowedUserSketch(events: DataFrame, k: Int = 256): DataFrame = {
    import graft.functions.KmvSketch.{kmvEstimate, kmvSketch}
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(kmvSketch(xxhash64(col("user_id")), k).as("sk"),
        count(lit(1)).as("n_events"))
      .select(col("window.start").as("hour"), col("sk"),
        kmvEstimate(col("sk")).as("approx_users"), col("n_events"))
  }

  /** Stream-stream join with event-time bounds: purchases joined to the
    * same user's clicks from the preceding hour. Both sides carry
    * watermarks, and the range condition bounds the join state — Spark
    * evicts click state older than the watermark minus the hour bound, so
    * state is O(active window), never unbounded. */
  def purchasesWithRecentClicks(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.expr
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"))
      .withWatermark("purchase_ts", "10 minutes")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("click_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "10 minutes")
    purchases.join(clicks,
      expr("""user_id = click_user AND
              click_ts <= purchase_ts AND
              click_ts >= purchase_ts - INTERVAL 1 HOUR"""))
      .select(col("user_id"), col("purchase_id"), col("purchase_ts"),
        col("purchase_value"), col("click_id"), col("click_ts"))
  }

  /** Streaming exact dedup — the streaming twin of the batch q20: an
    * at-least-once upstream (the reference's deliberate re-crawl overlap,
    * crawler/alonhadat.py:49,71-72) becomes exactly-once-per-key downstream.
    * `dropDuplicatesWithinWatermark` keys state on the id and EVICTS state
    * older than the watermark horizon — so state is bounded by the overlap
    * window (what the duplicates actually span), not by stream history.
    * Plain `dropDuplicates` on a stream would grow state forever. */
  def dedupedEvents(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  case class FunnelState(start: Long, last: Long, n: Long,
      vTs: Long, cTs: Long, pTs: Long) // -1 = stage not reached

  case class SessionFunnel(user_id: Long, sess_start: Long, sess_end: Long,
      n_events: Long, viewed: Boolean, clicked: Boolean, purchased: Boolean)

  /** Streaming session funnel — the stateful twin of the batch q99: the
    * same 30-min-gap session state machine, extended with ordered stage
    * anchors (first view; first click at-or-after it; first purchase
    * at-or-after that — processing in event order makes the greedy rule
    * equal to q99's per-session minimums). Each closed session emits one
    * row with its conversion flags, so the funnel DASHBOARD is a plain
    * streaming aggregate over this output. State is one fixed-size record
    * per ACTIVE user (timeout-flushed), independent of history length. */
  def sessionFunnel(events: Dataset[Event], gapSeconds: Long = 1800,
      timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout): Dataset[SessionFunnel] = {
    import events.sparkSession.implicits._
    val useTimeout = timeout != GroupStateTimeout.NoTimeout

    def stage(s: FunnelState, e: Event, t: Long): FunnelState = e.event_type match {
      case "view" if s.vTs < 0 => s.copy(vTs = t)
      case "click" if s.vTs >= 0 && s.cTs < 0 && t >= s.vTs => s.copy(cTs = t)
      case "purchase" if s.cTs >= 0 && s.pTs < 0 && t >= s.cTs => s.copy(pTs = t)
      case _ => s
    }
    def close(userId: Long, s: FunnelState): SessionFunnel =
      SessionFunnel(userId, s.start, s.last, s.n,
        viewed = s.vTs >= 0, clicked = s.cTs >= 0, purchased = s.pTs >= 0)
    def fresh(t: Long): FunnelState = FunnelState(t, t, 0, -1, -1, -1)

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(
        (userId: Long, batch: Iterator[Event], state: GroupState[FunnelState]) => {
          var cur = state.getOption
          val out = scala.collection.mutable.ListBuffer.empty[SessionFunnel]
          if (state.hasTimedOut) {
            cur.foreach(s => out += close(userId, s))
            state.remove()
            out.iterator
          } else {
            for (e <- batch.toSeq.sortBy(ev => (ev.ts.getTime, ev.event_id))) {
              val t = e.ts.getTime / 1000
              cur match {
                // late-event guard (watermark mirror): an event from a later
                // micro-batch with event-time before the state's frontier
                // would extend the session backwards (negative gap) and
                // regress `last`; drop it, as an upstream watermark would
                case Some(s) if t < s.last => ()
                case Some(s) if t - s.last > gapSeconds =>
                  out += close(userId, s)
                  cur = Some(stage(fresh(t), e, t).copy(n = 1))
                case Some(s) =>
                  cur = Some(stage(s.copy(last = t, n = s.n + 1), e, t))
                case None =>
                  cur = Some(stage(fresh(t), e, t).copy(n = 1))
              }
            }
            cur match {
              case Some(s) =>
                state.update(s)
                if (useTimeout) state.setTimeoutDuration(gapSeconds * 1000)
              case None => ()
            }
            out.iterator
          }
        })
  }

  case class Scd2State(state: String, from: Long, version: Long)

  case class Scd2Closed(user_id: Long, version: Long, state: String,
      valid_from: Long, valid_to: Long)

  /** Streaming SCD2 maintenance — the stateful twin of the batch q129: per
    * user, the event_type attribute's consecutive repeats collapse, and
    * each attribute CHANGE closes the previous version's interval, which is
    * emitted downstream (Append mode — only closed, immutable versions
    * flow; the open "current" version lives in state until its closing
    * change arrives). This is how a CDC pipeline maintains a type-2
    * dimension incrementally instead of rebuilding it per batch. State is
    * ONE fixed-size record per user — bounded by the entity universe
    * exactly like the dimension table itself, so no timeout eviction is
    * needed for boundedness. */
  def scd2Stream(events: Dataset[Event]): Dataset[Scd2Closed] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, batch: Iterator[Event], state: GroupState[Scd2State]) => {
          var cur = state.getOption
          val out = scala.collection.mutable.ListBuffer.empty[Scd2Closed]
          for (e <- batch.toSeq.sortBy(ev => (ev.ts.getTime, ev.event_id))) {
            val t = e.ts.getTime / 1000
            cur match {
              // late-event guard: a change event older than the open
              // version's valid_from would close an interval with
              // valid_to < valid_from; drop it (watermark mirror)
              case Some(s) if t < s.from => ()
              case Some(s) if s.state != e.event_type =>
                out += Scd2Closed(userId, s.version, s.state, s.from, t)
                cur = Some(Scd2State(e.event_type, t, s.version + 1))
              case Some(_) => () // consecutive repeat: collapse
              case None => cur = Some(Scd2State(e.event_type, t, 1L))
            }
          }
          cur.foreach(state.update)
          out.iterator
        })
  }

  /** Gap-based sessionization (30-min inactivity) with explicit keyed state:
    * emits a Session row when a gap closes a session or the state times out.
    * Processing-time timeout keeps state bounded — sessions for idle users
    * are flushed rather than held forever (mandatory at 100 TB: state size
    * tracks ACTIVE users, not all users ever seen). */
  def sessionize(events: Dataset[Event], gapSeconds: Long = 1800,
      timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout): Dataset[Session] = {
    import events.sparkSession.implicits._
    val useTimeout = timeout != GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) => {
          var cur = state.getOption
          val out = scala.collection.mutable.ListBuffer.empty[Session]
          if (state.hasTimedOut) {
            cur.foreach(s => out += Session(userId, s.start, s.last, s.n, s.sum))
            state.remove()
            out.iterator
          } else {
            // order within the micro-batch; state carries order across batches
            for (e <- batch.toSeq.sortBy(ev => (ev.ts.getTime, ev.event_id))) {
              val t = e.ts.getTime / 1000
              cur match {
                // late-event guard (watermark mirror): never extend a
                // session backwards from a cross-batch straggler
                case Some(s) if t < s.last => ()
                case Some(s) if t - s.last <= gapSeconds =>
                  cur = Some(s.copy(last = t, n = s.n + 1, sum = s.sum + e.value))
                case Some(s) =>
                  out += Session(userId, s.start, s.last, s.n, s.sum)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur match {
              case Some(s) =>
                state.update(s)
                if (useTimeout) state.setTimeoutDuration(gapSeconds * 1000)
              case None => ()
            }
            out.iterator
          }
        })
  }
}
