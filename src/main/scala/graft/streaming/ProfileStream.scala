package graft.streaming

import java.time.Duration

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Standing per-user activity profile on Spark 4's `transformWithState`
  * arbitrary-state API — the successor of `flatMapGroupsWithState` (used
  * by EventStream/DedupStream/DriftStream) and the API a new standing
  * pipeline should target: typed named state handles (`ValueState` /
  * `ListState` / `MapState`) with PER-STATE TTL owned by the store, and a
  * RocksDB-backed state store (`transformWithState` requires the RocksDB
  * provider — set `spark.sql.streaming.stateStore.providerClass` to
  * `...state.RocksDBStateStoreProvider`, which ships in /opt/spark/jars).
  *
  * The operator itself is the "customer 360" maintenance loop: one
  * fixed-size profile row per user (event count, purchase count, exact
  * Long micro-unit revenue — the q137 money discipline, no FP
  * accumulation in state — and last-seen timestamp), updated per
  * micro-batch, emitted in Update mode. State is bounded by the live user
  * universe; with a TTL configured the store expires dormant users by
  * itself — eviction logic that the flatMapGroupsWithState twins
  * (DedupStream/DriftStream) implement by hand inside the function.
  *
  * Determinism: per-key updates fold in arrival order within the batch,
  * and every accumulator is an exact integer, so a replayed batch
  * produces the identical profile row (StreamingSpec pins cross-batch
  * accumulation and the no-TTL profile values exactly).
  */
object ProfileStream {

  case class Event(user_id: Long, event_type: String, value: Double, ts_s: Long)
  case class Profile(user_id: Long, n_events: Long, n_purchases: Long,
      revenue_micro: Long, last_ts_s: Long)

  class ProfileProcessor(ttl: Option[Duration])
      extends StatefulProcessor[Long, Event, Profile] {
    @transient private var state: ValueState[Profile] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Profile]("profile",
        Encoders.product[Profile],
        ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[Profile] = {
      var p =
        if (state.exists()) state.get()
        else Profile(key, 0L, 0L, 0L, Long.MinValue)
      rows.foreach { e =>
        val purchase = e.event_type == "purchase"
        p = Profile(key,
          p.n_events + 1L,
          p.n_purchases + (if (purchase) 1L else 0L),
          p.revenue_micro + (if (purchase) math.round(e.value * 1e6) else 0L),
          math.max(p.last_ts_s, e.ts_s))
      }
      state.update(p)
      Iterator.single(p)
    }
  }

  /** The standing query: one updated profile row per (user, micro-batch).
    * `ttl = Some(d)` switches to processing-time mode and lets the store
    * expire users idle longer than `d` (TTL requires a clock; the no-TTL
    * form stays in TimeMode.None and is fully deterministic). */
  def profiles(events: Dataset[Event],
      ttl: Option[Duration] = None): Dataset[Profile] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new ProfileProcessor(ttl),
        if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Update())
  }
}
