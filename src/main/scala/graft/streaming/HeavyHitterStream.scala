package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues}

/** Streaming heavy-hitter monitor on `transformWithState` MapState — the
  * third state-handle shape (ProfileStream covers ValueState,
  * SemanticDedupStream ListState, SessionCloseStream timers; this
  * completes the matrix with the keyed-map handle).
  *
  * The algorithm is Misra–Gries with `k` counters per monitor key (here:
  * language): a term already tracked increments; an untracked term claims
  * a free slot if one exists; otherwise EVERY counter decrements by one
  * and zeroed counters free their slots (the classic all-decrement step —
  * the streaming-state twin of the batch CMS heavy hitters, q83). The
  * guarantee is deterministic, not probabilistic: after n tokens, any
  * term with true count > n/(k+1) IS tracked, and every tracked count is
  * an UNDERCOUNT by at most n/(k+1) (StreamingSpec pins both bounds plus
  * exactness on skewed streams). No RNG, no hashing — replaying the same
  * arrival order reproduces the same counters bit-for-bit.
  *
  * State discipline: the per-key map is loaded once per (key, batch) into
  * a local map, folded locally, and written back as a diff (removeKey for
  * freed slots, updateValue for survivors) — O(k) state-store IO per key
  * per batch regardless of batch size, which is what makes the loop cheap
  * under RocksDB at scale: the store sees k-bounded maps, never the token
  * stream. Scale posture: state is O(monitor keys · k); the monitor key
  * (lang here, domain/source in production) is the shuffle key, so hot
  * languages parallelize across executors only as far as the key space —
  * for a single global top-k, run per-partition MG maps and merge (the
  * mergeability MG shares with the q102/q152 sketch family).
  */
object HeavyHitterStream {

  case class Tok(lang: String, term: String)
  case class Hot(lang: String, term: String, count_lb: Long)

  class MgProcessor(k: Int) extends StatefulProcessor[String, Tok, Hot] {
    @transient private var counts: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long]("mg",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Tok],
        timerValues: TimerValues): Iterator[Hot] = {
      val m = scala.collection.mutable.HashMap[String, Long]()
      counts.iterator().foreach { case (t, c) => m(t) = c }
      val before = m.keySet.toSet
      rows.foreach { tok =>
        m.get(tok.term) match {
          case Some(c) => m(tok.term) = c + 1L
          case None if m.size < k => m(tok.term) = 1L
          case None =>
            // all-decrement; drop freed slots
            m.mapValuesInPlace((_, c) => c - 1L)
            m.filterInPlace((_, c) => c > 0L)
        }
      }
      (before -- m.keySet).foreach(counts.removeKey)
      m.foreach { case (t, c) => counts.updateValue(t, c) }
      m.iterator.map { case (t, c) => Hot(key, t, c) }
    }
  }

  /** The standing query: per micro-batch, each monitor key emits its
    * current tracked (term, lower-bound count) set in Update mode. */
  def heavyHitters(toks: Dataset[Tok], k: Int = 8): Dataset[Hot] = {
    import toks.sparkSession.implicits._
    toks.groupByKey(_.lang)
      .transformWithState(new MgProcessor(k), TimeMode.None(), OutputMode.Update())
  }
}
