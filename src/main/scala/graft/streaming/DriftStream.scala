package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming embedding-drift monitor — the stateful twin of batch q143: the
  * per-label centroid geometry (vector count + centroid norm) maintained
  * continuously as embeddings arrive, so a preprocessing or model change
  * that shifts one segment's embeddings is visible within a micro-batch
  * instead of at the nightly batch run.
  *
  * Exactness across replays and partitionings (the q137 discipline applied
  * to vectors): state accumulates 6-dp-QUANTIZED components as exact Long
  * micro-units — integer addition is associative and overflow-safe here
  * (unit-scale components × 1e6 leaves 2^43 arrivals of headroom per
  * label·dim), so the running sums are bit-identical to what the batch
  * q143 aggregate computes over the same prefix of the stream, no matter
  * how batches split or re-order within a label. The norm divides and
  * roots in double only at EMIT time (same operands → same double), never
  * in state.
  *
  * State size: one Long count + `dim` Longs per ACTIVE label — bounded by
  * the label universe, independent of stream length; idle labels evict on
  * the processing-time timeout. Updates per batch are grouped per label
  * (one state read-modify-write per label per trigger), so throughput
  * tracks label cardinality, not vector volume. */
object DriftStream {

  case class VecArrival(label: String, embedding: Seq[Double])
  case class LabelState(n: Long, sums: Seq[Long])
  case class DriftRow(label: String, n_vecs: Long, centroid_norm: Double)

  def centroidDrift(vecs: Dataset[VecArrival],
      timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout,
      stateTtlMs: Long = 3600L * 1000): Dataset[DriftRow] = {
    import vecs.sparkSession.implicits._
    val useTimeout = timeout != GroupStateTimeout.NoTimeout
    vecs.groupByKey(_.label)
      .mapGroupsWithState(timeout)(
        (label: String, batch: Iterator[VecArrival], state: GroupState[LabelState]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            DriftRow(label, s.n, normOf(s))
          } else {
            var s = state.getOption.getOrElse(LabelState(0L, Seq.empty))
            batch.foreach { v =>
              val micros = v.embedding.map(x => math.round(x * 1e6))
              val sums =
                if (s.sums.isEmpty) micros
                else s.sums.zip(micros).map { case (a, b) => a + b }
              s = LabelState(s.n + 1, sums)
            }
            state.update(s)
            if (useTimeout) state.setTimeoutDuration(stateTtlMs)
            DriftRow(label, s.n, normOf(s))
          }
        })
  }

  /** ‖mean vector‖₂ from exact micro-unit sums — double only at the edge,
    * rounded 4 dp like the batch q143 emit. */
  private def normOf(s: LabelState): Double = {
    if (s.n == 0) return 0.0
    val sq = s.sums.map { m =>
      val mean = m.toDouble / s.n / 1e6
      mean * mean
    }.sum
    math.rint(math.sqrt(sq) * 1e4) / 1e4
  }
}
