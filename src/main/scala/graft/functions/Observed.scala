package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** In-flight pipeline metrics via Spark's observed-metrics API
  * (`Dataset.observe`) — operational counters collected DURING the action
  * that produces the data, not by a second scan: at 100 TB a separate
  * "count the violations" pass costs another full read; an observation
  * costs one accumulator merge. The helper attaches the engine's standard
  * gate metrics (row count, per-column null-violation counts) to any
  * frame; the caller runs its normal action and then reads the metrics
  * off the [[org.apache.spark.sql.Observation]] handle. Works identically
  * under batch and micro-batch (Structured Streaming surfaces the same
  * metrics in each progress event's observedMetrics map).
  */
object Observed {

  /** Attach (n_rows, null count per `required` column) to `df` under
    * `obs`. Metrics materialize when the caller's action runs. */
  def withGateMetrics(df: DataFrame, obs: Observation,
      required: Seq[String]): DataFrame = {
    val nulls: Seq[Column] = required.map(c =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c"))
    df.observe(obs, count(lit(1)).as("n_rows"), nulls: _*)
  }
}
