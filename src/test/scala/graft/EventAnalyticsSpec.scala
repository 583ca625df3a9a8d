package graft

import org.apache.spark.sql.functions._
import graft.analytics.Relational

/** Event-analytics operators (q91-q93): dynamic-map explode, ordered funnel,
  * cohort retention. */
class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("q91 props map explode: every key surfaces; totals match raw parse") {
    val d = sf("sf0.001")
    val r = Relational.propsMapExplode(spark, d)
    // every event carries a "k" key in this corpus; the per-type row count
    // must equal the per-type event count
    val perType = graft.Tables.events(spark, d)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n_events"))
    val joined = r.join(perType, "event_type")
      .filter(col("prop_key") === "k")
      .filter(col("n") =!= col("n_events"))
    assert(joined.count() == 0, "one exploded row per event for the k key")
    // values are the same numbers q11's fixed-path extraction sees
    val sumK = graft.Tables.events(spark, d)
      .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
      .agg(sum(col("k"))).collect()(0).getLong(0)
    val sumExploded = r.agg(sum(col("sum_value"))).collect()(0).getLong(0)
    assert(sumExploded == sumK)
  }

  test("q92 funnel: stage counts are monotone and ordering is enforced") {
    import java.sql.Timestamp
    val row = Relational.conversionFunnel(spark, sf("sf0.001")).collect()(0)
    val (nV, nC, nP) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(nV >= nC && nC >= nP, s"funnel must narrow: $nV >= $nC >= $nP")
    assert(nV > 0, "corpus has views")
    // hand-built ordering check: a click BEFORE the first view must not count
    val e = Seq(
      (1L, "click", Timestamp.valueOf("2025-01-01 00:00:00")),
      (1L, "view", Timestamp.valueOf("2025-01-01 01:00:00")),
      (2L, "view", Timestamp.valueOf("2025-01-01 00:00:00")),
      (2L, "click", Timestamp.valueOf("2025-01-01 01:00:00")),
      (2L, "purchase", Timestamp.valueOf("2025-01-01 02:00:00"))
    ).toDF("user_id", "event_type", "ts")
      .select(col("user_id"), col("event_type"),
        floor(unix_timestamp(col("ts"))).as("ts_s"))
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts_s")).as("v_ts"))
    val c = e.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("ts_s") >= col("v_ts"))
      .groupBy(col("user_id")).agg(min(col("ts_s")).as("c_ts"))
    assert(v.count() == 2 && c.count() == 1,
      "user 1's pre-view click must not convert")
  }

  test("q93 cohort retention: offset-0 cell equals cohort size; offsets non-negative") {
    val r = Relational.cohortRetention(spark, sf("sf0.001")).cache()
    assert(r.filter(col("week_offset") < 0).count() == 0)
    // every user appears in their own cohort's offset-0 week by construction,
    // so the offset-0 cell is the cohort's full size and no later cell exceeds it
    val base = r.filter(col("week_offset") === 0)
      .select(col("cohort_week"), col("n_users").as("cohort_size"))
    val exceeding = r.join(base, "cohort_week")
      .filter(col("n_users") > col("cohort_size"))
    assert(exceeding.count() == 0, "retention can never exceed cohort size")
    val cohortsCovered = r.select(col("cohort_week")).distinct().count()
    assert(base.count() == cohortsCovered, "every cohort has an offset-0 cell")
    r.unpersist()
  }
}
