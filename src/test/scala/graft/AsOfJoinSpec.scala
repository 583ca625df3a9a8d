package graft

import graft.plans.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asof: most recent right row at or before left ts, per key") {
    val left = Seq(
      (1L, 100L, "p1"), // after clicks at 50, 90 → match 90
      (1L, 90L, "p2"),  // equal ts → match 90 (<= semantics)
      (1L, 40L, "p3"),  // before any click → null
      (2L, 500L, "p4")  // other key → its own stream (450)
    ).toDF("user_id", "us", "name")
    val right = Seq(
      (1L, 50L, 10L, 1.0),
      (1L, 90L, 11L, 2.0),
      (2L, 450L, 12L, 3.0),
      (3L, 1L, 13L, 4.0)  // key with no left rows
    ).toDF("user_id", "us", "click_id", "score")

    val got = AsOfJoin.asof(left, right, "user_id", "us", Seq("click_id", "score"), "click_id")
      .collect()
      .map(r => r.getAs[String]("name") ->
        (if (r.isNullAt(r.fieldIndex("click_id"))) None
         else Some((r.getAs[Long]("click_id"), r.getAs[Double]("score")))))
      .toMap

    assert(got("p1") == Some((11L, 2.0)))
    assert(got("p2") == Some((11L, 2.0)))
    assert(got("p3") == None)
    assert(got("p4") == Some((12L, 3.0)))
  }

  test("asof: ties among right rows at same (key, ts) resolve to greatest tiebreak") {
    val left = Seq((1L, 10L, "x")).toDF("user_id", "us", "name")
    val right = Seq((1L, 10L, 5L, 1.0), (1L, 10L, 9L, 2.0), (1L, 10L, 7L, 3.0))
      .toDF("user_id", "us", "click_id", "score")
    val r = AsOfJoin.asof(left, right, "user_id", "us", Seq("click_id", "score"), "click_id").head()
    assert(r.getAs[Long]("click_id") == 9L && r.getAs[Double]("score") == 2.0)
  }
}
