package graft

import org.apache.spark.sql.functions._
import graft.analytics.Layout

/** Z-order layout primitives (q146): bit-exact interleave semantics on
  * hand values, skipping-diagnostic invariants on the sf0.001 corpus. */
class LayoutSpec extends SparkSpec {

  test("zorderValue: known interleaves bit-exact, masking wraps high bits") {
    import spark.implicits._
    val rows = Seq(
      (5L, 3L),       // x=101 → bits 0,4 = 17; y=011 → bits 1,3 = 10; z = 27
      (0L, 0L),
      (65535L, 0L),   // all even positions set: Σ 4^i, i<16 = (4^16-1)/3
      (0L, 65535L),   // all odd positions: twice the even sum
      (65536L, 1L))   // x wraps to 0 under the 16-bit mask
      .toDF("x", "y")
    val z = rows.select(Layout.zorderValue(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0))
    val evenSum = (0 until 16).map(i => 1L << (2 * i)).sum
    assert(z(0) == 27L)
    assert(z(1) == 0L)
    assert(z(2) == evenSum)
    assert(z(3) == 2 * evenSum)
    assert(z(4) == 2L, "x=65536 masks to 0, y=1 lands at bit 1")
  }

  test("zorderValue: z-range locality — low halves of both dims stay in low z") {
    import spark.implicits._
    // every point with x < 256 and y < 256 has z < 2^16: the prefix property
    // min/max pruning exploits (high bits of z come from high bits of x|y)
    val pts = (for (x <- 0L until 512L by 37; y <- 0L until 512L by 41) yield (x, y))
      .toDF("x", "y")
      .select(col("x"), col("y"), Layout.zorderValue(col("x"), col("y")).as("z"))
    assert(pts.filter(col("x") < 256 && col("y") < 256 && col("z") >= 65536).count() == 0)
    assert(pts.filter((col("x") >= 256 || col("y") >= 256) && col("z") < 65536).count() == 0)
  }

  test("q146 skipping: zorder prunes the custkey probe, linear cannot") {
    val d = sf("sf0.001")
    val r = Layout.zorderSkipping(spark, d)
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    val (zFiles, zScan, zRows, zMatch) = r("zorder")
    val (lFiles, lScan, lRows, lMatch) = r("linear")
    assert(zMatch == lMatch, "matched rows are layout-invariant")
    assert(zRows >= zMatch && lRows >= lMatch, "scanned files cover all matches")
    assert(zFiles <= 64 && lFiles <= 64)
    // the point of the layout: the customer-range probe scans strictly fewer
    // files (and rows) under z-order than under the date-linear layout
    assert(zScan < lScan, s"zorder must prune: $zScan vs $lScan")
    assert(zRows < lRows)
    // linear = date-sorted files: every file spans all customers
    assert(lScan == lFiles, "date-linear layout cannot prune a custkey probe")
  }
}
