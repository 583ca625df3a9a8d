package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.orders

/** Data-layout primitives: multi-dimensional clustering keys and the
  * data-skipping diagnostics that justify them.
  *
  * Why this is an engine feature and not an app concern: at 100 TB the
  * dominant cost of every query is the scan, and the scan's cost is decided
  * BEFORE any operator runs — by how rows were laid out at write time.
  * Parquet keeps min/max statistics per row group and Spark prunes files
  * and row groups against pushed-down predicates, but a layout sorted by
  * one dimension gives pruning power on that dimension only. Interleaving
  * the bits of two dimensions (Morton / z-order) gives both dimensions
  * partial locality in ONE sort key, so range predicates on either (or
  * both) skip most files. This is the same mechanism behind
  * `OPTIMIZE ... ZORDER BY` in lakehouse table formats, built here from
  * plain column expressions so the write path stays stock
  * `repartitionByRange(z).sortWithinPartitions(z).write.parquet`. */
object Layout {

  /** Morton (z-order) interleave of the low `bits` bits of two non-negative
    * dimensions: bit i of x lands at position 2i, bit i of y at 2i+1.
    * Pure integer bit arithmetic on built-in expressions — fully
    * codegen'd, engine-portable (the DuckDB oracle states the identical
    * term sum), and cheap enough to fuse into any write. Values are masked
    * to `bits` bits first, so out-of-range dimensions wrap rather than
    * corrupt high bits (quantize or rank dimensions upstream when their
    * domain exceeds 2^bits). */
  def zorderValue(x: Column, y: Column, bits: Int = 16): Column = {
    val mask = (1L << bits) - 1
    val xm = x.cast("long").bitwiseAND(lit(mask))
    val ym = y.cast("long").bitwiseAND(lit(mask))
    (0 until bits).map { i =>
      shiftleft(shiftright(xm, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(ym, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** q146: z-order data-skipping diagnostic — the measured answer to "which
    * layout should this table be written in?". Orders are assigned to
    * `nFiles` files two ways: `linear` (sorted by order date — the layout
    * a time-series table gets by default) and `zorder` (sorted by the
    * custkey×date Morton key). For the customer-range probe predicate
    * `ck ∈ [ckLo, ckHi]` the diagnostic reports, per layout, how many
    * files a min/max-pruning reader must scan and how many rows those
    * files hold — the exact quantity parquet row-group pruning acts on.
    * Under the linear layout every file spans all customers (files_scanned
    * = n_files); under z-order the custkey range concentrates in a few
    * files. `rows_matched` is layout-invariant and doubles as the
    * cross-check that both branches saw the same table.
    *
    * Both dimensions are range-normalized to the full 16-bit domain before
    * interleaving — REQUIRED for z-order to work at all: raw custkey
    * (~2^8 at small SF) against raw day-number (~2^12) puts every
    * contested high bit on the date side and the curve degenerates to a
    * date sort (measured: zero pruning). Normalized, the top bits
    * alternate dimensions and each halving of the file range halves both
    * dims — the property min/max pruning exploits. File = top log2(nFiles)
    * bits of z, so file ranges are fixed z-space octants.
    *
    * Plan: dimension bounds come from one scalar aggregate broadcast back
    * (single-row cross join); the normalize+interleave is a narrow fused
    * projection; per-file min/max/count is a partial+final aggregate over
    * ≤ nFiles groups; the final overlap counts aggregate nFiles rows. The
    * table is scanned once per layout branch and never shuffled beyond the
    * nFiles-group aggregate. All arithmetic is exact integer (`div`), so
    * the assignment is deterministic for any corpus and engine-portable. */
  def zorderSkipping(spark: SparkSession, dir: String, nFiles: Int = 64,
      ckLo: Long = 100, ckHi: Long = 199): DataFrame = {
    require(nFiles > 0 && (nFiles & (nFiles - 1)) == 0, "nFiles must be a power of two")
    val zShift = 32 - java.lang.Integer.numberOfTrailingZeros(nFiles)
    val o = orders(spark, dir).select(
      col("o_custkey").as("ck"),
      datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
        .cast("long").as("dy"))
    val bounds = o.agg(min(col("ck")).as("cklo"), max(col("ck")).as("ckhi"),
      min(col("dy")).as("dlo"), max(col("dy")).as("dhi"))
    val filed = o.crossJoin(broadcast(bounds))
      .select(col("ck"),
        expr("((ck - cklo) * 65535) div greatest(ckhi - cklo, 1)").as("xq"),
        expr("((dy - dlo) * 65535) div greatest(dhi - dlo, 1)").as("yq"),
        expr(s"(dy - dlo) div ((dhi - dlo) div $nFiles + 1)").as("f_lin"))
      .select(col("ck"), col("f_lin"),
        shiftright(zorderValue(col("xq"), col("yq")), zShift).as("f_z"))

    def layoutStats(fileCol: String, layout: String): DataFrame =
      filed.groupBy(col(fileCol).as("file"))
        .agg(min(col("ck")).as("ck_min"), max(col("ck")).as("ck_max"),
          count(lit(1)).as("n"),
          sum(when(col("ck").between(ckLo, ckHi), 1L).otherwise(0L)).as("nm"))
        .agg(count(lit(1)).as("n_files"),
          sum(when(col("ck_min") <= ckHi && col("ck_max") >= ckLo, 1L)
            .otherwise(0L)).as("files_scanned"),
          sum(when(col("ck_min") <= ckHi && col("ck_max") >= ckLo, col("n"))
            .otherwise(0L)).as("rows_scanned"),
          sum(col("nm")).as("rows_matched"))
        .select(lit(layout).as("layout"), col("n_files"), col("files_scanned"),
          col("rows_scanned"), col("rows_matched"))

    layoutStats("f_z", "zorder").unionByName(layoutStats("f_lin", "linear"))
  }
}
