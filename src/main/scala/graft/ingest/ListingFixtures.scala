package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.model.RawSiteListing

/** Deterministic raw-listing fixture corpus covering every parser branch of
  * the reference crawler (FIXTURES.md §B; reference: crawler/alonhadat.py).
  * Inlined (not a file) so the oracle side can reproduce it as a SQL VALUES
  * list byte-for-byte. `AsOfDate` anchors relative dates for replay. */
object ListingFixtures {

  val AsOfDate = "2025-04-24"

  /** NFD (decomposed diacritics) encoding — row 9 carries it to pin the
    * engine's NFC-at-ingest contract (Normalize.fromSiteText). Built from
    * the NFC literal so the intent is explicit and byte-exactness is
    * guaranteed on both the Spark and oracle side (SparkEntry uses the same
    * helper for the VALUES list). */
  def nfd(s: String): String =
    java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)

  // (id, raw_post_date, raw_address, raw_price, raw_area, raw_dims,
  //  raw_road, raw_floors, raw_bedrooms, raw_parking)
  val rows: Seq[RawSiteListing] = Seq(
    RawSiteListing(1L, "Hôm nay",
      "Đường Lê Lợi, Phường Bến Nghé, Quận 1, Hồ Chí Minh",
      "5,5 tỷ", "80 m²", "Kích thước: 4x20m", "12m", "3 lầu", "4 phòng ngủ", "Có"),
    RawSiteListing(2L, "Hôm qua",
      "Phố Huế, Xã Tân Triều, Huyện Thanh Trì, Hà Nội",
      "850 triệu", "45,5 m2", "Kích thước: 4,5x10m", "8m", "2 lầu", "3 phòng ngủ", null),
    RawSiteListing(3L, "24/04/2025",
      "Nguyễn Trãi, Phường 7, Quận Gò Vấp, Hồ Chí Minh",
      "Thỏa thuận", "---", "---", null, null, null, "Có"),
    RawSiteListing(4L, "not a date",
      "A, B, C, D",
      "giá rẻ", "120,75 m²", "Kích thước: ---", null, "10 lầu", null, null),
    RawSiteListing(5L, "01/01/2024",
      "Đường Nguyễn Huệ, Quận 5",
      "1.2 tỷ", "60 m", "Kích thước: 5x12m", "6m", "1 lầu", "2 phòng ngủ", "Có"),
    RawSiteListing(6L, "hôm nay",
      "Trần Phú, Phường Mộ Lao, Quận Hà Đông, Hà Nội",
      "2,,3 tỷ", "abc", "Kích thước: 20m", "4,5m", "năm lầu", "0 phòng ngủ", "Không"),
    RawSiteListing(7L, null, null, null, null, null, null, null, null, null),
    RawSiteListing(8L, "31/02/2025",
      "Lý Thường Kiệt, Phường 8, Quận Tân Bình, Hồ Chí Minh",
      "990  triệu", "33,0 m²", "Kích thước: 3,3x10m", "5m", "4 lầu", "3 phòng ngủ", "Có"),
    // NFD-encoded row: every Vietnamese match (relative date, prefix strips,
    // price/floors/bedrooms units, parking sentinel) only succeeds through
    // the NFC-at-ingest normalization — without it this row degrades to the
    // unparsed fallbacks, which the q15 oracle would catch.
    RawSiteListing(9L, nfd("hôm qua"),
      nfd("Đường Nguyễn Huệ, Phường Bến Thành, Quận 3, Hồ Chí Minh"),
      nfd("2,5 tỷ"), nfd("50 m²"), nfd("Kích thước: 5x10m"), "6m",
      nfd("2 lầu"), nfd("3 phòng ngủ"), nfd("Có")))

  def df(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.createDataset(rows).toDF()
  }
}
