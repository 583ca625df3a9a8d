package graft

import org.apache.spark.sql.Row
import graft.analytics.Views

/** Table-driven checks of the crawler normalization semantics (F1-F14,
  * SURVEY.md §2.6) over the fixture corpus — every parser branch of
  * reference crawler/alonhadat.py:18-193 is pinned here. */
class VnTextSpec extends SparkSpec {

  private lazy val byId: Map[Long, Row] = {
    val df = Views.fixtureListings(spark)
    df.collect().map(r => r.getAs[Long]("id") -> r).toMap
  }

  private def d(s: String) = java.sql.Date.valueOf(s)

  test("F1 relative dates anchor to as_of") {
    assert(byId(1).getAs[java.sql.Date]("post_date") == d("2025-04-24")) // Hôm nay
    assert(byId(2).getAs[java.sql.Date]("post_date") == d("2025-04-23")) // Hôm qua
    assert(byId(3).getAs[java.sql.Date]("post_date") == d("2025-04-24")) // explicit dd/MM/yyyy
    assert(byId(5).getAs[java.sql.Date]("post_date") == d("2024-01-01"))
    assert(byId(4).getAs[java.sql.Date]("post_date") == d("2025-04-24")) // garbage → as_of
    assert(byId(8).getAs[java.sql.Date]("post_date") == d("2025-04-24")) // 31/02 invalid → as_of
  }

  test("F2/F3 address split + prefix strip") {
    val r1 = byId(1)
    assert(r1.getAs[String]("duong_pho") == "Lê Lợi")
    assert(r1.getAs[String]("phuong_xa") == "Bến Nghé")
    assert(r1.getAs[String]("quan_huyen") == "1")
    assert(r1.getAs[String]("thanh_pho") == "Hồ Chí Minh")
    val r2 = byId(2)
    assert(r2.getAs[String]("duong_pho") == "Huế")      // Phố stripped
    assert(r2.getAs[String]("phuong_xa") == "Tân Triều") // Xã stripped
    assert(r2.getAs[String]("quan_huyen") == "Thanh Trì") // Huyện stripped
    // 2-part address → invalid, all null
    assert(byId(5).isNullAt(byId(5).fieldIndex("quan_huyen")))
    assert(byId(5).getAs[Boolean]("addr_valid") == false)
  }

  test("F4 price union: tỷ / triệu / negotiable / unknown") {
    assert(byId(1).getAs[Double]("price_billion_vnd") == 5.5) // comma decimal
    assert(byId(1).getAs[String]("price_status") == "ok")
    assert(byId(2).getAs[Double]("price_billion_vnd") == 0.85) // triệu / 1000
    assert(byId(8).getAs[Double]("price_billion_vnd") == 0.99)
    assert(byId(3).getAs[String]("price_status") == "negotiable")
    assert(byId(3).isNullAt(byId(3).fieldIndex("price_billion_vnd")))
    assert(byId(4).getAs[String]("price_status") == "unknown") // no unit match
    assert(byId(6).getAs[String]("price_status") == "unknown") // "2,,3 tỷ" unparsable
  }

  test("F5 area + F6 dimensions + --- sentinel") {
    assert(byId(1).getAs[Double]("area") == 80.0)
    assert(byId(2).getAs[Double]("area") == 45.5)
    assert(byId(4).getAs[Double]("area") == 120.75)
    assert(byId(3).isNullAt(byId(3).fieldIndex("area"))) // "---"
    assert(byId(2).getAs[Double]("chieu_ngang") == 4.5)
    assert(byId(2).getAs[Double]("chieu_dai") == 10.0)
    assert(byId(3).isNullAt(byId(3).fieldIndex("chieu_ngang"))) // "---"
    assert(byId(6).isNullAt(byId(6).fieldIndex("chieu_ngang"))) // single part → both null
    assert(byId(6).isNullAt(byId(6).fieldIndex("chieu_dai")))
  }

  test("F7-F10 road/floors/bedrooms/parking") {
    assert(byId(1).getAs[Double]("duong_truoc_nha") == 12.0)
    assert(byId(6).getAs[Double]("duong_truoc_nha") == 4.5) // comma decimal
    assert(byId(1).getAs[Int]("so_tang") == 3)
    assert(byId(6).isNullAt(byId(6).fieldIndex("so_tang"))) // "năm lầu" non-numeric
    assert(byId(1).getAs[Int]("so_phong_ngu") == 4)
    assert(byId(6).getAs[Int]("so_phong_ngu") == 0)
    assert(byId(1).getAs[Boolean]("cho_de_xe") == true)
    assert(byId(6).getAs[Boolean]("cho_de_xe") == false) // non-"Có"
    assert(byId(2).isNullAt(byId(2).fieldIndex("cho_de_xe")))
  }

  test("NFC-at-ingest: NFD-encoded row parses identically to composed input") {
    // row 9 is built with ListingFixtures.nfd — every Vietnamese match below
    // fails without the nfc() normalization in Normalize.fromSiteText
    val r9 = byId(9)
    assert(r9.getAs[java.sql.Date]("post_date") == d("2025-04-23")) // NFD "hôm qua"
    assert(r9.getAs[String]("duong_pho") == "Nguyễn Huệ")   // prefix stripped, output NFC
    assert(r9.getAs[String]("phuong_xa") == "Bến Thành")
    assert(r9.getAs[String]("quan_huyen") == "3")
    assert(r9.getAs[String]("thanh_pho") == "Hồ Chí Minh")
    assert(r9.getAs[Double]("price_billion_vnd") == 2.5)    // NFD "tỷ" unit
    assert(r9.getAs[String]("price_status") == "ok")
    assert(r9.getAs[Double]("area") == 50.0)
    assert(r9.getAs[Double]("chieu_ngang") == 5.0)          // NFD "Kích thước:"
    assert(r9.getAs[Double]("chieu_dai") == 10.0)
    assert(r9.getAs[Int]("so_tang") == 2)                   // NFD " lầu"
    assert(r9.getAs[Int]("so_phong_ngu") == 3)              // NFD " phòng ngủ"
    assert(r9.getAs[Boolean]("cho_de_xe") == true)          // NFD "Có"
  }

  test("totality: all-null input row survives with nulls, constants filled") {
    val r7 = byId(7)
    assert(r7.getAs[String]("price_status") == "unknown")
    assert(r7.getAs[String]("loai_bds") == "Nhà đất")
    assert(r7.getAs[String]("source") == "alonhadat")
    assert(r7.getAs[java.sql.Date]("post_date") == d("2025-04-24"))
    Seq("duong_pho", "quan_huyen", "area", "chieu_ngang", "so_tang", "cho_de_xe",
      "price_billion_vnd", "addr_valid").foreach(c => assert(r7.isNullAt(r7.fieldIndex(c)), c))
  }

  test("district views over fixtures") {
    val counts = Views.districtCounts(Views.fixtureListings(spark))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("1" -> 1, "Thanh Trì" -> 1, "Gò Vấp" -> 1, "C" -> 1,
      "Hà Đông" -> 1, "Tân Bình" -> 1, "3" -> 1))
  }
}
