package graft.model

import org.apache.spark.sql.types._

/** Typed form of the one entity in the reference's data model: the
  * real-estate listing record (reference: crawler/alonhadat.py:177-193;
  * SURVEY.md §1.2). The wild `price` union (number | "Thỏa thuận" |
  * "Không rõ") is split into `price_billion_vnd` + `price_status`. */
case class Listing(
    post_date: java.sql.Date,
    duong_pho: String,
    phuong_xa: String,
    quan_huyen: String,
    thanh_pho: String,
    loai_bds: String,
    area: Option[Double],
    chieu_ngang: Option[Double],
    chieu_dai: Option[Double],
    duong_truoc_nha: Option[Double],
    so_tang: Option[Int],
    so_phong_ngu: Option[Int],
    cho_de_xe: Option[Boolean],
    price_billion_vnd: Option[Double],
    price_status: String,
    source: String)

object Listing {

  /** Wire schema: the shape that lands on Kafka / JSONL before typing
    * (reference: kafka_cc/consumer/kafka_to_hdfs_consumer.py:98). Numeric-ish
    * fields arrive as strings (the reference never casts them,
    * alonhadat.py:185-189), and `price` MUST be read as string because it is
    * a union type in the wild (SURVEY.md §1.2). Explicit schema — inference
    * is never on the hot path (SURVEY.md §1.3). */
  val RawSchema: StructType = StructType(Seq(
    StructField("post_date", StringType),
    StructField("duong_pho", StringType),
    StructField("phuong_xa", StringType),
    StructField("quan_huyen", StringType),
    StructField("thanh_pho", StringType),
    StructField("loai_bds", StringType),
    StructField("area", DoubleType),
    StructField("chieu_ngang", StringType),
    StructField("chieu_dai", StringType),
    StructField("duong_truoc_nha", StringType),
    StructField("so_tang", StringType),
    StructField("so_phong_ngu", StringType),
    StructField("cho_de_xe", StringType),
    StructField("price", StringType),
    StructField("source", StringType)))

  /** Typed schema of the normalized listing table. */
  val Schema: StructType = StructType(Seq(
    StructField("post_date", DateType),
    StructField("duong_pho", StringType),
    StructField("phuong_xa", StringType),
    StructField("quan_huyen", StringType),
    StructField("thanh_pho", StringType),
    StructField("loai_bds", StringType),
    StructField("area", DoubleType),
    StructField("chieu_ngang", DoubleType),
    StructField("chieu_dai", DoubleType),
    StructField("duong_truoc_nha", DoubleType),
    StructField("so_tang", IntegerType),
    StructField("so_phong_ngu", IntegerType),
    StructField("cho_de_xe", BooleanType),
    StructField("price_billion_vnd", DoubleType),
    StructField("price_status", StringType),
    StructField("source", StringType)))
}

/** Pre-normalization shape: the raw site text the crawler extracts per post
  * before any parsing (reference: crawler/alonhadat.py:102-176). Used by the
  * fixture corpus and the site-text normalization pass. */
case class RawSiteListing(
    id: Long,
    raw_post_date: String,
    raw_address: String,
    raw_price: String,
    raw_area: String,
    raw_dims: String,
    raw_road: String,
    raw_floors: String,
    raw_bedrooms: String,
    raw_parking: String)
