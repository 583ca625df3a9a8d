package graft

import org.apache.spark.sql.functions._
import graft.analytics.{Privacy, Sampling}

/** q77 PII scrub + q78 Bloom decontamination. */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  test("PII scrub: detects and redacts emails, phones, URLs; leaves clean text alone") {
    val docs = Seq(
      (1L, "mail me at jane.doe+spam@sub.example.org today"),
      (2L, "call +1-555-0199 or 12-345-6789 now"),
      (3L, "see https://a.example.com/path?q=1 and http://b.example.org"),
      (4L, "no pii here just words and-dashes a.b"),
      (5L, "combo x@y.io +44-201-3344 http://z.dev end")).toDF("doc_id", "text")
    val got = Privacy.piiScrubOn(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(got(1L) == ((1L, 0L, 0L, "mail me at <EMAIL> today")))
    assert(got(2L)._2 == 2L)
    assert(got(2L)._4 == "call <PHONE> or <PHONE> now")
    assert(got(3L) == ((0L, 0L, 2L, "see <URL> and <URL>")))
    assert(got(4L) == ((0L, 0L, 0L, "no pii here just words and-dashes a.b")))
    assert(got(5L) == ((1L, 1L, 1L, "combo <EMAIL> <PHONE> <URL> end")))
  }

  test("q77: synthetic contact line gives every doc exactly one of each PII class") {
    val r = Privacy.piiScrub(spark, sf("sf0.001"))
    assert(r.filter($"n_emails" =!= 1 || $"n_phones" =!= 1 || $"n_urls" =!= 1).count() == 0)
    // redaction is complete: no residual matches in the scrubbed text
    val residual = r.filter(
      $"scrubbed".rlike(Privacy.EmailRe) ||
      $"scrubbed".rlike(Privacy.PhoneRe) ||
      $"scrubbed".rlike(Privacy.UrlRe)).count()
    assert(residual == 0, "scrubbed text must contain no remaining PII matches")
  }

  test("q78: Bloom flags a superset of the exact audit, bounded false positives, deterministic") {
    val d = sf("sf0.001")
    val row = Sampling.decontaminationBloom(spark, d).head()
    val exact = Sampling.decontamination(spark, d)
      .select($"train_id").distinct().count()
    assert(row.getAs[Long]("n_flagged_exact") == exact)
    assert(row.getAs[Boolean]("superset_ok"), "Bloom must never miss an exactly-flagged doc")
    assert(row.getAs[Boolean]("fp_bounded"), "Bloom over-flagging must stay within the bound")
    // fixed-seed hashing: a second build gives the identical verdict row
    assert(Sampling.decontaminationBloom(spark, d).head() == row)
  }
}
