package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.expr.VnText
import graft.functions.Sketches

/** Property tests for the totality contract (SURVEY.md §5.3): normalization
  * never throws on arbitrary strings — it mirrors the reference's bare
  * try/except → None behavior (alonhadat.py:137 etc.) — and the sketch
  * kernels are total and deterministic. Driven through the engine (one
  * DataFrame per batch of generated inputs), not function-local calls. */
class PropertySpec extends SparkSpec {

  /** Deterministic sampler (no scalatestplus bridge in the offline cache). */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))
  import spark.implicits._

  private val weird = Gen.oneOf(
    Gen.alphaNumStr,
    Gen.asciiPrintableStr,
    Gen.oneOf("", " ", "---", "x", "tỷ", "1,2,3 tỷ", ",", ".", "1.2.3", "m", "xm",
      "Kích thước:", "hôm nay hôm qua", "99/99/9999", "\t", "Quận", " , , , "),
    Gen.listOfN(8, Gen.oneOf("1", ",", ".", "tỷ", "triệu", "m", "x", " ", "lầu"))
      .map(_.mkString))

  test("normalization is total: never throws, on any input batch") {
    samples(Gen.listOfN(40, weird), 10).foreach { inputs =>
      val df = inputs.toDF("raw")
      val out = df.select(
        VnText.parsePostDate($"raw", to_date(lit("2025-04-24"))).as("d"),
        VnText.street($"raw").as("st"),
        VnText.district($"raw").as("di"),
        VnText.priceBillionVnd($"raw").as("p"),
        VnText.priceStatus($"raw").as("ps"),
        VnText.areaM2($"raw").as("a"),
        VnText.dimWidth($"raw").as("w"),
        VnText.dimLength($"raw").as("l"),
        VnText.roadWidth($"raw").as("r"),
        VnText.floors($"raw").as("f"),
        VnText.bedrooms($"raw").as("b"),
        VnText.parking($"raw").as("pk"))
      val rows = out.collect()
      assert(rows.length == inputs.length)
      // status is always one of the three sentinels; date never null
      rows.foreach { r =>
        assert(Set("ok", "negotiable", "unknown").contains(r.getAs[String]("ps")))
        assert(!r.isNullAt(r.fieldIndex("d")))
      }
    }
  }

  test("sketch kernels are total and deterministic on arbitrary text") {
    samples(Gen.listOfN(30, weird), 10).foreach { inputs =>
      val df = inputs.toDF("t")
      val sel = df.select(
        Sketches.wordShingles($"t").as("sh"),
        Sketches.simhash64(Sketches.wordShingles($"t")).as("sim"),
        Sketches.minhashSignature(Sketches.wordShingles($"t")).as("mh"))
      val a = sel.collect()
      val b = sel.collect()
      assert(a.map(_.getLong(1)).toSeq == b.map(_.getLong(1)).toSeq)
      a.foreach { r =>
        assert(r.getSeq[String](0).nonEmpty)
        assert(r.getSeq[Long](2).size == 64)
      }
    }
  }

  test("aggregation invariance under repartitioning (A1 contract)") {
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy($"l_returnflag").agg(count(lit(1)).as("n"), round(sum($"l_quantity"), 2).as("q"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    val base = agg(li)
    assert(agg(li.repartition(17)) == base)
    assert(agg(li.repartition(1)) == base)
    assert(agg(li.repartition(64, $"l_orderkey")) == base)
  }

  test("wire round-trip: to_json then parse recovers the record") {
    val json = Seq(
      ("""{"post_date":"2025-04-20","duong_pho":"Lê Lợi","quan_huyen":"Gò Vấp",""" +
        """"thanh_pho":"HCM","area":80.5,"price":"1.5","source":"alonhadat"}"""))
      .toDF("value")
    val parsed = graft.streaming.IngestStream.flatten(
      json.select(graft.streaming.IngestStream.parseWire($"value")))
    val back = parsed.select(to_json(struct(parsed.columns.map(col): _*)).as("j"))
      .select(graft.streaming.IngestStream.parseWire($"j"))
    val r = graft.streaming.IngestStream.flatten(back).head()
    assert(r.getAs[String]("quan_huyen") == "Gò Vấp")
    assert(r.getAs[Double]("area") == 80.5)
    assert(r.getAs[String]("price") == "1.5")
  }
}
