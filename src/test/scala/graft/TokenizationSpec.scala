package graft

import org.apache.spark.sql.functions._
import graft.analytics.TextStats
import graft.functions.Sketches

/** The engine-wide tokenization contract: tokens are maximal `\S+` runs,
  * one definition shared by the column expression (TextStats.tokens), the
  * codegen'd shingle kernels (Sketches.wsTokens), and the DuckDB oracles
  * (`regexp_extract_all(text, '\S+')`). These cases pin the whitespace
  * behaviors the round-3 advisory flagged as silently divergent: leading/
  * trailing whitespace, tabs and newlines, repeated separators, blank text,
  * and the below-n-token shingle fallback.
  */
class TokenizationSpec extends SparkSpec {
  import spark.implicits._

  private val nasty = Seq(
    (0L, "a b c"),            // clean single-space
    (1L, "  a b c  "),        // leading/trailing spaces
    (2L, "\ta\tb\nc\r\n"),    // tabs, newline, CRLF
    (3L, "a   b \t\n c"),     // repeated mixed separators
    (4L, ""),                 // empty
    (5L, " \t \n "),          // whitespace-only
    (6L, "solo"),             // below-n fallback, 1 token
    (7L, "  solo  "))         // fallback must strip the whitespace

  test("tokens(): \\S+ runs — whitespace-invariant counts, blank text = 0 tokens") {
    val got = nasty.toDF("id", "t")
      .select($"id", size(TextStats.tokens($"t")).as("n"), TextStats.tokens($"t").as("toks"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getSeq[String](2))).toMap
    // docs 0-3 are the same token stream under every whitespace layout
    (0L to 3L).foreach { id =>
      assert(got(id)._1 == 3, s"doc $id: expected 3 tokens, got ${got(id)._1}")
      assert(got(id)._2 == Seq("a", "b", "c"), s"doc $id: ${got(id)._2}")
    }
    assert(got(4L)._1 == 0 && got(5L)._1 == 0, "blank text must yield ZERO tokens")
    assert(got(6L)._1 == 1 && got(7L)._1 == 1)
  }

  test("shingle kernels tokenize identically to tokens() on nasty whitespace") {
    val df = nasty.toDF("id", "t")
    // bigram shingles of docs 0-3 must be identical (whitespace-invariant)
    val sh = df.select($"id", Sketches.wordShingles($"t", 2).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    (0L to 3L).foreach(id => assert(sh(id) == Seq("a b", "b c"), s"doc $id: ${sh(id)}"))
    // below-n fallback is the whitespace-STRIPPED text (oracle: regexp_replace
    // '^\s+|\s+$'), never the raw text and never Java trim's control-char strip
    assert(sh(6L) == Seq("solo") && sh(7L) == Seq("solo"))
    assert(sh(4L) == Seq("") && sh(5L) == Seq(""), "blank text falls back to empty string")
    // non-distinct n-grams: empty below n (no fallback), same tokenizer
    val ng = df.select($"id", Sketches.wordNgramsAll($"t", 2).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    (0L to 3L).foreach(id => assert(ng(id) == Seq("a b", "b c"), s"doc $id: ${ng(id)}"))
    assert(ng(4L).isEmpty && ng(5L).isEmpty && ng(6L).isEmpty && ng(7L).isEmpty)
  }

  test("q169 surprisal: hand corpus bit-math exact; rare tokens raise the mean") {
    import spark.implicits._
    import graft.analytics.TextStats
    // corpus: "a" x12, "b" x3, "z" x1 → N = 16
    //   s(a) = len(bin(16 div 12)) - 1 = len("1") - 1 = 0 bits
    //   s(b) = len(bin(16 div 3))  - 1 = len("101") - 1 = 2 bits
    //   s(z) = len(bin(16 div 1))  - 1 = len("10000") - 1 = 4 bits
    val docs = Seq(
      (1L, "a a a a a a a a a a"),   // 10 a → mean 0
      (2L, "a a b b b"),             // 2·0 + 3·2 = 6 → 6e6 div 5 = 1200000
      (3L, "z")                      // 4 bits → 4000000
    ).toDF("doc_id", "text")
    val dir = "target/surprisal_docs"
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextStats.surprisalScore(spark, dir)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r(1L) == ((10L, 0L)), s"doc 1: ${r(1L)}")
    assert(r(2L) == ((5L, 1200000L)), s"doc 2: ${r(2L)}")
    assert(r(3L) == ((1L, 4000000L)), s"doc 3: ${r(3L)}")
  }

  test("q172 bigram surprisal: hand corpus conditional bit-math exact") {
    import spark.implicits._
    import graft.analytics.TextStats
    // bigram starts: a→· occurs 4× (3× a b, 1× a c), b→· occurs 2×
    //   s(a,b) = len(bin(4 div 3)) − 1 = 0   s(b,a) = len(bin(2 div 2)) − 1 = 0
    //   s(a,c) = len(bin(4 div 1)) − 1 = 2
    val docs = Seq(
      (1L, "a b a b a b"), // bigrams (a,b)×3 (b,a)×2 → mean 0
      (2L, "a c"),         // one rare transition → 2 bits
      (3L, "x")            // no bigram → absent
    ).toDF("doc_id", "text")
    val dir = "target/bigram_docs"
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextStats.bigramSurprisal(spark, dir)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r(1L) == ((5L, 0L)), s"doc 1: ${r(1L)}")
    assert(r(2L) == ((1L, 2000000L)), s"doc 2: ${r(2L)}")
    assert(!r.contains(3L), "single-token doc must have no bigram score")
  }

  test("q173 DSIR: target-rule docs score higher than the rest; zero-sum-ish sanity") {
    import graft.analytics.{QualityProbe, TextStats}
    val d = sf("sf0.01")
    // q173's target rule is exactly the q163 label rule (\S+ counts are
    // case-insensitive, so the lowered token list changes nothing)
    val labels = QualityProbe.features(Tables.documents(spark, d)
      .select(col("doc_id"), col("text")))
      .select(col("doc_id"), (col("y") === 1000000L).as("tgt"))
    val joined = TextStats.dsirScore(spark, d).join(labels, "doc_id").collect()
    assert(joined.nonEmpty)
    val (t, nt) = joined.partition(_.getAs[Boolean]("tgt"))
    assert(t.nonEmpty && nt.nonEmpty, "gate corpus must contain both classes")
    def mean(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(_.getAs[Long]("dsir_micro").toDouble).sum / rs.length
    assert(mean(t) > mean(nt),
      s"importance weighting must prefer target-like docs: ${mean(t)} vs ${mean(nt)}")
  }

  test("corpus filters are whitespace-layout-invariant (q65/q66 stats)") {
    // the same 60 tokens under clean and hostile whitespace layouts
    val body = ("the quick brown fox jumps over a lazy dog and " * 6).trim
    val hostile = "\t " + body.replace(" dog ", "\ndog\t").replace(" fox ", "  fox \r\n ") + " \n"
    val docs = Seq((0L, body), (1L, hostile)).toDF("doc_id", "text")
    val rep = TextStats.repetitionRatioOn(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(rep(0L) == rep(1L), s"rep_ratio must not see whitespace layout: ${rep(0L)} vs ${rep(1L)}")
    val gf = TextStats.gopherFilterOn(docs)
      .select($"doc_id", $"n_words", $"n_stopwords", $"rep_ratio", $"pass")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(gf(0L)._1 == gf(1L)._1 && gf(0L)._2 == gf(1L)._2 && gf(0L)._3 == gf(1L)._3,
      s"gopher counts must not see whitespace layout: ${gf(0L)} vs ${gf(1L)}")
    // mean_word_len differs only through the \s-class char count, which both
    // layouts strip entirely — so the verdict is identical too
    assert(gf(0L)._4 == gf(1L)._4)
  }
}
