package graft.operators

import graft.functions.UnicodeNormalize
import graft.readstat.SparkTestBase
import org.apache.spark.sql.functions._

/** UnicodeNormalize expression + the normalization/ngram/overlap query
  * shapes added with it. Unicode fixtures are built from explicit
  * escapes so nothing in the edit chain can silently re-normalize them.
  */
class TextNormalizeSpec extends SparkTestBase {

  import spark.implicits._

  private val decomposed = "Cafe\u0301 nai\u0308ve" // combining acute / diaeresis
  private val composed = "Caf\u00e9 na\u00efve"

  test("NFC composes combining sequences and is identity on normalized text") {
    val angstrom = "\u212b" // angstrom sign
    val df = Seq(decomposed, composed, "plain ascii", angstrom)
      .toDF("s")
      .select(UnicodeNormalize(col("s"), "NFC").as("n"), col("s"))
    val rows = df.collect().map(r => (r.getString(1), r.getString(0))).toMap
    assert(rows(decomposed) == composed)
    assert(rows(composed) == composed)
    assert(rows("plain ascii") == "plain ascii")
    assert(rows(angstrom) == "\u00c5") // angstrom sign -> A with ring
  }

  test("NFKC folds compatibility forms that NFC preserves") {
    val s = "\ufb01le \u2460" // fi-ligature, circled one
    val df = Seq(s).toDF("s").select(
      UnicodeNormalize(col("s"), "NFC").as("nfc"),
      UnicodeNormalize(col("s"), "NFKC").as("nfkc"))
    val r = df.collect()(0)
    assert(r.getString(0) == s)        // NFC keeps ligature + circled digit
    assert(r.getString(1) == "file 1") // NFKC folds both
  }

  test("expression output matches java.text.Normalizer and propagates null") {
    val vals = Seq("é", "é", "", "åb̈c",
      "한국어", "ascii")
    val got = vals.toDF("s")
      .select(UnicodeNormalize(col("s"), "NFC")).collect().map(_.getString(0))
    val expect = vals.map(java.text.Normalizer.normalize(_, java.text.Normalizer.Form.NFC))
    assert(got.toSeq == expect)
    val n = Seq[Option[String]](None).toDF("s")
      .select(UnicodeNormalize(col("s"), "NFC")).collect()(0)
    assert(n.isNullAt(0))
  }

  test("canonically-equivalent spellings get the same canonical fingerprint") {
    val out = graft.queries.Text.normalize(spark, "/root/testdata/sf0.001")
    assert(out.count() > 0)
    val canon = (s: org.apache.spark.sql.Column) => trim(regexp_replace(
      regexp_replace(UnicodeNormalize(s, "NFC"), "[\\p{Cc}\\p{Cf}]", " "),
      "\\s+", " "))
    // same text: decomposed accents + double space + trailing zero-width
    // joiner (a Cf char) vs composed single-spaced
    val two = Seq(s"$decomposed  du monde\u200d", s"$composed du monde")
      .toDF("s").select(md5(canon(col("s"))).as("fp")).distinct().count()
    assert(two == 1L)
  }

  test("ngram topk excludes docs under 3 tokens and orders deterministically") {
    val rows = graft.queries.Text.ngramTopk(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    val pairs = rows.map(r => (r.getLong(1), r.getString(0)))
    pairs.sliding(2).foreach {
      case Array((c1, g1), (c2, g2)) =>
        assert(c1 > c2 || (c1 == c2 && g1 < g2))
      case _ =>
    }
  }

  test("source overlap covers every pair once with exact jaccard") {
    val sf = "/root/testdata/sf0.001"
    val rows = graft.queries.Text.sourceOverlap(spark, sf).collect()
    // +1: the query plants a pseudo-source to make overlap nonzero
    val nSrc = graft.queries.Tables.documents(spark, sf)
      .select("source").distinct().count() + 1
    assert(rows.length == nSrc * (nSrc - 1) / 2)
    rows.foreach { r =>
      val (na, nb, sh) = (r.getLong(2), r.getLong(3), r.getLong(4))
      val j = r.getDouble(5)
      assert(sh <= math.min(na, nb))
      assert(math.abs(j - sh.toDouble / (na + nb - sh)) < 1e-6)
    }
    // the planted source duplicates real docs, so SOME pair must share
    // content — this is what catches a silently-eliminated self-join
    assert(rows.exists(_.getLong(4) > 0), "no pair shares any content")
  }

  test("source overlap counts an engineered intersection exactly") {
    import spark.implicits._
    val df = Seq(
      ("a", "x x"), ("a", "y"), ("a", "z"),
      ("b", "x  x"), ("b", "y"), ("b", "q"),   // x/y shared with a (ws-normalized)
      ("c", "only c")
    ).toDF("source", "text")
    val got = TextCuration.sourceOverlap(df, "source", "text").collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got(("a", "b")) == ((3L, 3L, 2L, 0.5)))      // 2 shared of 4 union
    assert(got(("a", "c")) == ((3L, 1L, 0L, 0.0)))
    assert(got(("b", "c")) == ((3L, 1L, 0L, 0.0)))
  }
}
