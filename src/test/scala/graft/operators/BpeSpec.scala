package graft.operators

import graft.readstat.SparkTestBase
import org.apache.spark.sql.functions._

/** BPE training + encoding. The ground truth is an INDEPENDENT naive
  * implementation written here in the test (straight from the Sennrich
  * algorithm description), so an implementation bug shared between the
  * local and distributed paths cannot self-validate.
  */
class BpeSpec extends SparkTestBase {

  import spark.implicits._

  // ---- independent reference implementation ----
  private def naiveTrain(words: Seq[String], numMerges: Int,
      minFreq: Long): Seq[(String, String)] = {
    val freq = words.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    var syms: Map[List[String], Long] =
      freq.map { case (w, f) => w.map(_.toString).toList -> f }.toMap
    val out = Seq.newBuilder[(String, String)]
    var rounds = 0
    var stop = false
    while (rounds < numMerges && !stop) {
      val counts = collection.mutable.Map[(String, String), Long]()
      syms.foreach { case (s, f) =>
        s.zip(s.drop(1)).foreach(p => counts(p) = counts.getOrElse(p, 0L) + f)
      }
      val eligible = counts.filter(_._2 >= minFreq)
      if (eligible.isEmpty) stop = true
      else {
        // max count, tie-break lexicographically smallest pair
        val best = eligible.toSeq.minBy { case ((a, b), n) => (-n, a, b) }._1
        out += best
        def mergeList(s: List[String]): List[String] = s match {
          case a :: b :: rest if (a, b) == best => (a + b) :: mergeList(rest)
          case a :: rest => a :: mergeList(rest)
          case Nil => Nil
        }
        syms = syms.map { case (s, f) => mergeList(s) -> f }
          .groupBy(_._1).map { case (k, g) => k -> g.values.sum }
        rounds += 1
      }
    }
    out.result()
  }

  private def naiveEncode(word: String, merges: Seq[(String, String)]): Seq[String] = {
    val rank = merges.zipWithIndex.toMap
    var syms = word.map(_.toString).toList
    var done = syms.size < 2
    while (!done) {
      val present = syms.zip(syms.drop(1)).flatMap(p => rank.get(p).map(p -> _))
      if (present.isEmpty) done = true
      else {
        val best = present.minBy(_._2)._1
        def mergeList(s: List[String]): List[String] = s match {
          case a :: b :: rest if (a, b) == best => (a + b) :: mergeList(rest)
          case a :: rest => a :: mergeList(rest)
          case Nil => Nil
        }
        syms = mergeList(syms)
        done = syms.size < 2
      }
    }
    syms
  }

  private val corpus = Seq(
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "widest widest widest",
    "x")

  private def corpusDf = corpus.toDF("text")

  private def corpusWords: Seq[String] =
    corpus.flatMap(_.split("\\s+")).filter(_.nonEmpty)

  test("local training matches the independent naive implementation") {
    val got = Bpe.train(corpusDf, "text", numMerges = 12)
    val expect = naiveTrain(corpusWords, 12, 2L)
    assert(got.map(m => (m.left, m.right)) == expect)
    assert(got.map(_.rank) == got.indices.toSeq)
    // sanity against the textbook example: 'es' then 'est' arise early
    val pairs = got.map(m => m.left + m.right)
    assert(pairs.contains("es") && pairs.contains("est"))
  }

  test("distributed training path produces the identical merge list") {
    // diff-based cache check: other suites may hold caches concurrently
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val viaLocal = Bpe.train(corpusDf, "text", numMerges = 12)
    val viaDist = Bpe.train(corpusDf, "text", numMerges = 12,
      localVocabLimit = 0L) // force the distributed rounds
    assert(viaDist.map(m => (m.left, m.right)) ==
      viaLocal.map(m => (m.left, m.right)))
    // per-round caches must not leak (Graph-iteration hygiene)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"Bpe.train leaked cached RDDs: $leaked")
  }

  test("encoding matches the naive encoder on training and novel words") {
    val merges = Bpe.train(corpusDf, "text", numMerges = 12)
    val mergePairs = merges.map(m => (m.left, m.right))
    val novel = Seq("lowest", "newer", "wide", "unseen", "a")
    val df = (corpusWords.distinct ++ novel).toDF("w")
      .select(col("w"), Bpe.encodeTokens(col("w"), merges).as("toks"))
    df.collect().foreach { r =>
      val w = r.getString(0)
      assert(r.getSeq[String](1) == naiveEncode(w, mergePairs),
        s"mismatch for '$w'")
    }
  }

  test("encoder handles multi-word text, extra whitespace, and nulls") {
    val merges = Bpe.train(corpusDf, "text", numMerges = 12)
    val rows = Seq(Some("  low   newest "), Some(""), None)
      .toDF("text")
      .select(Bpe.encodeTokens(col("text"), merges).as("toks"))
      .collect()
    val expect = naiveEncode("low", merges.map(m => (m.left, m.right))) ++
      naiveEncode("newest", merges.map(m => (m.left, m.right)))
    assert(rows(0).getSeq[String](0) == expect)
    assert(rows(1).getSeq[String](0).isEmpty)
    assert(rows(2).isNullAt(0))
  }

  test("empty corpus and single-word corpora train without error") {
    assert(Bpe.train(Seq.empty[String].toDF("text"), "text", 5).isEmpty)
    assert(Bpe.train(Seq("x x x").toDF("text"), "text", 5).isEmpty) // 1-char word: no pairs
    val one = Bpe.train(Seq("ab ab ab").toDF("text"), "text", 5)
    assert(one.map(m => (m.left, m.right)) == Seq(("a", "b")))
  }

  test("a few hundred merges: local and distributed agree, caches stay clean") {
    // 300 rounds crosses the distributed path's checkpoint boundary
    // multiple times, so this also pins the re-rooted/checkpointed
    // frames against both result drift and cache leaks. The testdata
    // documents table has only 31 distinct words and collapses after
    // ~89 merges, so the vocabulary is the DevBpeScale generator's
    // (shared with the repro tool so they cannot drift apart).
    val docs = graft.tools.DevBpeScale.syntheticDocs.toDF("text")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    // minPairFreq=1: every word is distinct, so no pair reaches 2
    val local = Bpe.train(docs, "text", numMerges = 300, minPairFreq = 1L)
    assert(local.size >= 250, s"corpus too poor for the test: ${local.size} merges")
    val dist = Bpe.train(docs, "text", numMerges = 300, minPairFreq = 1L,
      localVocabLimit = 0L)
    assert(dist.map(m => (m.left, m.right)) == local.map(m => (m.left, m.right)))
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"Bpe.train leaked cached RDDs: $leaked")
  }

  test("surrogate-pair code points survive both paths intact") {
    val emoji = new String(Character.toChars(0x1F600)) // astral code point
    val df = Seq(s"$emoji$emoji a$emoji a$emoji").toDF("text")
    val local = Bpe.train(df, "text", 4)
    val dist = Bpe.train(df, "text", 4, localVocabLimit = 0L)
    assert(local.map(m => (m.left, m.right)) == dist.map(m => (m.left, m.right)))
    assert(local.nonEmpty)
    // "a"+emoji occurs twice -> must be a learned merge with the FULL
    // surrogate pair, never a lone surrogate half
    assert(local.exists(m => m.left == "a" && m.right == emoji))
    assert(local.forall(m => !m.left.exists(Character.isSurrogate) ||
      m.left.codePoints().count() * 2 == m.left.length))
  }
}
