package graft.operators

import graft.readstat.SparkTestBase
import org.apache.spark.sql.functions._

/** Engineered-corpus checks for the vocabulary-coverage and exact-N
  * sampling queries, pinned against local replays written here.
  */
class OovFixedNSpec extends SparkTestBase {

  import spark.implicits._

  private def docsDir(docs: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("oov_spec").toFile
    dir.deleteOnExit()
    docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    dir.getAbsolutePath
  }

  test("oov rate scores a doc of unseen words as fully OOV") {
    // "common" appears everywhere (in vocab); rare-xyz words appear once
    // each — with vocab cap 1000 unreachable here, craft a corpus whose
    // frequent words dominate: 'the'/'cat' frequent, doc 4 is all junk
    // that still lands in the top-1000 (corpus has < 1000 distinct
    // words), so force OOV by exceeding the cap with generated nonsense
    val filler = (0 until 1200).map(i => s"w$i w$i").mkString(" ") // 1200 distinct, freq 2 each
    val docs: Seq[(Long, String)] = Seq(
      1L -> "the the the cat cat sat",
      2L -> "the cat",
      3L -> filler)
    val got = graft.queries.Curation.oovRate(spark, docsDir(docs))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // local replay
    val tokens = docs.flatMap { case (id, t) =>
      t.trim.split("\\s+").map(w => (id, w.toLowerCase)) }
    val vocab = tokens.groupBy(_._2).map { case (w, g) => (w, g.size) }
      .toSeq.sortBy { case (w, c) => (-c, w) }.take(1000).map(_._1).toSet
    val want = tokens.groupBy(_._1).map { case (id, ts) =>
      val oov = ts.count(t => !vocab.contains(t._2))
      id -> ((ts.size.toLong, oov.toLong,
        BigDecimal(oov.toDouble / ts.size)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    assert(got == want)
    // the cap binds: some words are OOV somewhere, and the high-frequency
    // words ('the', freq 4; 'cat', freq 3) always make the vocab
    assert(got.values.map(_._2).sum > 0, "vocab cap never bound — vacuous")
    // 'the' (freq 4) and 'cat' (freq 3) always make the vocab; 'sat'
    // (freq 1) loses the cap to the freq-2 filler words
    assert(got(1L) == ((6L, 1L, 0.1667)))
    assert(got(2L)._2 == 0, "doc of top-frequency words must have zero OOV")
  }

  test("fixed-n sample is exactly N, deterministic, and md5-ranked") {
    val docs = (1L to 300L).map(i => (i, s"doc $i"))
    val dir = docsDir(docs)
    val got = graft.queries.Curation.fixedNSample(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.length == 100)
    // local replay of the md5 ranking
    val want = docs.map { case (id, _) =>
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(s"fixn:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      (id, key)
    }.sortBy(_._2).take(100)
    assert(got.sortBy(_._2).toSeq == want)
    // a second run picks the identical sample
    val again = graft.queries.Curation.fixedNSample(spark, dir)
      .collect().map(r => r.getLong(0)).toSet
    assert(again == got.map(_._1).toSet)
  }
}
