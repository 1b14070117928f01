package graft.operators

import graft.readstat.SparkTestBase
import org.apache.spark.sql.functions._

/** Engineered-corpus checks for the three curation queries added
  * together: context-window chunking, sorted-neighborhood near-dup, and
  * k-NN majority-vote classification. Each is pinned against a local
  * reference implementation written here, independent of the query code.
  */
class ChunkNeighborKnnSpec extends SparkTestBase {

  import spark.implicits._

  private val Win = 200
  private val Stride = 150

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Local reference chunker: starts at 0, Stride, ...; always >= 1 chunk. */
  private def refChunks(text: String): Seq[String] = {
    val extra = math.max(0,
      math.ceil((text.length - Win).toDouble / Stride).toInt)
    (0 to extra).map(i => text.slice(i * Stride, i * Stride + Win))
  }

  private def docsDir(docs: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("chunk_spec").toFile
    dir.deleteOnExit()
    docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    dir.getAbsolutePath
  }

  test("chunk windows match a local chunker across boundary lengths") {
    // lengths straddling every boundary: empty, < win, == win, win+1,
    // == win+stride (2 full), win+stride+1 (3rd chunk of 1 char), long
    val texts = Seq(0, 1, Win - 1, Win, Win + 1, Win + Stride,
      Win + Stride + 1, 1000, 1001)
      .zipWithIndex.map { case (n, i) => ((i + 1).toLong, ("ab" * n).take(n)) }
    val got = graft.queries.Text.chunkWindows(spark, docsDir(texts))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getInt(2), r.getString(3))))
      .toMap
    val want = texts.flatMap { case (id, t) =>
      refChunks(t).zipWithIndex.map { case (c, i) =>
        (id, i) -> ((c.length, md5hex(c)))
      }
    }.toMap
    assert(got == want)
    // overlap property: adjacent full chunks share win - stride chars
    val t = texts.last._2
    val ch = refChunks(t)
    ch.sliding(2).filter(_.last.length == Win).foreach { p =>
      assert(p.head.takeRight(Win - Stride) == p.last.take(Win - Stride))
    }
  }

  private def refLevenshtein(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("sorted neighbors adjacency finds the planted near-dup pair") {
    // two docs that differ by one word sort adjacent; the rest are far
    val docs: Seq[(Long, String)] = Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the quick brown fox jumps over the lazy cat",
      3L -> ("zebra stripes pattern " + ("x" * 200)),
      4L -> "completely different content about databases",
      5L -> "Mixed   CASE and    extra whitespace here")
    val rows = graft.queries.Text.sortedNeighbors(spark, docsDir(docs))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3),
        r.getInt(4)))
    assert(rows.length == docs.length - 1)
    assert(rows.map(_._1).toSeq == (0L until 4L)) // contiguous positions
    // local replay: sort by (capped normalized key, id), pair adjacent
    val keyed = docs.map { case (id, t) =>
      (id, t.trim.replaceAll("\\s+", " ").toLowerCase.take(100))
    }.sortBy(p => (p._2, p._1))
    val want = keyed.sliding(2).zipWithIndex.map { case (Seq(a, b), p) =>
      val dist = refLevenshtein(a._2, b._2)
      (p.toLong, a._1, b._1, dist, if (dist <= 20) 1 else 0)
    }.toSeq
    assert(rows.toSeq == want)
    // the planted pair is adjacent with distance 3 (cat sorts before dog)
    assert(rows.exists(r => r._2 == 2L && r._3 == 1L && r._4 == 3 && r._5 == 1))
    // far docs are not flagged
    assert(rows.count(_._5 == 1) == 1)
  }

  test("knn classification predicts the planted cluster labels") {
    // label 0 clusters near +e0, label 1 near +e1; queries 0..19 are
    // noiseless cluster members, corpus 20.. carries small deterministic
    // jitter in a third dimension so ranks are unambiguous
    val dim = 64
    def vec(axis: Int, jitter: Float): Array[Float] = {
      val a = Array.fill(dim)(0.0f)
      a(axis) = 1.0f
      a(2) = jitter
      a
    }
    val queries = (0L until 20L).map(i => (i, vec((i % 2).toInt, 0.0f),
      (i % 2).toInt))
    val corpus = (20L until 120L).map { i =>
      val label = (i % 2).toInt
      (i, vec(label, 0.001f * (i % 7)), label)
    }
    val dir = java.nio.file.Files.createTempDirectory("knn_spec").toFile
    dir.deleteOnExit()
    (queries ++ corpus).toDF("vec_id", "embedding", "label")
      .withColumn("label", col("label").cast("int"))
      .write.parquet(s"$dir/embeddings.parquet")
    val rows = graft.queries.Similarity.knnClassify(spark, dir.getAbsolutePath)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getInt(4)))
    assert(rows.length == 20)
    rows.foreach { case (qid, trueLabel, pred, votes, correct) =>
      assert(trueLabel == (qid % 2).toInt)
      assert(pred == trueLabel, s"query $qid predicted $pred")
      assert(votes == 10L) // all 10 neighbors come from the same cluster
      assert(correct == 1)
    }
  }
}
