package graft.operators

import graft.readstat.SparkTestBase

/** Property test for the span-flagging pipeline (round-6 verdict called
  * the span-merge window at Text.spanFlags the subtlest new code): on
  * random corpora with planted shared blocks, the full pipeline —
  * WinnowSpans selection (k-gram md5, w-window minimum, earliest on
  * tie, distinct positions) → cross-doc shared-fingerprint filter →
  * overlapping/adjacent span merge — must agree with an independent
  * brute-force oracle computed in plain Scala.
  */
class WinnowSpansPropertySpec extends SparkTestBase {

  private val K = 8
  private val W = 8 // must match Text.spanFlags's constants

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  /** Brute-force winnow picks: (fingerprint, 1-based char pos), distinct
    * positions, earliest gram wins hash ties inside each window. */
  private def picks(text: String): Seq[(String, Int)] = {
    val n = text.length
    if (n < K) return Nil
    val grams = (0 to n - K).map(i => md5hex(text.substring(i, i + K)))
    if (grams.length < W) return Nil
    val sel = scala.collection.mutable.TreeMap.empty[Int, String]
    for (s <- 0 to grams.length - W) {
      var best = s
      for (j <- s until s + W) if (grams(j) < grams(best)) best = j
      sel.getOrElseUpdate(best, grams(best))
    }
    sel.toSeq.map { case (p, h) => (h, p + 1) }
  }

  /** Merge sorted spans, bridging overlap AND adjacency (gap of 0). */
  private def merge(spans: Seq[(Int, Int)]): Seq[(Int, Int)] =
    spans.sorted.foldLeft(List.empty[(Int, Int)]) {
      case (acc, (s, e)) => acc match {
        case (ps, pe) :: rest if s <= pe + 1 => (ps, math.max(pe, e)) :: rest
        case _ => (s, e) :: acc
      }
    }.reverse

  test("spanFlags agrees with a brute-force winnow+merge oracle on random corpora") {
    import spark.implicits._
    for (seed <- Seq(11, 42, 1337)) {
      val rnd = new scala.util.Random(seed)
      // tiny alphabet (incl. a 2-byte char: char-based positions must
      // survive multibyte offsets) → natural cross-doc 8-gram collisions
      val alphabet = "abé "
      def randText(len: Int): String =
        (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val sharedBlock = randText(40)
      val docs: Seq[(Long, String)] = (0 until 12).map { i =>
        val base = randText(30 + rnd.nextInt(120))
        val text =
          if (i % 3 == 0) base + sharedBlock + randText(20)
          else if (i == 7) randText(5) // too short for any window
          else base
        (i.toLong, text)
      }

      // oracle: shared fingerprints (>1 distinct doc) → per-doc merged spans
      val perDoc = docs.map { case (id, t) => id -> picks(t) }.toMap
      val docsPerMh = perDoc.toSeq
        .flatMap { case (id, ps) => ps.map { case (h, _) => (h, id) } }
        .distinct.groupBy(_._1).map { case (h, xs) => h -> xs.size }
      val shared = docsPerMh.filter(_._2 > 1).keySet
      val want = docs.flatMap { case (id, t) =>
        val spans = merge(perDoc(id).collect {
          case (h, p) if shared(h) => (p, p + K - 1)
        })
        if (spans.isEmpty) None
        else {
          val dup = spans.map { case (s, e) => e - s + 1 }.sum
          Some(id -> ((spans.length.toLong, dup.toLong,
            BigDecimal(dup.toDouble / t.length)
              .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)))
        }
      }.toMap

      val dir = java.nio.file.Files.createTempDirectory(s"winnow_prop_$seed").toFile
      dir.deleteOnExit()
      docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
      val got = graft.queries.Text.spanFlags(spark, dir.getAbsolutePath)
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap

      assert(got.keySet == want.keySet,
        s"seed=$seed docs differ: got-only=${got.keySet.diff(want.keySet)} " +
          s"want-only=${want.keySet.diff(got.keySet)}")
      want.foreach { case (id, exp) =>
        assert(got(id) == exp, s"seed=$seed doc $id: got=${got(id)} want=$exp")
      }
      assert(want.nonEmpty, s"seed=$seed: oracle found no shared spans — " +
        "planted blocks failed, test is vacuous")
    }
  }
}
