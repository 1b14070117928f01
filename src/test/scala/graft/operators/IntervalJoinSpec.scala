package graft.operators

import graft.readstat.SparkTestBase
import org.apache.spark.sql.functions._

/** Interval-overlap join: parity with the naive nested-loop join,
  * exactly-once emission across bucket widths, closed-endpoint
  * semantics. */
class IntervalJoinSpec extends SparkTestBase {

  import spark.implicits._

  // deterministic pseudo-random intervals, several spanning many buckets
  private def mkIntervals(n: Int, seed: Int, maxLen: Long): Seq[(Long, Long, Long)] =
    (0 until n).map { i =>
      val h = (i.toLong * 2654435761L + seed) & 0x7fffffffL
      val start = h % 100000L
      val len = (h / 7) % maxLen
      (i.toLong + seed * 100000L, start, start + len)
    }

  private def naive(
      l: Seq[(Long, Long, Long)], r: Seq[(Long, Long, Long)]): Set[(Long, Long)] =
    (for {
      (lid, a0, a1) <- l
      (rid, b0, b1) <- r
      if a0 <= b1 && b0 <= a1
    } yield (lid, rid)).toSet

  test("parity with nested-loop overlap, exactly-once per pair") {
    val ls = mkIntervals(300, 1, maxLen = 9000)  // spans up to 9 buckets
    val rs = mkIntervals(200, 2, maxLen = 500)
    val lDf = ls.toDF("lid", "a0", "a1").repartition(5)
    val rDf = rs.toDF("rid", "b0", "b1").repartition(3)
    for (width <- Seq(100L, 1000L, 50000L)) {
      val got = IntervalJoin.overlap(lDf, rDf, "a0", "a1", "b0", "b1", width)
        .select("lid", "rid").as[(Long, Long)].collect().toSeq
      assert(got.size == got.distinct.size,
        s"width $width emitted duplicates")
      assert(got.toSet == naive(ls, rs), s"width $width pair set differs")
    }
  }

  test("endpoints are inclusive: touching intervals match") {
    val l = Seq((1L, 0L, 10L)).toDF("lid", "a0", "a1")
    val r = Seq((2L, 10L, 20L), (3L, 11L, 20L)).toDF("rid", "b0", "b1")
    val got = IntervalJoin.overlap(l, r, "a0", "a1", "b0", "b1", 7L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
  }

  test("point intervals (start == end) behave like points") {
    val l = Seq((1L, 5L, 5L), (2L, 6L, 6L)).toDF("lid", "a0", "a1")
    val r = Seq((9L, 5L, 5L)).toDF("rid", "b0", "b1")
    val got = IntervalJoin.overlap(l, r, "a0", "a1", "b0", "b1", 3L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 9L)))
  }
}
