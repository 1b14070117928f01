package graft.operators

import graft.readstat.SparkTestBase
import org.apache.spark.sql.functions._

/** Z-order curve: interleave correctness vs a reference implementation,
  * and the locality property that justifies the layout — after a z-sort,
  * chunk-level min/max ranges are narrow in BOTH keys, where a
  * lexicographic sort clusters only its leading key. */
class ZOrderSpec extends SparkTestBase {

  import spark.implicits._

  private def refInterleave(a: Long, b: Long): Long =
    (0 until 16).map(i =>
      (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))).reduce(_ | _)

  test("interleave16 matches the reference bit implementation") {
    val samples = Seq((0L, 0L), (65535L, 0L), (0L, 65535L), (65535L, 65535L),
      (1L, 2L), (43690L, 21845L), (12345L, 54321L))
    val got = samples.toDF("a", "b")
      .select(ZOrder.interleave16(col("a"), col("b")).as("z"))
      .as[Long].collect()
    assert(got.toSeq == samples.map { case (a, b) => refInterleave(a, b) })
    // the two extremes bound the 32-bit space
    assert(refInterleave(65535L, 65535L) == 0xFFFFFFFFL)
  }

  test("z-sort clusters both keys; lexicographic sort only the first") {
    // deterministic grid-ish data: two independent keys
    val rows = (0 until 20000).map { i =>
      val a = (i * 2654435761L) % 1000L
      val b = (i * 40503L + 7) % 1000L
      (a, b)
    }
    val df = rows.toDF("ka", "kb")
    val z = ZOrder.withZval(df, "ka", "kb")

    def chunkRanges(ordered: Seq[(Long, Long)], chunks: Int): (Double, Double) = {
      val size = ordered.size / chunks
      val groups = ordered.grouped(size).toSeq.filter(_.size > 1)
      def avgRange(sel: ((Long, Long)) => Long): Double =
        groups.map(g => (g.map(sel).max - g.map(sel).min).toDouble)
          .sum / groups.size
      (avgRange(_._1) / 1000.0, avgRange(_._2) / 1000.0)
    }

    val zOrdered = z.orderBy("zval").select("ka", "kb")
      .as[(Long, Long)].collect().toSeq
    val lexOrdered = rows.sortBy(identity)
    val (zA, zB) = chunkRanges(zOrdered, 32)
    val (lxA, lxB) = chunkRanges(lexOrdered, 32)

    // z-sort: both dimensions tight (each chunk a small z-range square)
    assert(zA < 0.35 && zB < 0.35, f"z-chunk ranges a=$zA%.2f b=$zB%.2f")
    // lexicographic: first key extremely tight, second key unclustered
    assert(lxA < 0.1, f"lex leading-key range $lxA%.2f")
    assert(lxB > 0.8, f"lex second-key range $lxB%.2f — data accidentally correlated?")
    assert(zB < lxB / 2, "z-order must beat lexicographic on the second key")
  }
}
