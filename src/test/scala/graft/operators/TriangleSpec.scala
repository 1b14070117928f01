package graft.operators

import graft.readstat.SparkTestBase
import org.apache.spark.sql.functions._

/** Triangle enumeration: exact triples on known graphs, parity with a
  * naive three-way join under hub skew, input canonicalization. */
class TriangleSpec extends SparkTestBase {

  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]): Set[(Long, Long, Long)] =
    Graph.triangles(edges.toDF("u", "v").repartition(4), "u", "v")
      .as[(Long, Long, Long)].collect().toSet

  private def naive(edges: Seq[(Long, Long)]): Set[(Long, Long, Long)] = {
    val e = edges.filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val nodes = e.flatMap { case (a, b) => Seq(a, b) }.toSeq.sorted
    (for {
      a <- nodes; b <- nodes if a < b && e((a, b))
      c <- nodes if b < c && e((b, c)) && e((a, c))
    } yield (a, b, c)).toSet
  }

  test("K4 has exactly its four triangles; pendant edges add none") {
    val k4 = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    val edges = k4 ++ Seq((3L, 10L), (10L, 11L)) // pendant chain
    assert(run(edges) == Set(
      (0L, 1L, 2L), (0L, 1L, 3L), (0L, 2L, 3L), (1L, 2L, 3L)))
  }

  test("parity with naive enumeration on a skewed graph (hub node)") {
    // hub 0 connects to everyone; plus a deterministic sparse remainder
    val hub = (1L to 60L).map(i => (0L, i))
    val rest = (1 until 60).flatMap { i =>
      val j = (i * 7 % 60) + 1
      if (j > i) Seq((i.toLong, j.toLong)) else Nil
    }
    val edges = hub ++ rest
    val got = run(edges)
    assert(got == naive(edges))
    assert(got.nonEmpty) // the graph genuinely has triangles
  }

  test("self-loops and duplicate/reversed edges are canonicalized away") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 3L), (3L, 2L), (1L, 3L))
    assert(run(edges) == Set((1L, 2L, 3L)))
  }
}
