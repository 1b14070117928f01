package graft.operators

import graft.readstat.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins [[Graph.pageRank]] against a local power-iteration reference and
  * the keep-best representative selection against hand-computed picks.
  */
class PageRankKeepBestSpec extends SparkTestBase {

  import spark.implicits._

  /** Local reference PageRank on directed (src, dst) edges. */
  private def refPageRank(edges: Seq[(Long, Long)], iters: Int,
      damping: Double): Map[Long, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size
    val outDeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var ranks = nodes.map(_ -> 1.0 / n).toMap
    val base = (1.0 - damping) / n
    (0 until iters).foreach { _ =>
      val contrib = edges
        .map { case (u, v) => v -> ranks(u) / outDeg(u) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      ranks = nodes.map(id => id -> (base + damping * contrib.getOrElse(id, 0.0))).toMap
    }
    ranks
  }

  test("pageRank matches a local power iteration on a directed graph") {
    // other suites legitimately leave their returned-frame caches (the
    // CC/pageRank caller-unpersists contract) — clear so the leak
    // assertions below see only THIS test's caches
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    // two triangles bridged by one edge, plus a dangling sink (5 -> none)
    val edges: Seq[(Long, Long)] = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L),
      (10L, 11L), (11L, 12L), (12L, 10L),
      (3L, 10L), (10L, 5L))
    val got = Graph.pageRank(edges.toDF("s", "t"), "s", "t", iters = 12)
      .as[(Long, Double)].collect().toMap
    val want = refPageRank(edges, iters = 12, damping = 0.85)
    assert(got.keySet == want.keySet)
    got.foreach { case (id, r) =>
      assert(math.abs(r - want(id)) < 1e-12, s"node $id: $r vs ${want(id)}")
    }
    // the bridge target (10) outranks the bridge source's peers
    assert(got(10L) > got(1L) && got(10L) > got(2L))
    // the local path persists nothing
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("distributed path agrees with the local path and cleans its caches") {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    val edges: Seq[(Long, Long)] = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L),
      (10L, 11L), (11L, 12L), (12L, 10L),
      (3L, 10L), (10L, 5L))
    val df = edges.toDF("s", "t")
    val local = Graph.pageRank(df, "s", "t", iters = 9)
      .as[(Long, Double)].collect().toMap
    // localEdgeThreshold = 0 forces the shuffle loop; 9 iterations
    // crosses a materializeEvery=4 boundary twice
    val distFrame = Graph.pageRank(df, "s", "t", iters = 9, localEdgeThreshold = 0L)
    val dist = distFrame.as[(Long, Double)].collect().toMap
    assert(dist.keySet == local.keySet)
    dist.foreach { case (id, r) =>
      assert(math.abs(r - local(id)) < 1e-12, s"node $id: $r vs ${local(id)}")
    }
    // contract: only the returned frame's own cache remains
    assert(spark.sparkContext.getPersistentRDDs.size <= 1)
    distFrame.unpersist()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("pageRank on a symmetric graph: uniform ranks for a regular graph") {
    // undirected 4-cycle symmetrized: every node has degree 2 ->
    // PageRank must be exactly uniform at every iteration
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val sym = und ++ und.map(_.swap)
    val got = Graph.pageRank(sym.toDF("s", "t"), "s", "t", iters = 8)
      .as[(Long, Double)].collect().toMap
    got.values.foreach(r => assert(math.abs(r - 0.25) < 1e-12))
  }

  test("pageRank handles empty edge sets") {
    val empty = Seq.empty[(Long, Long)].toDF("s", "t")
    assert(Graph.pageRank(empty, "s", "t").count() == 0)
  }

  test("keep-best picks the highest-quality member per cluster with id tie-break") {
    val dir = java.nio.file.Files.createTempDirectory("keepbest_spec").toFile
    dir.deleteOnExit()
    // docs 0/1/2 near-identical (one cluster), 3/4 identical quality
    // (tie -> lower doc_id), 5 a singleton
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa one"),
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa 22"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa three"),
      (3L, "red orange yellow green blue indigo violet purple pink aa"),
      (4L, "red orange yellow green blue indigo violet purple pink bb"),
      (5L, "completely unrelated text about nothing similar at all here"))
    docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val out = graft.queries.Text.keepBest(spark, dir.getAbsolutePath)
      .select("doc_id", "cluster_id", "cluster_size", "is_kept")
      .as[(Long, Long, Long, Int)].collect().toSeq
    val byId = out.map(r => r._1 -> r).toMap
    assert(out.size == 6)
    // cluster {0,1,2}: doc 1 has the digit suffix -> lower alpha ratio;
    // docs 0 and 2 differ only in suffix length; exactly one kept
    val c012 = out.filter(_._2 == 0L)
    assert(c012.map(_._1).toSet == Set(0L, 1L, 2L))
    assert(c012.forall(_._3 == 3L))
    assert(c012.count(_._4 == 1) == 1)
    assert(byId(1L)._4 == 0, "digit-suffixed doc must lose on alpha ratio")
    // cluster {3,4}: equal quality -> tie-break keeps doc 3
    assert(byId(3L)._4 == 1 && byId(4L)._4 == 0)
    assert(byId(3L)._3 == 2L)
    // singleton keeps itself
    assert(byId(5L) == ((5L, 5L, 1L, 1)))
  }
}
