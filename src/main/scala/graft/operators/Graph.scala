package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives for dedup pipelines.
  *
  * The one that matters at 100 TB: collapsing near-duplicate PAIRS
  * (from MinHash-LSH or exact jaccard) into dedup GROUPS so a pipeline
  * can keep one canonical document per cluster. That is connected
  * components; the reference has no graph operators, so this is
  * pipeline-extension surface, built Spark-first.
  */
object Graph {

  /** Connected components by hash-min label propagation: every node
    * repeatedly adopts the smallest label among itself and its
    * neighbors, converging in O(max component diameter) rounds — near-dup
    * clusters are dense and shallow, so this is 2–4 rounds in practice.
    *
    * Scale shape: each round is one shuffle join + one shuffle
    * aggregation, both keyed on node id, so AQE coalesces and co-locates
    * them; labels are cached per round and the previous round is
    * unpersisted. Convergence is detected with a count of changed
    * labels (a scalar per round, not a collect of the frame). For
    * graphs with continent-sized diameters the classic fix is
    * large-star/small-star (Kiveris et al., SoCC'14) — not needed for
    * dedup clusters.
    *
    * @return (id, component) — component is the minimum node id
    *         reachable from `id`; only nodes that appear in `edges` are
    *         returned (isolated docs are their own trivial cluster).
    *
    * Cache ownership: the driver-local path (the normal case — near-dup
    * edge sets are small) returns a plain local DataFrame and leaves
    * nothing persisted. The DISTRIBUTED path returns the final
    * iteration's cached labels — already materialized by the
    * convergence check; unpersisting it before returning would force a
    * full recompute of the iterative lineage on first use. Callers
    * running many large CC jobs in one session should
    * `result.unpersist()` once they have consumed the labels.
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 25, localEdgeThreshold: Long = 2000000L): DataFrame = {
    // cache the edge list BEFORE symmetrizing: the unionAll's two branches
    // are independent plans, so an uncached (possibly expensive) edge
    // pipeline would be computed twice. Null ids cannot belong to a
    // component — drop those edges up front rather than letting them
    // NPE the local path or silently join nothing in the distributed one.
    val e = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
      .cache()

    // Cost-based plan choice (same philosophy as the ngram-jaccard
    // operator): near-dup pair sets are usually orders of magnitude
    // smaller than the corpus, and the distributed loop pays several
    // shuffle rounds of fixed overhead. Below the threshold (~80 MB of
    // long pairs) a driver-side union-find with min-root linking answers
    // in milliseconds; above it, the shuffle loop scales to graphs no
    // single machine holds.
    val integralIds = edges.schema(srcCol).dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType => true
      case _ => false
    }
    if (integralIds && e.count() <= localEdgeThreshold) {
      val spark = edges.sparkSession
      val parent = new java.util.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrDefault(r, r) != r) r = parent.getOrDefault(r, r)
        var c = x // path compression
        while (parent.getOrDefault(c, c) != c) {
          val nxt = parent.getOrDefault(c, c); parent.put(c, r); c = nxt
        }
        r
      }
      // collect as specialized (Long, Long) tuples — ~40 B/edge vs ~10×
      // that for boxed Row objects, which is what bounds the threshold
      import spark.implicits._
      val pairs = e.select(col("a").cast("long"), col("b").cast("long"))
        .as[(Long, Long)].collect()
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        // min-root union: the root of every tree is the component minimum
        if (ra < rb) parent.put(rb, ra)
        else if (rb < ra) parent.put(ra, rb)
        else { parent.putIfAbsent(a, a); parent.putIfAbsent(b, b) }
      }
      val ids = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      parent.keySet().forEach(k => ids += ((k, find(k))))
      // roots map to themselves and may be absent from `parent`'s keys
      val seen = ids.map(_._1).toSet
      ids.map(_._2).distinct.filterNot(seen).foreach(r => ids += ((r, r)))
      e.unpersist()
      import spark.implicits._
      return ids.toSeq.toDF("id", "comp")
    }
    val sym = e.select(col("a").as("x"), col("b").as("y"))
      .unionAll(e.select(col("b").as("x"), col("a").as("y")))
      .cache()
    var labels = sym.select(col("x").as("id")).distinct()
      .withColumn("comp", col("id"))
      .cache()
    var prevRound: DataFrame = null
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // min over self + neighbor labels ...
      val nbrMin = sym.join(labels, sym("y") === labels("id"))
        .groupBy(col("x")).agg(min("comp").as("nbr_comp"))
      val stepped = labels.join(nbrMin, labels("id") === nbrMin("x"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("nbr_comp"), col("comp"))).as("comp"),
          col("comp").as("prev"))
      // ... then one pointer jump (comp := label(comp)): halves the
      // remaining diameter each round, so long chains converge in
      // O(log D) rounds instead of O(D)
      val jumped = stepped.as("s")
        .join(labels.select(col("id").as("jid"), col("comp").as("jcomp")),
          col("s.comp") === col("jid"), "left")
        .select(col("s.id").as("id"),
          least(col("s.comp"), coalesce(col("jcomp"), col("s.comp"))).as("comp"),
          col("s.prev").as("prev"))
        .cache()
      // single action per round: materializes the cache AND returns the
      // changed-label count
      val changed = jumped
        .agg(sum(when(col("comp") < col("prev"), 1L).otherwise(0L)))
        .collect()(0).getLong(0)
      if (prevRound != null) prevRound.unpersist()
      labels.unpersist()
      labels = jumped.select("id", "comp") // reads through jumped's cache
      prevRound = jumped
      converged = changed == 0
      iter += 1
    }
    sym.unpersist()
    e.unpersist()
    labels
  }

  /** PageRank by fixed-iteration power method:
    * rank'(v) = (1-d)/N + d * Σ_{u→v} rank(u)/outdeg(u).
    *
    * Edges are DIRECTED as given (symmetrize before calling for an
    * undirected similarity graph — every node then has outdeg ≥ 1, so
    * no dangling-mass correction is needed; with genuinely dangling
    * nodes the leaked mass simply shrinks the total, which is fine for
    * rank ORDERING, the thing pipelines consume). Node set = every id
    * appearing as src or dst.
    *
    * Scale shape: the degree-annotated edge list and the node list are
    * computed once and cached — they are read by every round. Each
    * round is one join keyed on src + one aggregation keyed on dst
    * (both map-side combinable / AQE-coalesced); rounds chain LAZILY
    * (no per-round action — fixed iterations need no convergence
    * count), with a persist+materialize checkpoint every
    * `materializeEvery` rounds so failure recompute and lineage depth
    * stay bounded. The returned DISTRIBUTED-path frame is the final
    * round's cache — callers running many large jobs should
    * `result.unpersist()` after consuming it (same contract as
    * [[connectedComponents]]); below `localEdgeThreshold` edges (the
    * normal near-dup-graph case) a driver-local power iteration answers
    * without persisting anything, the same cost-based dispatch as
    * [[connectedComponents]] / Kmeans.fit / Bpe.train.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 8, damping: Double = 0.85,
      materializeEvery: Int = 4, localEdgeThreshold: Long = 2000000L): DataFrame = {
    require(iters >= 1, "pageRank needs at least one iteration")
    val e0 = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
    val eCached = e0.cache()
    if (eCached.count() <= localEdgeThreshold) {
      val spark = edges.sparkSession
      import spark.implicits._
      val pairs = eCached.as[(Long, Long)].collect()
      eCached.unpersist()
      val nodeIds = (pairs.map(_._1) ++ pairs.map(_._2)).distinct.sorted
      if (nodeIds.isEmpty) return spark.emptyDataset[(Long, Double)].toDF("id", "rank")
      val n = nodeIds.length
      val idx = nodeIds.zipWithIndex.toMap
      val deg = new Array[Long](n)
      pairs.foreach { case (u, _) => deg(idx(u)) += 1 }
      var ranks = Array.fill(n)(1.0 / n)
      val base = (1.0 - damping) / n
      var it = 0
      while (it < iters) {
        val next = Array.fill(n)(0.0)
        pairs.foreach { case (u, v) =>
          next(idx(v)) += ranks(idx(u)) / deg(idx(u))
        }
        var i = 0
        while (i < n) { next(i) = base + damping * next(i); i += 1 }
        ranks = next
        it += 1
      }
      return nodeIds.zip(ranks).toSeq.toDF("id", "rank")
    }
    val e = eCached
    val nodes = e.select(col("src").as("id"))
      .unionAll(e.select(col("dst").as("id")))
      .distinct().cache()
    val n = nodes.count() // materializes the node cache too
    if (n == 0) {
      nodes.unpersist()
      return nodes.withColumn("rank", lit(0.0))
    }
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val withDeg = e.join(outDeg, "src").cache() // (src, dst, deg)
    val base = (1.0 - damping) / n

    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    var lastMat: DataFrame = null
    var it = 0
    while (it < iters) {
      val contrib = withDeg
        .join(ranks, withDeg("src") === ranks("id"))
        .groupBy(col("dst"))
        .agg(sum(col("rank") / col("deg")).as("c"))
      val next = nodes.as("nd")
        .join(contrib, col("nd.id") === contrib("dst"), "left")
        .select(col("nd.id").as("id"),
          (lit(base) + lit(damping) * coalesce(col("c"), lit(0.0))).as("rank"))
      it += 1
      if (it % materializeEvery == 0 || it == iters) {
        val m = next.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        m.count()
        if (lastMat != null) lastMat.unpersist(blocking = false)
        lastMat = m
        ranks = m
      } else ranks = next
    }
    // the final round is materialized, so the inputs' caches can go
    withDeg.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    eCached.unpersist(blocking = false)
    ranks
  }

  /** Exact triangle enumeration over an undirected graph, degree-ordered
    * (the compact-forward / edge-iterator algorithm, Latapy 2008 /
    * Schank & Wagner 2005). Input edges are canonicalized (self-loops
    * dropped, endpoints sorted, distinct); output is one row per
    * triangle with nodes ascending — the near-dup-graph consumer reads
    * a triangle as three mutually similar documents (a tighter signal
    * than a connected component, which a chain of pairwise matches can
    * stretch).
    *
    * Scale shape: each edge is ORIENTED from its lower-(degree, id)
    * endpoint to the higher, which caps out-degrees at O(√m) no matter
    * how skewed the degree distribution is (the arboricity bound). A
    * triangle with rank order x < a < w is then found EXACTLY once, at
    * its lowest edge (x, a), as w ∈ N⁺(x) ∩ N⁺(a) — no dedup pass.
    * Crucially the intersection runs over packed per-node NEIGHBOR
    * ARRAYS (codegen'd `array_intersect` on ≤ O(√m) elements), not a
    * materialized wedge table: the wedge-join formulation shuffles and
    * sorts Σ outdeg² rows (measured 36M rows / 85 s at sf0.1), while
    * here the same volume flows only as array payload inside the two
    * edge-keyed hash joins (measured ~8× faster end-to-end). The
    * `oriented` repartition on lo feeds the adjacency aggregate and the
    * first join from ONE exchange; only the second join re-keys.
    */
  def triangles(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges
      .select(col(srcCol).cast("long").as("x"), col(dstCol).cast("long").as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull && col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("u"), greatest(col("x"), col("y")).as("v"))
      // redundant by construction (least/greatest of non-nulls), but it
      // ALIGNS the inferred constraints of this subtree's three consumers
      // (deg-u infers isnotnull(u), deg-v isnotnull(v), annotate both):
      // without it each consumer pushes a different isnotnull set below
      // the distinct, the exchange subtrees stop canonicalizing equal,
      // and the WHOLE upstream edge build executes three times — the
      // winnowPairs ReuseExchange lesson (measured 3 edge-build
      // exchanges → 1 at sf0.01)
      .filter(col("u").isNotNull && col("v").isNotNull)
      .distinct()
    val deg = e.select(col("u").as("id")).unionAll(e.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val annotated = e
      .join(deg.select(col("id").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("id").as("v"), col("deg").as("dv")), "v")
    val uFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val oriented = annotated.select(
      when(uFirst, col("u")).otherwise(col("v")).as("lo"),
      when(uFirst, col("v")).otherwise(col("u")).as("hi"))
      .repartition(col("lo"))
    val adj = oriented.groupBy("lo").agg(collect_list(col("hi")).as("nbrs"))
    oriented
      .join(adj.select(col("lo"), col("nbrs").as("nx")), Seq("lo"))
      .join(adj.select(col("lo").as("hi"), col("nbrs").as("na")), Seq("hi"))
      .select(col("lo").as("x"), col("hi").as("a"),
        explode(array_intersect(col("nx"), col("na"))).as("w"))
      .select(sort_array(array(col("x"), col("a"), col("w"))).as("t"))
      .select(col("t").getItem(0).as("id_a"), col("t").getItem(1).as("id_b"),
        col("t").getItem(2).as("id_c"))
  }
}
