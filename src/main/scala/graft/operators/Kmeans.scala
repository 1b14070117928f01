package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over an embedding column — the training
  * path for IVF-style ANN partitioning (AnnIvf's deterministic centroids
  * are the oracle-replayable stand-in; real pipelines train these).
  *
  * Scale shape per iteration: centroids (K × dim doubles — KBs) are
  * broadcast in the closure; assignment is one linear scan with a tight
  * per-row argmin loop (no join, no shuffle); the update is one
  * partial-aggregatable groupBy(cluster) over per-dimension sums, so
  * only K × dim partial sums per map task cross the wire. Nothing ever
  * collects the corpus: the driver sees exactly K centroid rows per
  * round. Deterministic: seeds are the K lowest-id vectors and every
  * step is order-independent arithmetic on doubles.
  */
object Kmeans {

  /** @return (centroids: Array[Array[Double]], inertiaPerIter)
    *
    * Cost-based local path (the same move as
    * [[Graph.connectedComponents]]'s union-find fallback): k-means state
    * is K × dim doubles whatever the corpus size, and when the corpus
    * itself is driver-sized the per-iteration Spark job round-trips
    * dominate wall clock, not arithmetic. `limit(localThreshold + 1)`
    * scans with early termination; if everything fits, the IDENTICAL
    * Lloyd's update (same seeding, empty-cluster rule, convergence test)
    * runs locally in zero further jobs. Above the threshold the
    * distributed path takes over: broadcast centroids, fused
    * assign+partial-sum pass, K × dim partial sums per map task. The two
    * paths differ only in floating-point summation order.
    */
  def fit(emb: DataFrame, idCol: String, vecCol: String, k: Int,
      maxIter: Int = 10, localThreshold: Int = 100000): (Array[Array[Double]], Seq[Double]) = {
    val spark = emb.sparkSession
    val vecs0 = emb.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("v"))
      .where(col("v").isNotNull)

    if (localThreshold > 0) {
      val head = vecs0.limit(localThreshold + 1).collect()
      if (head.length <= localThreshold) {
        val ids = head.map(_.getLong(0))
        val data = head.map(_.getSeq[Double](1).toArray)
        return fitLocal(ids, data, k, maxIter)
      }
    }

    val vecs = vecs0.cache()
    // deterministic seeding: the K lowest-id vectors (k rows to driver)
    var centroids: Array[Array[Double]] = vecs.orderBy("id").limit(k)
      .collect().map(_.getSeq[Double](1).toArray)
    require(centroids.nonEmpty, "kmeans: no non-null vectors to fit")
    require(centroids.length == k,
      s"kmeans: corpus has only ${centroids.length} vectors for k=$k")
    val dim = centroids.head.length
    val inertias = scala.collection.mutable.ArrayBuffer[Double]()

    var iter = 0
    var done = false
    while (iter < maxIter && !done) {
      val bc = spark.sparkContext.broadcast(centroids)
      // one pass: argmin assignment fused with per-cluster partial sums
      // via an rdd aggregate keyed on cluster — (sum[dim], count, sse)
      val agg = vecs.select("v").rdd.mapPartitions { it =>
        val cs = bc.value
        val sums = Array.fill(cs.length)(new Array[Double](dim))
        val counts = new Array[Long](cs.length)
        var sse = 0.0
        it.foreach { r =>
          val v = r.getSeq[Double](0)
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < cs.length) {
            var d = 0.0; var i = 0
            val cv = cs(c)
            while (i < dim) { val t = v(i) - cv(i); d += t * t; i += 1 }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          sse += bestD
          counts(best) += 1
          var i = 0
          while (i < dim) { sums(best)(i) += v(i); i += 1 }
        }
        Iterator.single((sums, counts, sse))
      }.reduce { (a, b) =>
        val (s1, c1, e1) = a; val (s2, c2, e2) = b
        var c = 0
        while (c < s1.length) {
          var i = 0
          while (i < dim) { s1(c)(i) += s2(c)(i); i += 1 }
          c1(c) += c2(c); c += 1
        }
        (s1, c1, e1 + e2)
      }
      bc.destroy()
      val (sums, counts, sse) = agg
      inertias += sse
      val next = centroids.indices.map { c =>
        if (counts(c) == 0) centroids(c) // empty cluster keeps its seat
        else sums(c).map(_ / counts(c))
      }.toArray
      val moved = centroids.zip(next).map { case (a, b) =>
        a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
      }.max
      centroids = next
      done = moved < 1e-12
      iter += 1
    }
    vecs.unpersist()
    (centroids, inertias.toSeq)
  }

  /** Driver-local Lloyd's — byte-for-byte the distributed update rule
    * (argmin with lowest-index tie-break, empty cluster keeps its seat,
    * moved < 1e-12 convergence), minus the job scheduling. */
  private def fitLocal(ids: Array[Long], data: Array[Array[Double]],
      k: Int, maxIter: Int): (Array[Array[Double]], Seq[Double]) = {
    require(data.nonEmpty, "kmeans: no non-null vectors to fit")
    require(data.length >= k,
      s"kmeans: corpus has only ${data.length} vectors for k=$k")
    var centroids: Array[Array[Double]] =
      ids.zip(data).sortBy(_._1).take(k).map(_._2)
    val dim = centroids.head.length
    val inertias = scala.collection.mutable.ArrayBuffer[Double]()
    var iter = 0
    var done = false
    while (iter < maxIter && !done) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      var sse = 0.0
      var r = 0
      while (r < data.length) {
        val v = data(r)
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var d = 0.0; var i = 0
          val cv = centroids(c)
          while (i < dim) { val t = v(i) - cv(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        sse += bestD
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
        r += 1
      }
      inertias += sse
      val next = centroids.indices.map { c =>
        if (counts(c) == 0) centroids(c) // empty cluster keeps its seat
        else sums(c).map(_ / counts(c))
      }.toArray
      val moved = centroids.zip(next).map { case (a, b) =>
        a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
      }.max
      centroids = next
      done = moved < 1e-12
      iter += 1
    }
    (centroids, inertias.toSeq)
  }

  /** Assign each vector to its nearest centroid (linear scan, no
    * shuffle). @return (idCol, cluster) */
  def assign(emb: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]]): DataFrame = {
    val spark = emb.sparkSession
    val bc = spark.sparkContext.broadcast(centroids)
    val dim = centroids.head.length
    import spark.implicits._
    emb.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("v"))
      .as[(Long, Seq[Double])]
      .mapPartitions { it =>
        val cs = bc.value
        it.map { case (id, v) =>
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < cs.length) {
            var d = 0.0; var i = 0
            val cv = cs(c)
            while (i < dim) { val t = v(i) - cv(i); d += t * t; i += 1 }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          (id, best)
        }
      }.toDF(idCol, "cluster")
  }
}
