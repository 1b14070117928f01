package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., TPAMI'11): split each vector into
  * `m` subvectors, k-means each subspace independently, store one code
  * per subspace — 64-dim float32 → `m` small codes (8 bytes at m=8,k=16;
  * 16× below even int8 scalar quantization), the compression that makes
  * billion-vector ANN candidate scans memory-resident.
  *
  * Scale shape: training runs ONE corpus pass per Lloyd iteration for
  * ALL m codebooks (assignment and partial sums fused per partition —
  * m × k × subDim doubles per task cross the wire, not the corpus);
  * encoding is one linear scan against the broadcast codebooks. The
  * driver only ever holds the m×k×subDim codebook array (KBs).
  */
object Pq {

  /** m codebooks of k centroids each, codebooks(j)(c) has subDim dims. */
  case class Model(m: Int, subDim: Int, codebooks: Array[Array[Array[Double]]])

  def fit(emb: DataFrame, idCol: String, vecCol: String,
      m: Int = 8, k: Int = 16, maxIter: Int = 8): Model = {
    val spark = emb.sparkSession
    val vecs = emb.select(col(vecCol).cast("array<double>").as("v"),
      col(idCol).cast("long").as("id"))
      .where(col("v").isNotNull).cache()
    val dim = vecs.select(size(col("v"))).first().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subDim = dim / m

    // deterministic seeds: subvectors of the k lowest-id vectors
    val seeds = vecs.orderBy("id").limit(k).collect()
      .map(_.getSeq[Double](0).toArray)
    var books: Array[Array[Array[Double]]] = Array.tabulate(m, k) { (j, c) =>
      java.util.Arrays.copyOfRange(seeds(c), j * subDim, (j + 1) * subDim)
    }

    var iter = 0
    while (iter < maxIter) {
      val bc = spark.sparkContext.broadcast(books)
      // fused pass: for every subspace, argmin + partial sums in one scan
      val (sums, counts) = vecs.select("v").rdd.mapPartitions { it =>
        val bks = bc.value
        val s = Array.fill(m, k)(new Array[Double](subDim))
        val n = Array.fill(m, k)(0L)
        it.foreach { r =>
          val v = r.getSeq[Double](0)
          var j = 0
          while (j < m) {
            val off = j * subDim
            var best = 0; var bestD = Double.MaxValue
            var c = 0
            while (c < k) {
              val cb = bks(j)(c)
              var d = 0.0; var i = 0
              while (i < subDim) { val t = v(off + i) - cb(i); d += t * t; i += 1 }
              if (d < bestD) { bestD = d; best = c }
              c += 1
            }
            n(j)(best) += 1
            var i = 0
            while (i < subDim) { s(j)(best)(i) += v(off + i); i += 1 }
            j += 1
          }
        }
        Iterator.single((s, n))
      }.reduce { (a, b) =>
        var j = 0
        while (j < m) {
          var c = 0
          while (c < k) {
            var i = 0
            while (i < subDim) { a._1(j)(c)(i) += b._1(j)(c)(i); i += 1 }
            a._2(j)(c) += b._2(j)(c); c += 1
          }
          j += 1
        }
        a
      }
      bc.destroy()
      books = Array.tabulate(m, k) { (j, c) =>
        if (counts(j)(c) == 0) books(j)(c)
        else sums(j)(c).map(_ / counts(j)(c))
      }
      iter += 1
    }
    vecs.unpersist()
    Model(m, subDim, books)
  }

  /** Encode each vector to its m nearest-subcentroid codes.
    * @return (idCol, codes array<int> of length m) */
  def encode(emb: DataFrame, idCol: String, vecCol: String, model: Model): DataFrame = {
    val spark = emb.sparkSession
    val bc = spark.sparkContext.broadcast(model)
    import spark.implicits._
    emb.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("v"))
      .as[(Long, Seq[Double])]
      .mapPartitions { it =>
        val mod = bc.value
        it.map { case (id, v) =>
          val codes = new Array[Int](mod.m)
          var j = 0
          while (j < mod.m) {
            val off = j * mod.subDim
            var best = 0; var bestD = Double.MaxValue
            var c = 0
            while (c < mod.codebooks(j).length) {
              val cb = mod.codebooks(j)(c)
              var d = 0.0; var i = 0
              while (i < mod.subDim) { val t = v(off + i) - cb(i); d += t * t; i += 1 }
              if (d < bestD) { bestD = d; best = c }
              c += 1
            }
            codes(j) = best
            j += 1
          }
          (id, codes.toSeq)
        }
      }.toDF(idCol, "codes")
  }

  /** Mean squared reconstruction error of a coded corpus — the training
    * objective; use it to size m/k. One linear scan. */
  def reconstructionMse(emb: DataFrame, idCol: String, vecCol: String,
      model: Model): Double = {
    val spark = emb.sparkSession
    val bc = spark.sparkContext.broadcast(model)
    import spark.implicits._
    val (sse, n) = emb.select(col(vecCol).cast("array<double>").as("v"))
      .as[Seq[Double]]
      .mapPartitions { it =>
        val mod = bc.value
        var sse = 0.0; var n = 0L
        it.foreach { v =>
          var j = 0
          while (j < mod.m) {
            val off = j * mod.subDim
            var bestD = Double.MaxValue
            var c = 0
            while (c < mod.codebooks(j).length) {
              val cb = mod.codebooks(j)(c)
              var d = 0.0; var i = 0
              while (i < mod.subDim) { val t = v(off + i) - cb(i); d += t * t; i += 1 }
              if (d < bestD) bestD = d
              c += 1
            }
            sse += bestD
            j += 1
          }
          n += 1
        }
        Iterator.single((sse, n))
      }.reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    sse / n
  }
}
