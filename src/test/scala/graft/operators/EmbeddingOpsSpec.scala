package graft.operators

import graft.readstat.SparkTestBase
import org.apache.spark.sql.functions._

/** Embedding-layer operators: scalar quantization bounds and k-means
  * training behavior (the IVF centroid path).
  */
class EmbeddingOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.01"
  private def embs = spark.read.parquet(s"$sf/embeddings.parquet")

  test("quantize codes are in [0,255] and error is within half a step per dim") {
    val codes = Quantize.encode(embs, "vec_id", "embedding").cache()
    assert(codes.filter(col("code") < 0 || col("code") > 255).count() == 0)
    // max error per dim must be ≤ (hi-lo)/255/2 (+fp slack)
    val ranges = Quantize.dimRanges(embs, "vec_id", "embedding")
    val bad = codes.groupBy("dim").agg(max("err").as("maxerr"))
      .join(ranges, "dim")
      .filter(col("maxerr") > (col("hi") - col("lo")) / 255.0 / 2.0 * 1.0001)
      .count()
    assert(bad == 0)
    // every vector gets one code per dimension
    val dimCount = embs.select(size(col("embedding"))).first().getInt(0)
    val perVec = codes.groupBy("vec_id").count()
      .filter(col("count") =!= dimCount).count()
    assert(perVec == 0)
    codes.unpersist()
  }

  test("trained-IVF ANN reaches high recall vs exact brute force") {
    val (cents, _) = Kmeans.fit(embs, "vec_id", "embedding", k = 16, maxIter = 8)
    val centDf = AnnIvf.centroidsDF(spark, cents)
    val queries = embs.filter(col("vec_id") < 10)
    val approx = AnnIvf.topK(embs, queries, "vec_id", "embedding",
      centDf, dim = 64, k = 5, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = graft.queries.Similarity.annBruteForce(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.size == 50)
    val recall = (approx & exact).size.toDouble / exact.size
    assert(recall >= 0.85, s"trained IVF recall $recall below 0.85")
  }

  test("product quantization beats the global-mean baseline and is deterministic") {
    val model = Pq.fit(embs, "vec_id", "embedding", m = 8, k = 16, maxIter = 5)
    assert(model.codebooks.length == 8 && model.codebooks.forall(_.length == 16))
    val codes = Pq.encode(embs, "vec_id", "embedding", model).cache()
    // every vector gets m codes, all within [0, k)
    assert(codes.filter(size(col("codes")) =!= 8).count() == 0)
    assert(codes.select(explode(col("codes")).as("c"))
      .filter(col("c") < 0 || col("c") > 15).count() == 0)
    // reconstruction must beat coding everything to the corpus mean
    // (= total per-vector variance), the k=1 degenerate codebook
    val mse = Pq.reconstructionMse(embs, "vec_id", "embedding", model)
    val mean = embs.select(posexplode(col("embedding")).as(Seq("d", "x")))
      .groupBy("d").agg(avg(col("x").cast("double")).as("mu"))
      .collect().sortBy(_.getInt(0)).map(_.getDouble(1))
    val varTot = embs.select(col("embedding").cast("array<double>").as("v"))
      .collect().map { r =>
        val v = r.getSeq[Double](0)
        v.indices.map(i => { val t = v(i) - mean(i); t * t }).sum
      }.sum / embs.count()
    assert(mse < varTot * 0.9, s"PQ mse $mse vs variance $varTot")
    // deterministic retrain
    val model2 = Pq.fit(embs, "vec_id", "embedding", m = 8, k = 16, maxIter = 5)
    val codes2 = Pq.encode(embs, "vec_id", "embedding", model2)
    assert(codes.except(codes2).count() == 0)
    codes.unpersist()
  }

  test("semantic dedup covers the corpus and always keeps a cluster's lowest id") {
    val out = graft.queries.Pipeline.dedupSemantic(spark, sf).collect()
    val total = embs.count()
    assert(out.map(_.getLong(1)).sum == total)      // every vector assigned once
    out.foreach { r =>
      val (n, dropped) = (r.getLong(1), r.getLong(2))
      assert(dropped >= 0 && dropped < n)           // the lowest id can never drop
      assert(r.getString(3).length == 32)           // md5 over a non-empty kept list
    }
    // determinism: identical result on re-run
    val again = graft.queries.Pipeline.dedupSemantic(spark, sf).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("kmeans inertia is non-increasing and assignment is deterministic") {
    val (cents, inertias) = Kmeans.fit(embs, "vec_id", "embedding", k = 8, maxIter = 6)
    assert(cents.length == 8)
    assert(inertias.nonEmpty)
    inertias.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a * (1 + 1e-9), s"inertia increased: $a -> $b")
    }
    // trained centroids beat the naive seeds they started from
    assert(inertias.last < inertias.head)
    val a1 = Kmeans.assign(embs, "vec_id", "embedding", cents)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val (cents2, _) = Kmeans.fit(embs, "vec_id", "embedding", k = 8, maxIter = 6)
    val a2 = Kmeans.assign(embs, "vec_id", "embedding", cents2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a1 == a2) // deterministic end to end
    // clusters are actually used (no degenerate single-cluster collapse)
    assert(a1.values.toSet.size >= 4)
  }

  test("kmeans local and distributed paths agree") {
    // default threshold takes the local path on this corpus; threshold 0
    // forces the distributed fused assign+partial-sum pass — same
    // seeding/update rule, FP summation order is the only difference
    val (local, li) = Kmeans.fit(embs, "vec_id", "embedding", k = 8, maxIter = 6)
    val (dist, di) = Kmeans.fit(embs, "vec_id", "embedding", k = 8, maxIter = 6,
      localThreshold = 0)
    assert(li.length == di.length)
    li.zip(di).foreach { case (a, b) =>
      assert(math.abs(a - b) <= 1e-6 * math.max(1.0, math.abs(a)))
    }
    local.zip(dist).foreach { case (lv, dv) =>
      lv.zip(dv).foreach { case (x, y) => assert(math.abs(x - y) < 1e-9) }
    }
    // and the assignments they induce are identical
    val a1 = Kmeans.assign(embs, "vec_id", "embedding", local)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val a2 = Kmeans.assign(embs, "vec_id", "embedding", dist)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a1 == a2)
  }
}
