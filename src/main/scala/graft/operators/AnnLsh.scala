package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Random-hyperplane LSH for cosine similarity search — the scale path
  * next to the exact brute-force baseline in graft.queries.Similarity.
  *
  * Signatures: nBits sign bits from dot products with fixed, seeded
  * hyperplanes (deterministic across runs/executors). Buckets: bands of
  * the signature; candidates share ≥1 band with a query; exact cosine
  * re-rank only on candidates. At 100 TB the corpus is hashed once
  * (linear scan, no shuffle), and each query touches only its buckets —
  * probes scale with bucket occupancy, not corpus size.
  */
object AnnLsh {

  /** Deterministic hyperplanes: nBits × dim from a fixed-seed generator. */
  def hyperplanes(nBits: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(nBits, dim)(rnd.nextGaussian())
  }

  /** Append an nBits-bit signature (as long) + band columns. The whole
    * signature is ONE loop-codegen'd expression
    * ([[graft.functions.HyperplaneSignature]]) — an unrolled per-plane
    * formulation generates nBits×dim expression nodes and overwhelms
    * janino. */
  def withSignature(df: DataFrame, vecCol: String, planes: Array[Array[Double]],
      bands: Int): DataFrame = {
    val sigExpr = graft.functions.HyperplaneSignature(col(vecCol), planes)
    val bitsPerBand = planes.length / bands
    val mask = (1L << bitsPerBand) - 1
    val bandArr = array((0 until bands).map(b =>
      struct(lit(b).as("band"),
        shiftrightunsigned(col("ann_sig"), b * bitsPerBand).bitwiseAND(mask).as("v"))): _*)
    df.withColumn("ann_sig", sigExpr).withColumn("ann_bands", bandArr)
  }

  /** Top-k approximate neighbors for each query id. */
  def topK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nBits: Int = 16, bands: Int = 4,
      dim: Int = 64): DataFrame = {
    val planes = hyperplanes(nBits, dim)
    val c = withSignature(corpus, vecCol, planes, bands)
      .select(col(idCol).as("nid"), col(vecCol).as("cv"),
        explode(col("ann_bands")).as("bucket"))
    val q = withSignature(queries, vecCol, planes, bands)
      .select(col(idCol).as("qid"), col(vecCol).as("qv"),
        explode(col("ann_bands")).as("bucket"))
    val dot = graft.queries.Similarity.dotUnrolled(col("qv"), col("cv"), dim)
    val norm = (v: Column) =>
      sqrt(graft.queries.Similarity.dotUnrolled(v, v, dim))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid"))
    // compute sim before deduplicating bucket collisions so only scalars
    // (never the embedding arrays) cross the dedup shuffle
    q.join(c, Seq("bucket"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("sim", dot / (norm(col("qv")) * norm(col("cv"))))
      .groupBy("qid", "nid").agg(max("sim").as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("nid"), round(col("sim"), 4).as("sim"), col("rn"))
  }
}
