package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN over arbitrary centroids — the trained
  * counterpart of the oracle-replayable fixed-anchor index in
  * `queries/Similarity.annIvfTopK`. Feed it [[Kmeans.fit]] output for a
  * real pipeline: train once, search many.
  *
  * Scale shape: the centroid table is K rows (KBs–MBs), collected once
  * and folded into a per-row argmax expression
  * ([[graft.functions.NearestCentroid]]) — cell assignment runs inside
  * the corpus scan with no join, no row multiplication, and no shuffle;
  * the candidate join then shuffles on cell id so each query touches
  * ~nprobe/K of the corpus. Nothing collects the corpus.
  */
object AnnIvf {

  /** Lift driver-held centroids (e.g. from [[Kmeans.fit]]) into the
    * (cid, cvec) shape [[topK]] consumes. K rows — trivially small. */
  def centroidsDF(spark: SparkSession, centroids: Array[Array[Double]]): DataFrame = {
    import spark.implicits._
    centroids.zipWithIndex.map { case (v, i) => (i, v.toSeq) }
      .toSeq.toDF("cid", "cvec")
  }

  /** Exact cosine top-k within the nprobe nearest cells of each query.
    *
    * NOTE: the centroid table is EAGERLY collected (one Spark job) when
    * this method is called — plan construction is not fully lazy. That
    * is deliberate: K centroid rows are driver-sized, and folding them
    * into the [[graft.functions.NearestCentroid]] argmax turns cell
    * assignment into a pure map inside the corpus scan. The same
    * collected rows also build the broadcast probe side, so the centroid
    * plan (possibly a full k-means job) is evaluated exactly once.
    *
    * @param corpus  (idCol, vecCol) — the searched side, any size
    * @param queries (idCol, vecCol) — the probing side (small)
    * @param dim     embedding dimensionality (unrolled codegen'd cosine)
    */
  def topK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, dim: Int, k: Int = 5, nprobe: Int = 4): DataFrame = {
    import graft.queries.Similarity.cosineUnrolled
    // K centroid rows collected once (ordered by cid so the expression's
    // lowest-index tie-break is the lowest-cid tie-break), assignment is
    // a pure map inside the corpus scan
    val centRows = centroids.select(col("cid"), col("cvec")).orderBy("cid").collect()
    val cids = centRows.map(_.getInt(0))
    val centVecs: Array[Array[Double]] = centRows.map(_.getSeq[Any](1).toArray.map {
      case f: Float => f.toDouble
      case d: Double => d
      case other => throw new IllegalArgumentException(
        s"AnnIvf: centroid element $other is not float/double")
    })
    // probe side rebuilt from the SAME collected rows (float centroids
    // widened to double — exactly what both cosine paths do internally),
    // not from the incoming plan: evaluating `centroids` twice would
    // re-run whatever produced it (round-6 advice)
    val spark = corpus.sparkSession
    import spark.implicits._
    val cent = broadcast(
      cids.zip(centVecs).map { case (c, v) => (c, v.toSeq) }.toSeq
        .toDF("cid", "cvec"))
    val cellOf = element_at(
      array(cids.toIndexedSeq.map(lit(_)): _*),
      graft.functions.NearestCentroid(col("cv0"), centVecs) + 1)
    val assigned = corpus
      .select(col(idCol).as("nid"), col(vecCol).as("cv0"))
      .withColumn("cell", cellOf)
      .select(col("nid"), col("cell"), col("cv0").as("cv"))
    val wProbe = Window.partitionBy("qid").orderBy(col("qsim").desc, col("cid"))
    val probes = queries
      .select(col(idCol).as("qid"), col(vecCol).as("qv"))
      .join(cent)
      .withColumn("qsim", cosineUnrolled(col("qv"), col("cvec"), dim))
      .withColumn("prn", row_number().over(wProbe))
      .filter(col("prn") <= nprobe)
      .select(col("qid"), col("qv"), col("cid").as("cell"))
    val wTop = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid"))
    probes.join(assigned, "cell")
      .filter(col("qid") =!= col("nid"))
      .withColumn("sim", cosineUnrolled(col("qv"), col("cv"), dim))
      .withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= k)
      .select(col("qid"), col("nid"), col("sim"), col("rn"))
  }
}
