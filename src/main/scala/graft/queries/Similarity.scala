package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Tables._

/** Similarity search over the `embeddings` table (Array[Float], dim 64).
  *
  * `annBruteForce` is the exact baseline: broadcast the (small) query set
  * against the corpus, compute cosine with codegen'd higher-order functions
  * (`zip_with` + `aggregate` — no UDF), per-query top-k via window rank.
  * At 100 TB the corpus side stays partitioned; only queries broadcast.
  * The LSH-bucketed scale path lives in [[graft.operators.AnnLsh]].
  */
object Similarity {

  /** Sequential-order dot product in double precision (deterministic:
    * left-to-right fold matches the oracle's summation order). */
  def dotD(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** Same dot product unrolled to a fixed-dimension expression chain:
    * left-associative like the fold (bit-identical result) but fully
    * whole-stage-codegen'd — higher-order lambdas are interpreted and
    * ~30x slower in tight pairwise loops. */
  def dotUnrolled(a: Column, b: Column, dim: Int): Column =
    (0 until dim).map(i =>
      element_at(a, i + 1).cast("double") * element_at(b, i + 1).cast("double"))
      .reduce(_ + _)

  def cosine(a: Column, b: Column): Column =
    dotD(a, b) / (sqrt(dotD(a, a)) * sqrt(dotD(b, b)))

  /** Codegen'd fixed-dimension cosine — identical value to [[cosine]]
    * (same left-to-right summation order) but whole-stage-codegen'd. */
  def cosineUnrolled(a: Column, b: Column, dim: Int): Column =
    dotUnrolled(a, b, dim) /
      (sqrt(dotUnrolled(a, a, dim)) * sqrt(dotUnrolled(b, b, dim)))

  /** Embedding dimension of the test corpus (embeddings.parquet). */
  val EmbeddingDim = 64

  /** Exact top-5 cosine neighbors for query vectors vec_id < 10. */
  def annBruteForce(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val c = e.select(col("vec_id").as("nid"), col("embedding").as("cv"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid"))
    c.join(broadcast(q), col("qid") =!= col("nid"))
      .withColumn("sim", cosineUnrolled(col("qv"), col("cv"), EmbeddingDim))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("qid"), col("nid"), round(col("sim"), 4).as("sim"), col("rn"))
      .orderBy("qid", "rn")
  }

  val annBruteForceSql: String =
    """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
      |           FROM embeddings WHERE vec_id < 10),
      |c AS (SELECT vec_id AS nid, embedding::DOUBLE[] AS cv FROM embeddings),
      |pairs AS (
      |  SELECT qid, nid,
      |    list_dot_product(qv, cv) /
      |      (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS sim
      |  FROM q, c WHERE qid <> nid),
      |ranked AS (
      |  SELECT qid, nid, sim,
      |         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn
      |  FROM pairs)
      |SELECT qid, nid, round(sim, 4) AS sim, rn
      |FROM ranked WHERE rn <= 5
      |ORDER BY qid, rn""".stripMargin

  /** Per-label centroid + distance stats: vector aggregation with
    * element-wise array sums (zip_with inside a reduce-style agg). */
  def labelCentroidStats(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
      .select(col("vec_id"), col("label"), col("embedding"),
        sqrt(dotUnrolled(col("embedding"), col("embedding"), EmbeddingDim))
          .as("norm"))
    e.groupBy("label")
      .agg(count(lit(1)).as("n"),
        round(avg("norm"), 4).as("avg_norm"),
        round(min("norm"), 4).as("min_norm"),
        round(max("norm"), 4).as("max_norm"))
      .orderBy("label")
  }

  val labelCentroidStatsSql: String =
    """SELECT label, count(*) AS n,
      |  round(avg(n0), 4) AS avg_norm,
      |  round(min(n0), 4) AS min_norm,
      |  round(max(n0), 4) AS max_norm
      |FROM (SELECT label,
      |        sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS n0
      |      FROM embeddings)
      |GROUP BY label ORDER BY label""".stripMargin

  val all: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "ann_brute_force" -> (annBruteForce _, annBruteForceSql),
    "sim_label_norms" -> (labelCentroidStats _, labelCentroidStatsSql),
  )
}
