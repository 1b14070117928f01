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

  /** Fixed-dimension dot product via the loop-codegen'd
    * [[graft.functions.DotProduct]]: left-to-right double summation
    * (bit-identical to the fold AND to the unrolled `element_at` chain
    * this replaced — the chain's ~200-node tree cost ~0.5 s of janino
    * compile per query; the loop's generated code is constant-size).
    * Higher-order lambdas (`aggregate`/`zip_with`) stay out of the hot
    * path: they are interpreted and ~30x slower in tight pairwise loops. */
  def dotUnrolled(a: Column, b: Column, dim: Int): Column =
    graft.functions.VecSim.dot(a, b, dim)

  def cosine(a: Column, b: Column): Column =
    dotD(a, b) / (sqrt(dotD(a, a)) * sqrt(dotD(b, b)))

  /** Codegen'd fixed-dimension cosine — identical value to [[cosine]]
    * (same left-to-right summation order); one fused loop computes
    * dot/norm/norm ([[graft.functions.CosineSim]]). */
  def cosineUnrolled(a: Column, b: Column, dim: Int): Column =
    graft.functions.VecSim.cosine(a, b, dim)

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

  /** IVF-style ANN: coarse quantization over K deterministic centroids
    * (the embeddings of vec_id < K — fixed anchors, so the oracle can
    * replay the exact same index), each corpus vector assigned to its
    * nearest centroid cell, queries probing their NPROBE nearest cells
    * and ranking exactly within them.
    *
    * Scale shape: cell assignment is a pure per-row argmax against the
    * K constant centroid vectors ([[graft.functions.NearestCentroid]],
    * arithmetic bit-identical to the join+max_by formulation) — the
    * corpus is never shuffled or row-multiplied for assignment; the
    * candidate join shuffles on cell id, so each query touches NPROBE/K
    * of the corpus instead of all of it — the standard trade that makes
    * billion-vector search tractable. LSH (AnnLsh) cuts by hyperplane
    * bucket; IVF cuts by Voronoi cell. */
  def annIvfTopK(s: SparkSession, d: String): DataFrame = {
    val K = 16
    val NPROBE = 4
    val e = embeddings(s, d)
    val cent = e.filter(col("vec_id") < K)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    // nearest-centroid cell per corpus vector (ties -> smallest cid):
    // the K anchors are collected once (cid 0..K-1 = array index) and
    // the assignment runs inside the scan, no join, no shuffle
    val centLocal: Array[Array[Double]] = cent.orderBy("cid").collect()
      .map(_.getSeq[Float](1).toArray.map(_.toDouble))
    val assigned = e.select(col("vec_id").as("nid"),
      col("embedding").as("cv"),
      graft.functions.NearestCentroid(col("embedding"), centLocal).as("cell"))
    // each query probes its NPROBE nearest cells
    val wProbe = Window.partitionBy("qid").orderBy(col("qsim").desc, col("cid"))
    val probes = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .join(broadcast(cent))
      .withColumn("qsim", cosineUnrolled(col("qv"), col("cvec"), EmbeddingDim))
      .withColumn("prn", row_number().over(wProbe))
      .filter(col("prn") <= NPROBE)
      .select(col("qid"), col("qv"), col("cid").as("cell"))
    // exact rank within the probed cells only
    val wTop = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid"))
    probes.join(assigned, "cell")
      .filter(col("qid") =!= col("nid"))
      .withColumn("sim", cosineUnrolled(col("qv"), col("cv"), EmbeddingDim))
      .withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= 5)
      .select(col("qid"), col("nid"), round(col("sim"), 4).as("sim"), col("rn"))
      .orderBy("qid", "rn")
  }

  val annIvfTopKSql: String =
    """WITH cent AS (
      |  SELECT vec_id AS cid, embedding::DOUBLE[] AS cvec
      |  FROM embeddings WHERE vec_id < 16),
      |corpus AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |asg AS (
      |  SELECT vec_id AS nid, v AS cv, cid AS cell FROM (
      |    SELECT c.vec_id, c.v, ct.cid,
      |      row_number() OVER (PARTITION BY c.vec_id ORDER BY
      |        list_dot_product(c.v, ct.cvec) /
      |          (sqrt(list_dot_product(c.v, c.v)) *
      |           sqrt(list_dot_product(ct.cvec, ct.cvec))) DESC, ct.cid) AS arn
      |    FROM corpus c, cent ct)
      |  WHERE arn = 1),
      |probes AS (
      |  SELECT qid, qv, cid AS cell FROM (
      |    SELECT q.vec_id AS qid, q.v AS qv, ct.cid,
      |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
      |        list_dot_product(q.v, ct.cvec) /
      |          (sqrt(list_dot_product(q.v, q.v)) *
      |           sqrt(list_dot_product(ct.cvec, ct.cvec))) DESC, ct.cid) AS prn
      |    FROM corpus q, cent ct WHERE q.vec_id < 10)
      |  WHERE prn <= 4),
      |ranked AS (
      |  SELECT qid, nid, sim,
      |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn
      |  FROM (
      |    SELECT p.qid, a.nid,
      |      list_dot_product(p.qv, a.cv) /
      |        (sqrt(list_dot_product(p.qv, p.qv)) *
      |         sqrt(list_dot_product(a.cv, a.cv))) AS sim
      |    FROM probes p JOIN asg a ON p.cell = a.cell
      |    WHERE p.qid <> a.nid))
      |SELECT qid, nid, round(sim, 4) AS sim, rn
      |FROM ranked WHERE rn <= 5
      |ORDER BY qid, rn""".stripMargin

  /** The TRAINED ANN pipeline end-to-end: [[graft.operators.Kmeans.fit]]
    * (deterministic — seeds are the K lowest-id vectors, exactly 3
    * Lloyd's rounds) feeding [[graft.operators.AnnIvf.topK]]. This is
    * the production shape (train once, search many) whose
    * fixed-anchor stand-in is [[annIvfTopK]]; here the oracle REPLAYS
    * the training itself as three chained CTE rounds (euclidean argmin
    * assignment → per-dimension mean, empty cells keep their seat) and
    * then replays the cosine cell search, so the whole trained pipeline
    * is hash-checked, not just the search half. Engine-order float
    * summation differences are absorbed by round(sim, 4). */
  def annIvfTrained(s: SparkSession, d: String): DataFrame = {
    val K = 8
    val e = embeddings(s, d)
    val (cents, _) = graft.operators.Kmeans.fit(
      e, "vec_id", "embedding", K, maxIter = 3)
    val centDf = graft.operators.AnnIvf.centroidsDF(s, cents)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding"))
    graft.operators.AnnIvf.topK(
        e.select(col("vec_id"), col("embedding")), q,
        "vec_id", "embedding", centDf, EmbeddingDim, k = 5, nprobe = 3)
      .withColumn("sim", round(col("sim"), 4))
      .orderBy("qid", "rn")
  }

  val annIvfTrainedSql: String = {
    // one Lloyd's round: euclidean argmin assignment against c$p, then
    // per-dimension means; a cell that captured nothing keeps its seat
    def round(p: Int, n: Int): String =
      s"""a$n AS (
         |  SELECT vec_id, v, cid FROM (
         |    SELECT c.vec_id, c.v, t.cid,
         |      row_number() OVER (PARTITION BY c.vec_id
         |        ORDER BY list_distance(c.v, t.cv), t.cid) AS rn
         |    FROM corpus c, c$p t) WHERE rn = 1),
         |m$n AS (
         |  SELECT cid, list(mx ORDER BY i) AS cv FROM (
         |    SELECT a.cid, i, avg(a.v[i]) AS mx
         |    FROM a$n a,
         |         LATERAL (SELECT unnest(generate_series(1, len(a.v))) AS i) g
         |    GROUP BY a.cid, i)
         |  GROUP BY cid),
         |c$n AS (
         |  SELECT s.cid, coalesce(m.cv, s.cv) AS cv
         |  FROM c$p s LEFT JOIN m$n m USING (cid))""".stripMargin
    s"""WITH corpus AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |c0 AS (
       |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv
       |  FROM (SELECT vec_id, v FROM corpus ORDER BY vec_id LIMIT 8)),
       |${round(0, 1)},
       |${round(1, 2)},
       |${round(2, 3)},
       |cent AS (SELECT cid, cv AS cvec FROM c3),
       |asg AS (
       |  SELECT vec_id AS nid, v AS cv, cid AS cell FROM (
       |    SELECT c.vec_id, c.v, ct.cid,
       |      row_number() OVER (PARTITION BY c.vec_id ORDER BY
       |        list_dot_product(c.v, ct.cvec) /
       |          (sqrt(list_dot_product(c.v, c.v)) *
       |           sqrt(list_dot_product(ct.cvec, ct.cvec))) DESC, ct.cid) AS arn
       |    FROM corpus c, cent ct)
       |  WHERE arn = 1),
       |probes AS (
       |  SELECT qid, qv, cid AS cell FROM (
       |    SELECT q.vec_id AS qid, q.v AS qv, ct.cid,
       |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |        list_dot_product(q.v, ct.cvec) /
       |          (sqrt(list_dot_product(q.v, q.v)) *
       |           sqrt(list_dot_product(ct.cvec, ct.cvec))) DESC, ct.cid) AS prn
       |    FROM corpus q, cent ct WHERE q.vec_id < 10)
       |  WHERE prn <= 3),
       |ranked AS (
       |  SELECT qid, nid, sim,
       |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn
       |  FROM (
       |    SELECT p.qid, a.nid,
       |      list_dot_product(p.qv, a.cv) /
       |        (sqrt(list_dot_product(p.qv, p.qv)) *
       |         sqrt(list_dot_product(a.cv, a.cv))) AS sim
       |    FROM probes p JOIN asg a ON p.cell = a.cell
       |    WHERE p.qid <> a.nid))
       |SELECT qid, nid, round(sim, 4) AS sim, rn
       |FROM ranked WHERE rn <= 5
       |ORDER BY qid, rn""".stripMargin
  }

  /** Cluster-balanced sampling: assign every vector to its nearest of K
    * fixed anchor centroids ([[graft.functions.NearestCentroid]], no
    * shuffle) and downsample each cell to the mean cell size with a
    * deterministic md5 keep — the embedding-space diversity balancer
    * (dominant modes thin out, rare modes survive whole) a pipeline
    * runs before pretraining on skewed corpora. Cell rates derive from
    * one K-row aggregate; the keep decision is a pure per-row
    * expression, stable under repartitioning and corpus growth. */
  def clusterBalance(s: SparkSession, d: String): DataFrame = {
    val K = 16
    val e = embeddings(s, d)
    val cent = e.filter(col("vec_id") < K)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val centLocal: Array[Array[Double]] = cent.orderBy("cid").collect()
      .map(_.getSeq[Float](1).toArray.map(_.toDouble))
    val assigned = e.select(col("vec_id"),
      graft.functions.NearestCentroid(col("embedding"), centLocal).as("cell"))
    val counts = assigned.groupBy("cell").agg(count(lit(1)).as("n_cell"))
    val total = assigned.agg(count(lit(1)).as("n_total"))
    val rates = counts.crossJoin(broadcast(total))
      .select(col("cell"),
        col("n_cell"),
        least(lit(1.0), (col("n_total").cast("double") / K) / col("n_cell"))
          .as("rate"))
    assigned.join(broadcast(rates), "cell")
      .select(col("vec_id"), col("cell"), col("n_cell"),
        round(col("rate"), 4).as("rate"),
        (graft.operators.TextCuration.hashBucket(col("vec_id")) <
          round(col("rate") * 100)).cast("int").as("keep"))
      .orderBy("vec_id")
  }

  val clusterBalanceSql: String =
    """WITH cent AS (
      |  SELECT vec_id AS cid, embedding::DOUBLE[] AS cvec
      |  FROM embeddings WHERE vec_id < 16),
      |corpus AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |asg AS (
      |  SELECT vec_id, cid AS cell FROM (
      |    SELECT c.vec_id, ct.cid,
      |      row_number() OVER (PARTITION BY c.vec_id ORDER BY
      |        list_dot_product(c.v, ct.cvec) /
      |          (sqrt(list_dot_product(c.v, c.v)) *
      |           sqrt(list_dot_product(ct.cvec, ct.cvec))) DESC, ct.cid) AS arn
      |    FROM corpus c, cent ct)
      |  WHERE arn = 1),
      |counts AS (SELECT cell, count(*) AS n_cell FROM asg GROUP BY cell),
      |tot AS (SELECT count(*) AS n_total FROM asg),
      |rates AS (
      |  SELECT cell, n_cell,
      |    least(1.0, (n_total / 16.0) / n_cell) AS rate
      |  FROM counts, tot)
      |SELECT a.vec_id, a.cell, r.n_cell, round(r.rate, 4) AS rate,
      |  CAST(((strpos('0123456789abcdef', substr(md5(CAST(a.vec_id AS VARCHAR)), 1, 1)) - 1) * 4096
      |      + (strpos('0123456789abcdef', substr(md5(CAST(a.vec_id AS VARCHAR)), 2, 1)) - 1) * 256
      |      + (strpos('0123456789abcdef', substr(md5(CAST(a.vec_id AS VARCHAR)), 3, 1)) - 1) * 16
      |      + (strpos('0123456789abcdef', substr(md5(CAST(a.vec_id AS VARCHAR)), 4, 1)) - 1)) % 100
      |    < round(r.rate * 100) AS INT) AS keep
      |FROM asg a JOIN rates r USING (cell)
      |ORDER BY a.vec_id""".stripMargin

  /** Scalar int8 quantization of the embedding corpus
    * ([[graft.operators.Quantize]]): per-dim global ranges → 0..255
    * codes. Verified down to every code byte (md5 over the per-vector
    * code sequence) plus the max reconstruction error — max, not mean,
    * because max is summation-order-independent and therefore exactly
    * reproducible across engines. */
  def embedQuantize(s: SparkSession, d: String): DataFrame =
    graft.operators.Quantize.encode(embeddings(s, d), "vec_id", "embedding")
      .groupBy("vec_id")
      .agg(count(lit(1)).as("n_dims"),
        md5(array_join(
          transform(array_sort(collect_list(struct(col("dim"), col("code")))),
            x => x.getField("code").cast("string")),
          ",")).as("codes_md5"),
        round(max("err"), 6).as("max_abs_err"))
      .orderBy("vec_id")

  val embedQuantizeSql: String =
    """WITH dims AS (
      |  SELECT vec_id, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS x
      |  FROM embeddings,
      |       LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i)),
      |ranges AS (SELECT dim, min(x) AS lo, max(x) AS hi FROM dims GROUP BY dim),
      |codes AS (
      |  SELECT d.vec_id, d.dim,
      |    CASE WHEN r.hi > r.lo
      |         THEN CAST(round((d.x - r.lo) / (r.hi - r.lo) * 255, 0) AS INT)
      |         ELSE 0 END AS code,
      |    abs(d.x - CASE WHEN r.hi > r.lo
      |         THEN r.lo + CAST(round((d.x - r.lo) / (r.hi - r.lo) * 255, 0) AS INT) / 255.0 * (r.hi - r.lo)
      |         ELSE r.lo END) AS err
      |  FROM dims d JOIN ranges r USING (dim))
      |SELECT vec_id, count(*) AS n_dims,
      |  md5(string_agg(CAST(code AS VARCHAR), ',' ORDER BY dim)) AS codes_md5,
      |  round(max(err), 6) AS max_abs_err
      |FROM codes GROUP BY vec_id ORDER BY vec_id""".stripMargin

  /** k-NN majority-vote classification: predict each held-out query
    * vector's label from its 10 nearest corpus neighbors (cosine) — the
    * standard embedding-quality evaluation a pipeline runs after
    * training an encoder. Ties break toward the smallest label.
    *
    * Scale shape: same as [[annBruteForce]] — the held-out query set
    * broadcasts (driver-sized by construction), the corpus side stays
    * partitioned, per-query top-k is a window over the query key, and
    * the vote count is a tiny (queries × labels) aggregate. For
    * corpus-sized query sets the LSH/IVF paths replace the exact join.
    */
  def knnClassify(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("label").as("true_label"),
        col("embedding").as("qv"))
    val c = e.filter(col("vec_id") >= 20)
      .select(col("vec_id").as("nid"), col("label").as("nlabel"),
        col("embedding").as("cv"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid"))
    val votes = c.join(broadcast(q))
      .withColumn("sim", cosineUnrolled(col("qv"), col("cv"), EmbeddingDim))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .groupBy("qid", "true_label", "nlabel")
      .agg(count(lit(1)).as("votes"))
    val wv = Window.partitionBy("qid").orderBy(col("votes").desc, col("nlabel"))
    votes.withColumn("vr", row_number().over(wv))
      .filter(col("vr") === 1)
      .select(col("qid"), col("true_label"), col("nlabel").as("pred_label"),
        col("votes"),
        (col("nlabel") === col("true_label")).cast("int").as("correct"))
      .orderBy("qid")
  }

  val knnClassifySql: String =
    """WITH q AS (SELECT vec_id AS qid, label AS true_label,
      |                  embedding::DOUBLE[] AS qv
      |           FROM embeddings WHERE vec_id < 20),
      |c AS (SELECT vec_id AS nid, label AS nlabel, embedding::DOUBLE[] AS cv
      |      FROM embeddings WHERE vec_id >= 20),
      |ranked AS (
      |  SELECT qid, true_label, nid, nlabel,
      |    row_number() OVER (PARTITION BY qid ORDER BY
      |      list_dot_product(qv, cv) /
      |        (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
      |      DESC, nid) AS rn
      |  FROM q, c),
      |votes AS (
      |  SELECT qid, true_label, nlabel, CAST(count(*) AS BIGINT) AS votes
      |  FROM ranked WHERE rn <= 10 GROUP BY 1, 2, 3),
      |best AS (
      |  SELECT qid, true_label, nlabel, votes,
      |         row_number() OVER (PARTITION BY qid ORDER BY votes DESC, nlabel) AS vr
      |  FROM votes)
      |SELECT qid, true_label, nlabel AS pred_label, votes,
      |       CAST(nlabel = true_label AS INT) AS correct
      |FROM best WHERE vr = 1 ORDER BY qid""".stripMargin

  /** Recall@5 of the IVF index against exact brute force, per query —
    * the evaluation loop every ANN deployment runs to tune K/NPROBE
    * before committing to an index layout. Composes the two existing
    * queries; recall = |ivf top-5 ∩ exact top-5| / 5.
    *
    * Scale shape: inherits both inputs' shapes (broadcast query set,
    * cell-pruned candidate join); the eval join itself is on
    * (qid, nid) — output-of-top-k sized, i.e. tiny — and aggregates to
    * one row per query. At 100 TB this runs on a sampled query set
    * while the corpus-side work stays identical to the production
    * search path, so measured recall transfers. */
  def annRecallEval(s: SparkSession, d: String): DataFrame = {
    val exact = annBruteForce(s, d).select(col("qid"), col("nid"))
    val approx = annIvfTopK(s, d)
      .select(col("qid").as("aqid"), col("nid").as("anid"))
    exact.join(approx,
        col("qid") === col("aqid") && col("nid") === col("anid"), "left")
      .groupBy("qid")
      .agg(count(lit(1)).as("n_exact"), count(col("anid")).as("n_hit"))
      .withColumn("recall", round(col("n_hit") / col("n_exact"), 4))
      .orderBy("qid")
  }

  val annRecallEvalSql: String =
    s"""WITH exact AS (
       |  SELECT qid, nid FROM (
       |${annBruteForceSql.linesIterator.map("    " + _).mkString("\n")}
       |  )),
       |approx AS (
       |  SELECT qid AS aqid, nid AS anid FROM (
       |${annIvfTopKSql.linesIterator.map("    " + _).mkString("\n")}
       |  ))
       |SELECT e.qid, count(*) AS n_exact, count(a.anid) AS n_hit,
       |       round(count(a.anid) / count(*), 4) AS recall
       |FROM exact e LEFT JOIN approx a ON e.qid = a.aqid AND e.nid = a.anid
       |GROUP BY e.qid ORDER BY e.qid""".stripMargin

  /** Sparse term-frequency cosine near-dup pairs over the documents
    * table — the LEXICAL counterpart of [[annBruteForce]]'s dense
    * embedding cosine: each doc is its tf vector over lowercased
    * whitespace tokens, pairs are found through an inverted index on
    * shared terms, and cos = Σ tfₐ·tf_b / (‖a‖·‖b‖) ≥ 0.85 is exact.
    *
    * Scale shape: the postings self-join is the same skew surface as
    * `dedup_ngram_jaccard` — a term shared by df docs contributes df²
    * candidate rows — so terms with df outside [2, 450] are dropped
    * BEFORE the join: df=1 cannot pair, and the high-df band (stopwords,
    * template boilerplate) is both the entire quadratic blow-up and the
    * least discriminative signal. The cap bounds join volume by
    * cap · Σdf (linear in corpus size per unit cap); at larger corpora
    * the cap stays a fixed small fraction of N, exactly like PPJoin's
    * prefix bound, and the cost-based prefix-filter branch of the
    * jaccard op applies unchanged if the capped join still skews.
    * Determinism: dot and squared norms are INTEGER sums (order-free);
    * sqrt/divide are pointwise IEEE on those exact integers, identical
    * in both engines. */
  def sparseCosinePairs(s: SparkSession, d: String): DataFrame = {
    val tf = documents(s, d)
      .select(col("doc_id"),
        explode(split(trim(col("text")), graft.queries.Tables.Ws)).as("w0"))
      .select(col("doc_id"), lower(col("w0")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    // repartition boundary: `kept` feeds the per-term doc-set
    // aggregation AND the norm aggregate; keyed on w so both consumers
    // read one shuffle instead of recomputing the tf/df subtree
    val kept = tf.join(
      tf.groupBy("w").agg(count(lit(1)).as("df"))
        .where(col("df").between(2, 450)).select("w"), "w")
      .repartition(col("w"))
    val norms = kept.groupBy("doc_id")
      .agg(sqrt(sum(col("tf") * col("tf"))).as("nrm"))
    // r15: per-term doc-set expansion replaces the postings SELF-JOIN —
    // the Text.pairCountsViaDocSets move, carrying tf through the
    // explosion so x.tf * y.tf is computed in place. Safe to collect:
    // df is capped at 450 BEFORE this aggregation, so each list is
    // bounded. sort_array orders the structs by doc_id (unique within a
    // term), and the strictly-later slice reproduces the
    // a.doc_id < b.doc_id join condition exactly; the integer partial
    // dots then sum order-free, so values are bit-identical.
    val dot = kept
      .groupBy("w")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("tf")))).as("ds"))
      .filter(size(col("ds")) > 1)
      .select(explode(expr(
        "flatten(transform(ds, (x, i) -> transform(" +
          "slice(ds, i + 2, size(ds) - i - 1), " +
          "y -> struct(x.doc_id AS a, y.doc_id AS b, x.tf * y.tf AS p))))")).as("e"))
      .groupBy(col("e.a").as("id_a"), col("e.b").as("id_b"))
      .agg(sum(col("e.p")).as("dot"))
    dot
      .join(norms.select(col("doc_id").as("id_a"), col("nrm").as("na")), "id_a")
      .join(norms.select(col("doc_id").as("id_b"), col("nrm").as("nb")), "id_b")
      .withColumn("cos", col("dot") / (col("na") * col("nb")))
      .where(col("cos") >= 0.85)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
      .orderBy("id_a", "id_b")
  }

  val sparseCosinePairsSql: String =
    """WITH tok AS (
      |  SELECT doc_id, lower(arr[i]) AS w
      |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS arr
      |        FROM documents),
      |       LATERAL (SELECT unnest(generate_series(1, len(arr))) AS i)),
      |tf AS (SELECT doc_id, w, count(*) AS tf FROM tok GROUP BY 1, 2),
      |dfc AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
      |kept AS (
      |  SELECT t.doc_id, t.w, t.tf FROM tf t JOIN dfc USING (w)
      |  WHERE df BETWEEN 2 AND 450),
      |norms AS (SELECT doc_id, sqrt(sum(tf * tf)) AS nrm FROM kept GROUP BY 1),
      |dot AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, sum(a.tf * b.tf) AS dot
      |  FROM kept a JOIN kept b ON a.w = b.w AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT id_a, id_b, round(dot / (na.nrm * nb.nrm), 4) AS cos
      |FROM dot
      |JOIN norms na ON na.doc_id = id_a
      |JOIN norms nb ON nb.doc_id = id_b
      |WHERE dot / (na.nrm * nb.nrm) >= 0.85
      |ORDER BY id_a, id_b""".stripMargin

  val all: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "sim_sparse_cosine" -> (sparseCosinePairs _, sparseCosinePairsSql),
    "ann_recall_eval" -> (annRecallEval _, annRecallEvalSql),
    "ann_brute_force" -> (annBruteForce _, annBruteForceSql),
    "embed_knn_classify" -> (knnClassify _, knnClassifySql),
    "ann_ivf_topk" -> (annIvfTopK _, annIvfTopKSql),
    "ann_ivf_trained" -> (annIvfTrained _, annIvfTrainedSql),
    "sample_cluster_balance" -> (clusterBalance _, clusterBalanceSql),
    "sim_label_norms" -> (labelCentroidStats _, labelCentroidStatsSql),
    "embed_quantize" -> (embedQuantize _, embedQuantizeSql),
  )
}
