package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.readstat.SparkTestBase
import graft.spark.{GraftExtensions, GraftFunctions}

/** The SQL surface (GraftExtensions / GraftFunctions) must produce
  * bit-identical results to the Scala Column API for every registered
  * function, both when registered imperatively and when injected through
  * the standard spark.sql.extensions session-build path. */
class GraftExtensionsSpec extends SparkTestBase {

  private def vecs(s: SparkSession) = {
    import s.implicits._
    (0 until 20).map { i =>
      val rnd = new java.util.Random(i)
      (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("hyperplane_signature SQL matches the Column API") {
    GraftFunctions.register(spark)
    vecs(spark).createOrReplaceTempView("ext_vecs")
    val viaSql = spark.sql(
      "SELECT vec_id, hyperplane_signature(embedding, 16, 8, 42) AS sig " +
      "FROM ext_vecs ORDER BY vec_id").collect()
    val planes = graft.operators.AnnLsh.hyperplanes(16, 8, 42L)
    val viaApi = vecs(spark)
      .select(col("vec_id"),
        graft.functions.HyperplaneSignature(col("embedding"), planes).as("sig"))
      .orderBy("vec_id").collect()
    assert(viaSql.map(_.getLong(1)).toSeq == viaApi.map(_.getLong(1)).toSeq)
    // signatures must not be degenerate (all zero / all equal)
    assert(viaSql.map(_.getLong(1)).distinct.length > 1)
  }

  test("unicode_normalize SQL matches the Column API and defaults to NFC") {
    import spark.implicits._
    GraftFunctions.register(spark)
    Seq("Cafe\u0301", "\ufb01le").toDF("s").createOrReplaceTempView("ext_norm")
    val rows = spark.sql(
      "SELECT unicode_normalize(s) AS nfc, unicode_normalize(s, 'NFKC') AS nfkc " +
      "FROM ext_norm ORDER BY s").collect()
    val byNfc = rows.map(r => (r.getString(0), r.getString(1)))
    assert(byNfc.contains(("Caf\u00e9", "Caf\u00e9")))
    assert(byNfc.contains(("\ufb01le", "file")))
  }

  test("minhash_signature SQL aggregate matches the Column API") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "entirely different words live in this one"))
      .toDF("doc_id", "text")
    val sh = graft.operators.MinHashLsh.shingles(docs, "doc_id", "text")
    sh.createOrReplaceTempView("ext_shingles")
    val viaSql = spark.sql(
      "SELECT doc_id, minhash_signature(shingle, 32) AS sig " +
      "FROM ext_shingles GROUP BY doc_id ORDER BY doc_id").collect()
    val viaApi = sh.groupBy("doc_id")
      .agg(graft.functions.MinHashSignature(col("shingle"), 32).as("sig"))
      .orderBy("doc_id").collect()
    val sqlSigs = viaSql.map(_.getSeq[Long](1).toSeq).toSeq
    val apiSigs = viaApi.map(_.getSeq[Long](1).toSeq).toSeq
    assert(sqlSigs == apiSigs)
    // near-dup docs 1/2 share most minima; doc 3 shares almost none
    val shared12 = sqlSigs(0).zip(sqlSigs(1)).count { case (a, b) => a == b }
    val shared13 = sqlSigs(0).zip(sqlSigs(2)).count { case (a, b) => a == b }
    assert(shared12 > shared13)
  }

  test("winnow_sketch / winnow_spans / hashed_bigram_histogram SQL match the Column API") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox naps all day long"),
      (3L, "completely different content here")
    ).toDF("doc_id", "text")
    docs.createOrReplaceTempView("ext_docs")

    val skSql = spark.sql(
      "SELECT doc_id, winnow_sketch(text, 8, 8) AS sk FROM ext_docs ORDER BY doc_id")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1))
    val skApi = docs
      .select(col("doc_id"), graft.functions.WinnowSketch(col("text"), 8, 8).as("sk"))
      .orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getSeq[String](1))
    assert(skSql.toSeq == skApi.toSeq)
    assert(skSql.exists(_._2.nonEmpty))

    val spSql = spark.sql(
      "SELECT doc_id, size(winnow_spans(text, 8, 8)) AS n FROM ext_docs ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val spApi = docs
      .select(col("doc_id"),
        size(graft.functions.WinnowSpans(col("text"), 8, 8)).as("n"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(spSql.toSeq == spApi.toSeq)

    val hSql = spark.sql(
      "SELECT doc_id, hashed_bigram_histogram(split(trim(text), '\\\\s+'), 32) AS h " +
      "FROM ext_docs ORDER BY doc_id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1))
    val hApi = docs
      .select(col("doc_id"), graft.functions.HashedBigramHistogram(
        split(trim(col("text")), "\\s+"), 32).as("h"))
      .orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getSeq[Long](1))
    assert(hSql.toSeq == hApi.toSeq)
    assert(hApi.forall { case (_, h) => h.length == 32 && h.sum > 0 })

    val csSql = spark.sql(
      "SELECT doc_id, char_stats(text).n_cp AS n, char_stats(text).entropy AS e " +
      "FROM ext_docs ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val csApi = docs
      .select(col("doc_id"), graft.functions.CharStats(col("text")).as("st"))
      .select(col("doc_id"), col("st.n_cp"), col("st.entropy"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(csSql.toSeq == csApi.toSeq)
    assert(csApi.forall(_._3 > 0.0))
  }

  test("spark.sql.extensions injection path registers the functions") {
    // a session already exists for this JVM's SparkContext, so build a
    // second session against the same context with the extension applied;
    // restore the shared session as active afterwards
    val base = spark
    try {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      val withExt = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      try {
        vecs(withExt).createOrReplaceTempView("ext_vecs2")
        val n = withExt.sql(
          "SELECT count(DISTINCT hyperplane_signature(embedding, 12, 8)) " +
          "FROM ext_vecs2").collect()(0).getLong(0)
        assert(n > 1)
      } finally {
        // the new session shares the SparkContext — do NOT stop() it
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
      }
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("sketch aggregates from SQL match the Column API exactly") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = (0 until 5000).map(i => (s"g${i % 3}", (i % 97).toLong))
      .toDF("g", "v")
    df.createOrReplaceTempView("ext_sketch")

    val kmvSql = spark.sql(
      """SELECT g, kmv_distinct(v, 256).estimate AS est,
        |       CAST(kmv_distinct(v, 256).is_exact AS INT) AS ex
        |FROM ext_sketch GROUP BY g ORDER BY g""".stripMargin).collect()
    val kmvApi = df.groupBy("g")
      .agg(KmvDistinct(col("v"), 256).as("s"))
      .select(col("g"), col("s.estimate"), col("s.is_exact").cast("int"))
      .orderBy("g").collect()
    assert(kmvSql.map(r => (r.getLong(1), r.getInt(2))).toSeq ==
      kmvApi.map(r => (r.getLong(1), r.getInt(2))).toSeq)

    // two-level sketch algebra from pure SQL
    val union = spark.sql(
      """SELECT kmv_merge(sk, 256).estimate AS est FROM (
        |  SELECT g, kmv_sketch(v, 256) AS sk FROM ext_sketch GROUP BY g)""".stripMargin)
      .collect()(0).getLong(0)
    assert(union == 97L, s"merged estimate $union")

    val ssSql = spark.sql(
      """SELECT e.key, e.count FROM (
        |  SELECT explode(space_saving_topk(CAST(v AS STRING), 256)) AS e
        |  FROM ext_sketch) ORDER BY e.count DESC, e.key LIMIT 5""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val ssApi = df.agg(SpaceSavingTopK(col("v").cast("string"), 256).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select($"e.key", $"e.count")
      .orderBy(col("count").desc, col("key")).limit(5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(ssSql == ssApi && ssSql.nonEmpty)

    // null inputs ignored through the SQL path too
    val withNulls = Seq[Option[Long]](Some(1L), None, Some(2L)).toDF("v")
    withNulls.createOrReplaceTempView("ext_nulls")
    assert(spark.sql("SELECT kmv_distinct(v, 64).estimate FROM ext_nulls")
      .collect()(0).getLong(0) == 2L)
  }
}
