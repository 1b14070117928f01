package graft.operators

import graft.functions.CharStats
import graft.operators.TextCuration
import graft.readstat.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Pins the one-pass [[CharStats]] expression (code-point count /
  * distinct / Shannon entropy) against hand-computed values and the
  * declarative explode-per-character formulation the DuckDB oracle
  * uses, plus [[TextCuration.shardAssign]]'s global-position contract.
  */
class CharStatsSpec extends SparkTestBase {

  private def stats(s: String): (Long, Long, Double) = {
    val df = spark.createDataFrame(Seq(Tuple1(s))).toDF("t")
      .select(CharStats(col("t")).as("st"))
      .select(col("st.n_cp"), col("st.n_distinct").cast("long"), col("st.entropy"))
    val r = df.collect()(0)
    (r.getLong(0), r.getLong(1), r.getDouble(2))
  }

  test("hand-computed entropies") {
    assert(stats("aaaa") == ((4L, 1L, 0.0)))
    assert(stats("ab") == ((2L, 2L, 1.0)))
    assert(stats("abcd") == ((4L, 4L, 2.0)))
    assert(stats("") == ((0L, 0L, 0.0)))
    val (n, d, e) = stats("aab")
    assert(n == 3L && d == 2L)
    // -(2/3 log2 2/3 + 1/3 log2 1/3)
    assert(math.abs(e - 0.9182958340544896) < 1e-12)
  }

  test("counts code points, not UTF-16 units or bytes") {
    // U+1F600 is a surrogate pair in UTF-16 and 4 bytes in UTF-8
    val (n, d, _) = stats("a😀a")
    assert(n == 3L && d == 2L)
  }

  test("null text yields null struct") {
    val df = spark.createDataFrame(Seq(Tuple1(Option.empty[String]))).toDF("t")
      .select(CharStats(col("t")).as("st"))
    assert(df.collect()(0).isNullAt(0))
  }

  test("matches the declarative explode formulation on random text") {
    val rnd = new scala.util.Random(7)
    val docs = (0 until 50).map { i =>
      (i.toLong, (0 until rnd.nextInt(200)).map(_ =>
        "abcdefg 01\n".charAt(rnd.nextInt(11))).mkString)
    }
    val df = spark.createDataFrame(docs).toDF("doc_id", "text")
      .filter(length(col("text")) > 0)
    val fast = df.select(col("doc_id"), CharStats(col("text")).as("st"))
      .select(col("doc_id"), col("st.n_cp").as("n_cp"),
        col("st.n_distinct").cast("long").as("n_distinct"),
        round(col("st.entropy"), 6).as("ent"))
    val tot = df.select(col("doc_id"),
      explode(split(col("text"), "")).as("ch"))
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
    val freq = df.select(col("doc_id"),
      explode(split(col("text"), "")).as("ch"))
      .groupBy("doc_id", "ch").agg(count(lit(1)).as("c"))
    val slow2 = freq.join(tot, "doc_id")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_distinct"), max("n").as("n_cp"),
        round(-sum((col("c") / col("n")) *
          log(2.0, col("c") / col("n"))), 6).as("ent"))
      .select(col("doc_id"), col("n_cp"), col("n_distinct"), col("ent"))
    val a = fast.orderBy("doc_id").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val b = slow2.orderBy("doc_id").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(a.toSeq == b.toSeq)
  }

  test("shardAssign: exact shard sizes, ragged tail, global positions") {
    val df = spark.range(0, 130).toDF("id")
    val out = TextCuration.shardAssign(df, "id", 50L).collect()
    assert(out.length == 130)
    val byShard = out.groupBy(_.getLong(1)).view.mapValues(_.length).toMap
    assert(byShard == Map(0L -> 50, 1L -> 50, 2L -> 30))
    // positions within each shard are 0..size-1 exactly once
    out.groupBy(_.getLong(1)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(2)).sorted.toSeq == (0L until rows.length).toSeq)
    }
    // the permutation is the md5 order
    val expected = (0L until 130L).sortBy(i => (
      java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString, i))
    val got = out.sortBy(r => (r.getLong(1), r.getLong(2))).map(_.getLong(0))
    assert(got.toSeq == expected)
  }
}
