package graft.operators

import graft.functions.WinnowSketch
import graft.readstat.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins the one-pass [[WinnowSketch]] expression to the declarative
  * formulation it replaced (explode positions → md5(substring) → min
  * over a w-row window → distinct), which is also exactly what the
  * DuckDB oracle runs for the winnow queries.
  */
class WinnowSketchSpec extends SparkTestBase {

  /** The original window-function winnowing plan (the oracle's shape). */
  private def windowSketch(df: DataFrame, k: Int, w: Int): DataFrame = {
    val win = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.currentRow, w - 1)
    // filter length >= k first: Spark's sequence(1, 0) DESCENDS to [1, 0],
    // so without the guard a doc shorter than k emits two partial-gram
    // rows (harmless at w > 2 where the full-window filter kills them,
    // visible at w <= 2; DuckDB's generate_series(1, 0) is empty, so the
    // guard is the oracle's semantics)
    df.filter(length(col("text")) >= k)
      .select(col("doc_id"), col("text"),
        explode(expr(s"sequence(1, greatest(length(text) - ${k - 1}, 0))"))
          .as("pos"))
      .select(col("doc_id"), col("pos"),
        md5(expr(s"substring(text, pos, $k)")).as("h"))
      .withColumn("mh", min("h").over(win))
      .withColumn("full", count(lit(1)).over(win))
      .filter(col("full") === w)
      .groupBy("doc_id")
      .agg(sort_array(collect_set("mh")).as("sketch"))
  }

  private def exprSketch(df: DataFrame, k: Int, w: Int): DataFrame =
    df.select(col("doc_id"), WinnowSketch(col("text"), k, w).as("sketch"))
      .filter(size(col("sketch")) > 0)

  private def assertAgree(df: DataFrame, k: Int, w: Int): Unit = {
    val want = windowSketch(df, k, w).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val got = exprSketch(df, k, w).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got.keySet == want.keySet,
      s"k=$k w=$w docs differ: ${got.keySet.diff(want.keySet)} / ${want.keySet.diff(got.keySet)}")
    want.foreach { case (id, sk) =>
      assert(got(id) == sk, s"k=$k w=$w doc $id: ${got(id)} vs $sk")
    }
  }

  test("matches the window formulation on random ASCII corpora at several (k, w)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // small alphabet so window minima collide and dedup paths are hit
    val docs = (1L to 60L).map { id =>
      val len = rnd.nextInt(120) // includes 0 and shorter-than-window texts
      (id, (0 until len).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString)
    }.toDF("doc_id", "text")
    for ((k, w) <- Seq((8, 8), (3, 5), (1, 1), (5, 2)))
      assertAgree(docs, k, w)
  }

  test("matches the window formulation on multi-byte unicode text") {
    import spark.implicits._
    val docs = Seq(
      (1L, "日本語のテキストです。日本語のテキストです。追加の文。"),
      (2L, "naïve café déjà vu — naïve café déjà vu — ñandú"),
      (3L, "mixed ascii and 中文 characters mixed ascii and 中文"),
      (4L, "🙂🙃🙂🙃🙂🙃🙂🙃🙂🙃🙂🙃") // surrogate pairs
    ).toDF("doc_id", "text")
    assertAgree(docs, 4, 3)
    assertAgree(docs, 8, 8)
  }

  test("short, empty, and null texts produce empty/no sketches") {
    import spark.implicits._
    val docs = Seq((1L, Some("tiny")), (2L, Some("")), (3L, None))
      .toDF("doc_id", "text")
    // k=8,w=8 needs length >= 15: all three fall out, as in the window plan
    assert(exprSketch(docs, 8, 8).count() == 0L)
    val raw = docs.select(col("doc_id"),
      WinnowSketch(col("text"), 8, 8).as("sk")).collect()
    assert(raw.find(_.getLong(0) == 2L).get.getSeq[String](1).isEmpty)
    assert(raw.find(_.getLong(0) == 3L).get.isNullAt(1))
  }

  test("WinnowSpans positions match min(struct(hash, pos)) over the window") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val docs = (1L to 40L).map { id =>
      val len = rnd.nextInt(100)
      (id, (0 until len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
    }.toDF("doc_id", "text")
    for ((k, w) <- Seq((8, 8), (3, 4))) {
      val win = Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
      val want = docs.filter(length(col("text")) >= k)
        .select(col("doc_id"), col("text"),
          explode(expr(s"sequence(1, greatest(length(text) - ${k - 1}, 0))"))
            .as("pos"))
        .select(col("doc_id"), col("pos"),
          md5(expr(s"substring(text, pos, $k)")).as("h"))
        .withColumn("m", min(struct(col("h"), col("pos"))).over(win))
        .withColumn("full", count(lit(1)).over(win))
        .filter(col("full") === w)
        .select(col("doc_id"), col("m.h").as("mh"), col("m.pos").as("p"))
        .distinct()
        .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
      val got = docs
        .select(col("doc_id"),
          explode(graft.functions.WinnowSpans(col("text"), k, w)).as("f"))
        .select(col("doc_id"), col("f.mh"), col("f.pos"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
      assert(got == want, s"k=$k w=$w: ${got.diff(want)} / ${want.diff(got)}")
    }
  }

  test("sketch on real documents agrees with the window plan end-to-end") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    assertAgree(docs, 8, 8)
  }
}
