package graft.operators

import graft.readstat.SparkTestBase
import org.apache.spark.sql.functions._

/** KMV distinct sketch: exact below capacity, bounded error above,
  * deterministic under repartition, buffer roundtrip. */
class KmvSpec extends SparkTestBase {

  import spark.implicits._

  private def estimate(values: Seq[Long], k: Int, parts: Int): (Long, Boolean, Int) =
    values.toDF("v").repartition(parts)
      .agg(KmvDistinct(col("v"), k).as("s"))
      .select($"s.estimate", $"s.is_exact", $"s.kept")
      .as[(Long, Boolean, Int)].collect().head

  test("distinct below k is exact, flagged exact, any partitioning") {
    val values = (0 until 5000).map(i => (i % 97).toLong)
    for (parts <- Seq(1, 7)) {
      val (est, exact, kept) = estimate(values, k = 256, parts = parts)
      assert(est == 97L && exact && kept == 97)
    }
  }

  test("approximate regime: ~1/sqrt(k) relative error, deterministic") {
    val values = (0L until 200000L)
    val runs = Seq(1, 8).map(p => estimate(values, k = 1024, parts = p))
    // deterministic: the hash is fixed, merge is set-union — partition
    // layout cannot change the k minimum hashes
    assert(runs.distinct.size == 1)
    val (est, exact, kept) = runs.head
    assert(!exact && kept == 1024)
    val rel = math.abs(est - 200000.0) / 200000.0
    // 3 standard errors at k=1024 is ~9.4%
    assert(rel < 0.094, s"estimate $est relative error $rel")
  }

  test("nulls are ignored like COUNT(DISTINCT)") {
    val df = Seq[Option[Long]](Some(1L), None, Some(2L), None, Some(1L))
      .toDF("v")
    val (est, exact, _) = df.agg(KmvDistinct(col("v"), 64).as("s"))
      .select($"s.estimate", $"s.is_exact", $"s.kept")
      .as[(Long, Boolean, Int)].collect().head
    assert(est == 2L && exact)
  }

  test("sketch-column algebra: per-group sketches merged == single pass") {
    // approximate regime on purpose: k=1024 with 200k distinct values
    // split across 7 groups — union-then-trim must reconstruct exactly
    // the k global minima a single pass would keep
    val df = (0L until 200000L).map(v => (v % 7, v)).toDF("g", "v")
      .repartition(8)
    val merged = df.groupBy("g")
      .agg(KmvSketchAgg(col("v"), 1024).as("sk"))
      .agg(KmvMerge(col("sk"), 1024).as("s"))
      .select($"s.estimate", $"s.is_exact", $"s.kept")
      .as[(Long, Boolean, Int)].collect().head
    val single = df.agg(KmvDistinct(col("v"), 1024).as("s"))
      .select($"s.estimate", $"s.is_exact", $"s.kept")
      .as[(Long, Boolean, Int)].collect().head
    assert(merged == single, s"merged $merged vs single-pass $single")
  }

  test("buffer serialization roundtrip preserves the sketch") {
    val buf = new KmvBuffer(16)
    (0 until 1000).foreach(i => buf.add(i.toLong * 7919 - 500000))
    val back = KmvBuffer.fromBytes(buf.toBytes)
    assert(back.k == buf.k)
    assert(back.sortedHashes.toSeq == buf.sortedHashes.toSeq)
  }

  test("merge is union-then-trim: merged sketch equals single-pass sketch") {
    val a = new KmvBuffer(32)
    val b = new KmvBuffer(32)
    val whole = new KmvBuffer(32)
    val xs = (0 until 5000).map(i => (i * 2654435761L) ^ (i << 17))
    xs.zipWithIndex.foreach { case (x, i) =>
      (if (i % 2 == 0) a else b).add(x); whole.add(x)
    }
    a.mergeIn(b)
    assert(a.sortedHashes.toSeq == whole.sortedHashes.toSeq)
  }
}
