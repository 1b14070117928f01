package graft.operators

import graft.readstat.SparkTestBase
import org.apache.spark.sql.functions._

/** Space-Saving sketch: exactness in the no-eviction regime, classic
  * error bounds in the approximate regime, distributed == local. */
class SpaceSavingSpec extends SparkTestBase {

  import spark.implicits._

  test("capacity >= distinct keys gives exact counts with zero error") {
    val data = (0 until 5000).map(i => s"k${i % 97}")
    val df = data.toDF("k").repartition(7)
    val got = df.agg(SpaceSavingTopK(col("k"), 256).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select($"e.key", $"e.count", $"e.err")
      .as[(String, Long, Long)].collect().toSeq
    val want = data.groupBy(identity).map { case (k, g) => (k, g.size.toLong, 0L) }
    assert(got.toSet == want.toSet)
    assert(got.forall(_._3 == 0L))
    // eval order is (count desc, key asc)
    assert(got == got.sortBy { case (k, c, _) => (-c, k) })
  }

  test("approximate regime: bounds hold and heavy keys are retained") {
    // Skewed stream: key i appears ~(4000 / (i+1)) times, 400 distinct
    val data = (0 until 400).flatMap(i => Seq.fill(4000 / (i + 1))(s"z$i"))
    val n = data.size.toLong
    val m = 32
    val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = data.toDF("k").repartition(5)
      .agg(SpaceSavingTopK(col("k"), m).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select($"e.key", $"e.count", $"e.err")
      .as[(String, Long, Long)].collect().toSeq
    assert(got.size <= m)
    got.foreach { case (k, c, e) =>
      val t = truth(k)
      assert(t <= c, s"$k: count $c must upper-bound true $t")
      assert(c - e <= t, s"$k: lower bound ${c - e} exceeds true $t")
    }
    // merged-summary error stays within the mergeable-summaries bound
    // (sum of per-partition N_i/m telescopes to N/m per merge level;
    // with one merge fan-in the practical bound is a small multiple)
    val maxErr = got.map(_._3).max
    assert(maxErr <= 4 * n / m, s"err $maxErr vs 4N/m ${4 * n / m}")
    // every key with true frequency > 2N/m must be present
    val heavy = truth.filter(_._2 > 2 * n / m).keySet
    val kept = got.map(_._1).toSet
    assert(heavy.subsetOf(kept), s"missing heavy keys ${heavy -- kept}")
  }

  test("serialization roundtrip preserves entries and floor") {
    val buf = new SpaceSavingBuffer(4)
    Seq("a", "b", "a", "c", "d", "e", "a", "f").foreach(buf.add)
    val back = SpaceSavingBuffer.fromBytes(buf.toBytes)
    assert(back.capacity == buf.capacity)
    assert(back.floor == buf.floor)
    assert(back.entries.map { case (k, v) => (k, v.toSeq) } ==
      buf.entries.map { case (k, v) => (k, v.toSeq) })
  }

  test("freq_heavy_hitters equals the exact group-by top-20 on testdata") {
    val d = "/root/testdata/sf0.001"
    val got = graft.queries.Analytics.heavyHitters(spark, d)
      .as[(String, Long, Long)].collect().toSeq
    val want = graft.queries.Tables.lineitem(spark, d)
      .groupBy(col("l_partkey").cast("string").as("key"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("key")).limit(20)
      .as[(String, Long)].collect().toSeq.map { case (k, c) => (k, c, 0L) }
    assert(got == want)
  }
}
