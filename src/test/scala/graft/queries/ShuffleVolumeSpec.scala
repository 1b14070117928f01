package graft.queries

import java.util.concurrent.atomic.AtomicLong

import graft.readstat.SparkTestBase
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Quantitative pinning of SCALING.md's shuffle claims: "only the
  * 16-byte hashes shuffle" is a measurable statement, not prose. A
  * stage listener sums shuffle-WRITE bytes across a query's execution;
  * the bounds below are an order of magnitude under what shuffling the
  * corpus text itself would cost at sf0.01 (~4 MB of document text,
  * ~25 MB of lineitem), so a regression that starts shuffling payload
  * columns trips the assert long before it matters at 100 TB.
  */
class ShuffleVolumeSpec extends SparkTestBase {

  // NOTE: counts are session-global, which is safe because forked sbt
  // test JVMs run suites sequentially (Test/fork := true without
  // testForkedParallel) — revisit the listener scoping if that changes.

  private val sf = "/root/testdata/sf0.01"

  /** Total shuffle bytes written while `action` runs (listener events
    * are async — polls until the counter stabilizes). */
  private def shuffleBytesOf(action: => Unit): Long = {
    val acc = new AtomicLong
    val listener = new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        acc.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      action
      var last = -1L
      var stable = 0
      var waited = 0
      while (stable < 2 && waited < 50) {
        Thread.sleep(100)
        waited += 1
        val now = acc.get()
        if (now == last) stable += 1 else { stable = 0; last = now }
      }
      acc.get()
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("dedup_exact shuffles fingerprints, never document text") {
    val bytes = shuffleBytesOf {
      spark.catalog.clearCache()
      Text.dedupExact(spark, sf).count()
    }
    // 500 (fp, count) rows: ~50 KB with task framing; the text is ~4 MB
    assert(bytes < 512 * 1024, s"dedup_exact shuffled $bytes bytes")
    assert(bytes > 0, "no shuffle recorded — listener broken?")
  }

  test("q1_agg shuffles group keys only, never lineitem rows") {
    val bytes = shuffleBytesOf {
      spark.catalog.clearCache()
      Relational.q1Agg(spark, sf).count()
    }
    // 6 groups x partial aggregates per map task; lineitem is ~25 MB
    assert(bytes < 512 * 1024, s"q1_agg shuffled $bytes bytes")
    assert(bytes > 0)
  }

  test("context-window chunking's only shuffle is the verification sort") {
    val bytes = shuffleBytesOf {
      spark.catalog.clearCache()
      // collect() executes the full plan including the ORDER BY (count()
      // would let Spark drop the sort); output is metadata-only rows
      // (doc_id, idx, len, fp) — never the chunk text
      Text.chunkWindows(spark, sf).collect()
    }
    assert(bytes < 1024 * 1024, s"chunk_windows shuffled $bytes bytes")
  }
}
