package graft.operators

import graft.readstat.SparkTestBase

/** Round-6 verdict: the winnow/shingle caches in Text.scala (and the
  * same pattern in MinHashLsh) leaked one persistent RDD per query —
  * bounded per query, unbounded per session. The fix replaced every
  * such cache with a repartition boundary whose shuffle outputs are
  * shared by all consumers via ReuseExchange. This spec pins the
  * invariant: running any text/dedup query leaves NOTHING persisted.
  */
class CacheHygieneSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("no persistent RDDs remain after any text/dedup query materializes") {
    // a clean slate in case an earlier suite in the same JVM cached
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    for ((name, (fn, _)) <- graft.queries.Text.all.toSeq.sortBy(_._1)) {
      fn(spark, sf).collect()
      val left = spark.sparkContext.getPersistentRDDs
      assert(left.isEmpty,
        s"query $name left ${left.size} persistent RDD(s): " +
          left.values.map(_.name).mkString(", "))
    }
  }

  test("no persistent RDDs remain after the minhash-LSH pipeline query") {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    graft.queries.Pipeline.all("dedup_minhash_lsh")._1(spark, sf).collect()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("EVERY SparkEntry query leaves the session cache-clean at sf0.001") {
    // session-lifetime invariant across the whole suite: operators may
    // cache DURING execution (Kmeans.fit, Graph CC) but must unpersist
    // before returning control — a leak here is unbounded in a
    // long-lived session serving many queries
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    val leaked = scala.collection.mutable.ArrayBuffer[String]()
    for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)) {
      try fn(spark, sf).collect()
      catch { case e: Throwable =>
        fail(s"query $name threw at sf0.001: ${e.getMessage}") }
      if (spark.sparkContext.getPersistentRDDs.nonEmpty) {
        leaked += name
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      }
    }
    assert(leaked.isEmpty, s"queries leaking persistent RDDs: $leaked")
  }

  test("winnow pair plan reuses the sketch exchange instead of recomputing it") {
    // under AQE exchange reuse happens at query-stage creation, so the
    // final (post-execution) plan is what shows the ReusedExchange nodes
    val df = graft.queries.Text.winnowPairs(spark, sf)
    df.collect()
    // the plan string appends AQE's "Initial Plan" section, which
    // reprints every exchange pre-reuse — only the final section counts
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val generates = "Generate explode\\(winnow_sketch".r.findAllIn(plan).size
    assert(plan.contains("ReusedExchange") && generates == 1,
      s"expected one sketch computation + reuse; " +
        s"sketch generated $generates times; reuse=${plan.contains("ReusedExchange")}")
  }
}
