package graft.operators

import java.nio.file.Files

import graft.readstat.SparkTestBase
import org.apache.spark.sql.functions._

/** Bucketed co-located join: writing both sides bucketed on the join
  * key lets Spark sort-merge join them with NO shuffle exchange — the
  * pre-partitioning strategy for fact-to-fact joins that are too big to
  * broadcast and re-run often enough to amortize the bucketed write
  * (the 100 TB answer to "this join shuffles both sides every night").
  *
  * This spec pins the property end-to-end: same bucket count on both
  * sides → zero Exchange operators in the join plan → same results as
  * the shuffled join.
  */
class BucketedJoinSpec extends SparkTestBase {

  import spark.implicits._

  test("equal-bucketed tables sort-merge join without any exchange") {
    val wh = Files.createTempDirectory("graft_bucketed").toString
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force SMJ so the exchange question is actually posed
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val facts = (1 to 10000).map(i => (i.toLong % 97, i.toLong)).toDF("k", "a")
      val dims = (1 to 5000).map(i => (i.toLong % 97, s"t$i")).toDF("k", "b")
      facts.write.bucketBy(8, "k").sortBy("k")
        .option("path", s"$wh/t_facts").saveAsTable("graft_bkt_facts")
      dims.write.bucketBy(8, "k").sortBy("k")
        .option("path", s"$wh/t_dims").saveAsTable("graft_bkt_dims")

      val joined = spark.table("graft_bkt_facts")
        .join(spark.table("graft_bkt_dims"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")

      // results identical to the plain (shuffling) join
      val expect = facts.join(dims, "k").count()
      assert(joined.count() == expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_facts")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_dims")
    }
  }
}
