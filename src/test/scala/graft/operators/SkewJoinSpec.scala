package graft.operators

import graft.readstat.SparkTestBase
import org.apache.spark.sql.functions._

/** Salted skew-join: result parity with the plain join across the
  * supported join types on a deliberately skewed key distribution, plus
  * the plan property that makes it worth having (the shuffle key
  * carries the salt).
  */
class SkewJoinSpec extends SparkTestBase {

  import spark.implicits._

  // 1 hot key with 5k rows + 100 cold keys; right side has matches for
  // the hot key and half the cold keys, plus a right-only key
  private def skewed = {
    val left = ((1 to 5000).map(i => ("hot", i.toLong)) ++
      (1 to 100).flatMap(k => Seq((s"cold$k", k.toLong)))).toDF("k", "v")
    val right = (Seq(("hot", "H")) ++
      (1 to 50).map(k => (s"cold$k", s"C$k")) ++
      Seq(("rightonly", "R"))).toDF("k", "tag")
    (left, right)
  }

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  test("salted join matches the plain join for every supported type") {
    val (left, right) = skewed
    for (tpe <- Seq("inner", "left", "left_semi", "left_anti")) {
      val plain = left.join(right, Seq("k"), tpe)
      val salted = SkewJoin.salted(left, right, Seq("k"), salt = 7, joinType = tpe)
      assert(salted.columns.toSeq == plain.columns.toSeq, s"$tpe: columns")
      assert(sortedRows(salted) == sortedRows(plain), s"$tpe: rows differ")
    }
  }

  test("unsupported right-replicating join types are rejected") {
    val (left, right) = skewed
    intercept[IllegalArgumentException] {
      SkewJoin.salted(left, right, Seq("k"), salt = 4, joinType = "right")
    }
    intercept[IllegalArgumentException] {
      SkewJoin.salted(left, right, Seq("k"), salt = 4, joinType = "full_outer")
    }
  }

  test("the join's own shuffle partitions on (key, salt), spreading the hot key") {
    val (left, right) = skewed
    // disable broadcast: the operator's target regime is a right side
    // too big to broadcast, where the join must SHUFFLE on (key, salt) —
    // with the 51-row test dim Spark would otherwise broadcast and plan
    // no exchange at all
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val plan = try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      SkewJoin.salted(left, right, Seq("k"), salt = 7)
        .queryExecution.executedPlan.toString
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    // the actual join plan must shuffle on BOTH key and salt — a
    // regression to joining on the key alone (or losing the salt from
    // the partitioning) would pass a mere column-presence check
    assert("hashpartitioning\\(k#\\d+L?, __salt#\\d+".r.findFirstIn(plan).isDefined,
      s"join does not partition on (k, __salt):\n$plan")
    // empirically: hot-key rows (distinct payloads) land on >1 partition
    // under the operator's content-hash salt. Explicit partition count:
    // AQE would coalesce this tiny shuffle to one partition
    val parts = left.withColumn("__salt",
        pmod(hash(left.columns.map(col).toIndexedSeq: _*), lit(7)))
      .repartition(8, col("k"), col("__salt"))
      .filter(col("k") === "hot")
      .select(spark_partition_id().as("p")).distinct().count()
    assert(parts > 1, s"hot key stayed on $parts partition(s)")
  }
}
