package graft.readstat

import org.apache.spark.sql.functions._

/** Reference `preserve_order` parity (PreserveOrderOpts, __init__.py:
  * "buffered" | "row_index" | "sort"). The Spark-native mapping:
  *
  *  - "buffered" = the default scan: partitions are ordered row ranges
  *    and Spark concatenates partition results in order, so a
  *    collect/write of an un-shuffled plan sees file order without any
  *    buffering step;
  *  - "row_index" = `rowIndexName` (unsorted batches + index column);
  *  - "sort" = `.orderBy(idx).drop(idx)` on top of `rowIndexName` —
  *    an explicit query-level sort, which is the honest Spark form of
  *    "restore order after a shuffle".
  *
  * This spec pins the first and third forms; row_index is covered by
  * the per-format row-index tests.
  */
class OrderPreservationSpec extends SparkTestBase {

  test("default scan preserves file order across many partitions") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_ord").toFile
    d.deleteOnExit()
    val path = s"${d.getAbsolutePath}/ord.dta"
    val n = 20000
    (0 until n).map(i => (i.toLong, i * 2.5)).toDF("id", "v")
      .coalesce(1).write.format("readstat").mode("overwrite").save(path)
    // force many scan partitions: ~24-byte rows, 4 KB target → ~100+
    val back = spark.read.format("readstat")
      .option("partitionTargetBytes", "4096").load(path)
    assert(back.rdd.getNumPartitions > 4, back.rdd.getNumPartitions)
    val ids = back.select("id").collect().map(_.getDouble(0).toLong)
    assert(ids.toSeq == (0L until n.toLong).toSeq,
      s"order broken: first diffs at ${ids.zipWithIndex.find { case (v, i) => v != i }}")
  }

  test("rowIndexName + orderBy restores order after a shuffle") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_ord2").toFile
    d.deleteOnExit()
    val path = s"${d.getAbsolutePath}/ord2.dta"
    val n = 5000
    (0 until n).map(i => (i.toLong, (i % 7).toLong)).toDF("id", "k")
      .coalesce(1).write.format("readstat").mode("overwrite").save(path)
    val back = spark.read.format("readstat")
      .option("partitionTargetBytes", "4096")
      .option("rowIndexName", "_idx").load(path)
    // a repartition destroys partition order; the index restores it
    val restored = back.repartition(8, col("k"))
      .orderBy("_idx").drop("k")
    val ids = restored.select("id").collect().map(_.getDouble(0).toLong)
    assert(ids.toSeq == (0L until n.toLong).toSeq)
  }
}
