package graft.readstat

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming WRITE path: `writeStream.foreachBatch` + append-mode
  * multiFile directories is this library's analog of the reference's
  * `sink_stata` (reference: crates/polars_readstat/src/pybindings.rs:951-1096)
  * — each micro-batch lands as new self-contained part files.
  *
  * Crash-safety contract under test: every part is written to a
  * same-directory `.inprogress` temp and atomically renamed into place
  * (AtomicFile), and readers filter `.inprogress` residue — so a reader
  * racing the stream (or surviving a writer crash) sees only complete
  * parts, never a half-written file. Delivery is at-least-once: a batch
  * retried after a crash mid-write re-appends under a fresh unique run
  * prefix (readers may then see duplicates; exactly-once needs
  * idempotent downstream dedup, e.g. on a key column).
  */
class StreamingWriteSpec extends SparkTestBase {

  test("MemoryStream -> foreachBatch append multiFile .dta: batches land as complete parts") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toFile
    dir.deleteOnExit()
    val sink = s"$dir/sink.dta"

    val input = MemoryStream[(Long, Double)]
    val query = input.toDF().toDF("id", "v").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.coalesce(1).write.format("readstat").mode("append")
          .option("multiFile", "true").save(sink)
      }
      .start()
    try {
      input.addData((1L, 1.0), (2L, 2.0), (3L, 3.0))
      query.processAllAvailable()
      // a reader racing the stream between batches sees ONLY complete
      // parts — and every file present is final-named (no .inprogress)
      val mid = spark.read.format("readstat").load(sink)
      assert(mid.count() == 3L)
      assert(new java.io.File(sink).listFiles()
        .forall(f => f.getName.matches("part-.*\\.dta")),
        new java.io.File(sink).listFiles().map(_.getName).mkString(","))

      input.addData((4L, 4.0), (5L, 5.0))
      query.processAllAvailable()
      val back = spark.read.format("readstat").load(sink)
      assert(back.count() == 5L)
      assert(back.agg(sum("v")).collect()(0).getDouble(0) == 15.0)
      // two batches -> two appended parts, each independently valid
      val parts = new java.io.File(sink).listFiles()
        .filter(_.getName.matches("part-.*\\.dta"))
      assert(parts.length == 2, parts.map(_.getName).mkString(","))
      assert(parts.forall(p =>
        spark.read.format("readstat").load(p.getAbsolutePath).count() > 0))
    } finally query.stop()

    // crashed-writer residue in the sink directory stays invisible to
    // readers (the stream's crash-safety story end-to-end)
    val residue = new java.io.File(sink, ".part-junk.dta.999.inprogress")
    java.nio.file.Files.write(residue.toPath, Array[Byte](1, 2, 3))
    assert(spark.read.format("readstat").load(sink).count() == 5L)
  }

  test("streamed roundtrip: stat-file landing zone in, foreachBatch stat sink out") {
    import spark.implicits._
    // end-to-end: a readstat STREAM source feeding a readstat sink —
    // files dropped into a landing zone flow through a transform into
    // an append-mode directory of parts
    val landing = java.nio.file.Files.createTempDirectory("graft_rt_in").toFile
    val out = java.nio.file.Files.createTempDirectory("graft_rt_out").toFile
    landing.deleteOnExit(); out.deleteOnExit()
    val sink = s"$out/curated.dta"
    Seq((1.0, "a"), (2.0, "b")).toDF("v", "s")
      .write.format("readstat").mode("overwrite").save(s"$landing/drop1.dta")
    val query = spark.readStream.format("readstat")
      .schema(org.apache.spark.sql.types.StructType.fromDDL("v DOUBLE, s STRING"))
      .load(landing.getAbsolutePath)
      .filter(col("v") > 1.0)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          batch.coalesce(1).write.format("readstat").mode("append")
            .option("multiFile", "true").save(sink)
      }
      .start()
    try {
      query.processAllAvailable()
      Seq((3.0, "c"), (0.5, "d")).toDF("v", "s")
        .write.format("readstat").mode("overwrite").save(s"$landing/drop2.dta")
      query.processAllAvailable()
      val back = spark.read.format("readstat").load(sink)
      assert(back.count() == 2L)
      assert(back.select("s").as[String].collect().toSet == Set("b", "c"))
    } finally query.stop()
  }
}
