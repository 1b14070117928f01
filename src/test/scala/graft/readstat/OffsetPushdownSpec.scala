package graft.readstat

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

/** OFFSET pushdown (r13, SURVEY §2.2 "Offset/slice read" — the
  * reference's `with_offset`, reader.rs:230-233, exposed through DSv2
  * `SupportsPushDownOffset` instead of a private option): for formats
  * whose rows seek in O(1) (dta, xpt, uncompressed sav), the scan plans
  * partitions starting AT the offset row, so `df.offset(n)` pagination
  * reads zero bytes of the skipped prefix. Compressed/sequential
  * regimes refuse the push and keep Catalyst's Offset operator —
  * results must be identical either way.
  */
class OffsetPushdownSpec extends SparkTestBase {

  private lazy val dir = {
    val d = Files.createTempDirectory("graft_off").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def write(fmt: String, n: Int): String = {
    import spark.implicits._
    val p = s"$dir/t$n.$fmt"
    (1 to n).map(i => (i, i * 0.5)).toDF("id", "x")
      .coalesce(1) // single input partition → deterministic file row order
      .write.format("readstat").mode("overwrite").save(p)
    p
  }

  // xpt/sav have no integer storage: ids read back as Double there
  private def ids(df: DataFrame): Seq[Int] =
    df.collect().map(r => r.get(0) match {
      case i: Int => i
      case d: Double => d.toInt
      case other => fail(s"unexpected id type $other")
    }).toSeq

  test("dta: offset alone, offset+limit, offset past EOF") {
    val p = write("dta", 10000)
    val base = spark.read.format("readstat").load(p)
    assert(ids(base.offset(9995)) == Seq(9996, 9997, 9998, 9999, 10000))
    assert(ids(base.offset(20).limit(7)) == (21 to 27))
    assert(ids(base.limit(30).offset(25)) == (26 to 30))
    assert(base.offset(10000).count() == 0)
    assert(base.offset(20000).count() == 0)
  }

  test("dta: pushed offset is visible in the scan and prunes planning") {
    val p = write("dta", 10000)
    val df = spark.read.format("readstat").load(p).offset(9990)
    val leaves = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(leaves.contains("offset=9990"), leaves)
    // the Offset operator is gone: the scan applied it exactly
    assert(!df.queryExecution.optimizedPlan.toString.contains("Offset"),
      df.queryExecution.optimizedPlan.toString)
  }

  test("xpt, uncompressed sav, zsav and por all push the offset") {
    // r14: the sequential regimes stopped refusing — they resume at
    // their checkpoint indexes (or decode-skip small files) instead
    for (fmt <- Seq("xpt", "sav", "zsav", "por")) {
      val p = write(fmt, 3000)
      val df = spark.read.format("readstat").load(p)
      val got = ids(df.offset(2990))
      assert(got == (2991 to 3000), s"$fmt: $got")
      val leaves = df.offset(2990).queryExecution.executedPlan
        .collectLeaves().map(_.toString).mkString("\n")
      assert(leaves.contains("offset=2990"), s"$fmt should push:\n$leaves")
    }
  }

  test("zsav checkpointed offset: mid-interval skip, offset+limit, EOF") {
    val p = write("zsav", 3000)
    // a tiny partition target forces the checkpoint-index path (file
    // length >= 2×target) with several rows per checkpoint interval —
    // offsets land mid-interval and decode-forward from the checkpoint
    def df = spark.read.format("readstat")
      .option("partitionTargetBytes", "512").load(p)
    assert(ids(df.offset(2990)) == (2991 to 3000))
    assert(ids(df.offset(17).limit(5)) == (18 to 22))
    assert(df.offset(3000).count() == 0)
    assert(df.offset(9999).count() == 0)
    assert(df.offset(1).count() == 2999)
    // row index stays the FILE row number across the checkpoint skip
    val rows = spark.read.format("readstat")
      .option("partitionTargetBytes", "512")
      .option("rowIndexName", "ridx").load(p).offset(1234).collect()
    assert(rows.length == 3000 - 1234)
    assert(rows.map(_.getLong(2)).min == 1234L)
  }

  test("bytecode sav offset pushes through the checkpoint index") {
    // sample.sav is bytecode-compressed (compression=1), 5 rows; a
    // small partition target exercises the indexed path with a
    // mid-interval skip, the default target the sequential small-file
    // decode-skip path
    val p = res("fixtures/spss/sample.sav")
    val serial = spark.read.format("readstat").load(p)
      .offset(3).collect()
    assert(serial.length == 2)
    val indexed = spark.read.format("readstat")
      .option("partitionTargetBytes", "48").load(p)
      .offset(3).collect()
    assert(indexed.map(_.toString).toSeq == serial.map(_.toString).toSeq)
    val leaves = spark.read.format("readstat").load(p).offset(3)
      .queryExecution.executedPlan
      .collectLeaves().map(_.toString).mkString("\n")
    assert(leaves.contains("offset=3"), leaves)
  }

  test("por checkpointed offset: resume + boundary skim stays exact") {
    val p = write("por", 20000) // > IndexEvery rows → several checkpoints
    def df = spark.read.format("readstat")
      .option("partitionTargetBytes", "4096").load(p)
    assert(ids(df.offset(19990)) == (19991 to 20000))
    assert(ids(df.offset(8195).limit(3)) == (8196 to 8198)) // mid-interval
    assert(df.offset(20000).count() == 0)
    assert(df.offset(12345).count() == 20000 - 12345)
    val rows = spark.read.format("readstat")
      .option("partitionTargetBytes", "4096")
      .option("rowIndexName", "ridx").load(p).offset(9001).collect()
    assert(rows.map(_.getLong(2)).min == 9001L)
  }

  test("multi-file offset+limit pushes via the cumulative row prefix") {
    // r14: a directory scan splits the window across per-file METADATA
    // row counts; files outside the window plan nothing
    val d = Files.createTempDirectory("graft_off_multi").toFile
    d.deleteOnExit()
    import spark.implicits._
    for (k <- 0 until 4) {
      (k * 1000 + 1 to (k + 1) * 1000).map(i => (i, i * 0.5)).toDF("id", "x")
        .coalesce(1).write.format("readstat").mode("overwrite")
        .save(s"${d.getAbsolutePath}/f$k.dta")
    }
    val df = spark.read.format("readstat").load(d.getAbsolutePath)
    // window [1500, 2505): crosses the f1/f2 boundary
    assert(ids(df.offset(1500).limit(1005)) == (1501 to 2505))
    val sliced = df.offset(1500).limit(1005)
    val leaves = sliced.queryExecution.executedPlan
      .collectLeaves().map(_.toString).mkString("\n")
    assert(leaves.contains("offset=1500"), leaves)
    assert(leaves.contains("limit="), leaves)
    // neither residual operator survives: the scan applied both exactly
    val opt = sliced.queryExecution.optimizedPlan.toString
    assert(!opt.contains("Offset") && !opt.contains("GlobalLimit"), opt)
    // the window's partitions exclude out-of-window files entirely
    val parts = sliced.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.inputPartitions
      }.get
    val touched = parts.flatMap {
      case m: graft.spark.readstat.MultiFilePartition => m.parts.map(_.path)
      case r: graft.spark.readstat.RangePartition => Seq(r.path)
      case other => fail(s"unexpected partition $other")
    }.map(p => p.substring(p.lastIndexOf('/') + 1)).distinct.sorted
    assert(touched == Seq("f1.dta", "f2.dta"), touched.toString)
    // offset past the directory's total row count
    assert(df.offset(4000).count() == 0)
    assert(ids(df.offset(3998)) == Seq(3999, 4000))
  }

  test("multi-file offset refuses when a file lacks a metadata count") {
    // POR's row count is opportunistic (index-cached only) — a fresh
    // directory of .por files can't split the window, so the push is
    // refused and Catalyst's Offset operator does the work
    val d = Files.createTempDirectory("graft_off_por").toFile
    d.deleteOnExit()
    import spark.implicits._
    for (k <- 0 until 2)
      (k * 100 + 1 to (k + 1) * 100).map(i => (i, i * 0.5)).toDF("id", "x")
        .coalesce(1).write.format("readstat").mode("overwrite")
        .save(s"${d.getAbsolutePath}/f$k.por")
    val df = spark.read.format("readstat").load(d.getAbsolutePath)
    assert(ids(df.offset(195)).sorted == (196 to 200))
    val leaves = df.offset(195).queryExecution.executedPlan
      .collectLeaves().map(_.toString).mkString("\n")
    assert(!leaves.contains("offset="), s"should refuse:\n$leaves")
  }

  test("offset composes with filter pushdown and row index") {
    val p = write("dta", 5000)
    val df = spark.read.format("readstat")
      .option("rowIndexName", "ridx").load(p)
      .offset(4000)
      .filter(org.apache.spark.sql.functions.col("id") % 2 === 0)
    val rows = df.collect()
    assert(rows.length == 500)
    // row index stays the FILE row number: id i sits at file row i-1
    assert(rows.forall(r => r.getLong(r.fieldIndex("ridx")) ==
      r.getInt(r.fieldIndex("id")) - 1L))
    assert(rows.map(_.getInt(0)).min == 4002)
  }

  test("sas refuses exact-limit (page planner ignores it) but stays correct") {
    val p = write("sas7bdat", 2000)
    val base = spark.read.format("readstat").load(p)
    // the planner can't cap pages by rows: the builder must refuse the
    // limit so Catalyst's Limit operator survives and trims
    assert(base.limit(5).count() == 5)
    assert(base.limit(5).collect().length == 5)
    val leaves = base.limit(5).queryExecution.executedPlan
      .collectLeaves().map(_.toString).mkString("\n")
    assert(!leaves.contains("limit="), s"sas must not claim the limit:\n$leaves")
  }

  test("sas pushes offset via the page-row prefix + mid-page skip") {
    val p = write("sas7bdat", 20000) // several pages
    val base = spark.read.format("readstat").load(p)
    assert(ids(base.offset(19990)) == (19991 to 20000))
    assert(base.offset(7).count() == 19993) // mid-first-page skip
    assert(base.offset(20000).count() == 0)
    val leaves = base.offset(19990).queryExecution.executedPlan
      .collectLeaves().map(_.toString).mkString("\n")
    assert(leaves.contains("offset=19990"), leaves)
    // row index stays the FILE row number across the skip
    val rows = spark.read.format("readstat")
      .option("rowIndexName", "ridx").load(p).offset(12345).collect()
    assert(rows.length == 20000 - 12345)
    assert(rows.map(r => r.getLong(r.fieldIndex("ridx"))).min == 12345L)
  }

  test("sas rle-compressed offset slices exactly") {
    import spark.implicits._
    val p = s"$dir/rle.sas7bdat"
    // repetitive values compress well under RLE
    (1 to 15000).map(i => (i, "x" * 40)).toDF("id", "pad")
      .coalesce(1)
      .write.format("readstat").mode("overwrite")
      .option("compression", "rle").save(p)
    val base = spark.read.format("readstat").load(p)
    assert(ids(base.offset(14980).select("id"))== (14981 to 15000))
    assert(base.offset(3).count() == 14997)
  }

  test("dta exact limit deletes the Limit operator and still trims") {
    val p = write("dta", 1000)
    val df = spark.read.format("readstat").load(p).limit(7)
    assert(ids(df) == (1 to 7))
    assert(df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString.contains("limit=7"))
  }

  test("count(*) aggregate pushdown never coexists with limit/offset") {
    val p = write("dta", 1000)
    val base = spark.read.format("readstat").load(p)
    assert(base.offset(400).count() == 600)
    assert(base.limit(300).offset(100).count() == 200)
    // and the metadata count-star path still answers the bare count
    assert(base.count() == 1000)
  }
}
