package graft.readstat

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.DataFrame

import graft.spark.readstat.StataModule

/** Malformed-input handling (`mode` option — the CSV/JSON source's
  * failfast/dropmalformed/permissive surface for binary stat files).
  * Default stays failfast: TruncatedFileSpec pins that a damaged file
  * kills the query loudly. These tests cover the explicit opt-ins:
  * dropmalformed drops files whose header fails to parse; permissive
  * additionally salvages the decodable prefix of a damaged data region
  * — via exact truncated-tail arithmetic on the fixed-width regimes
  * (planner clamp) and via the executor-side salvage iterator on the
  * compressed ones. The metadata-trusting pushdowns (COUNT(*) from
  * metadata, multi-file limit/offset windows, statistics row counts)
  * must disengage under the tolerant modes: a salvaged file's header
  * count overstates its decodable rows.
  */
class MalformedModeSpec extends SparkTestBase {

  private def tmpDir(tag: String): String = {
    val d = Files.createTempDirectory(s"graft_mode_$tag").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def writeDta(path: String, from: Int, to: Int): Unit = {
    import spark.implicits._
    (from to to).map(i => (i, i * 0.5, s"row$i")).toDF("id", "x", "s")
      .coalesce(1)
      .write.format("readstat").mode("overwrite").save(path)
  }

  private def zeroPrefix(path: String, n: Int): Unit = {
    val ch = java.nio.channels.FileChannel.open(Paths.get(path),
      StandardOpenOption.WRITE)
    try ch.write(java.nio.ByteBuffer.wrap(new Array[Byte](n)), 0)
    finally ch.close()
  }

  private def truncateTo(path: String, bytes: Long): Unit = {
    val ch = java.nio.channels.FileChannel.open(Paths.get(path),
      StandardOpenOption.WRITE)
    try ch.truncate(bytes) finally ch.close()
  }

  private def read(path: String, mode: String): DataFrame =
    spark.read.format("readstat").option("mode", mode).load(path)

  test("mode option validates its value") {
    val dir = tmpDir("val")
    writeDta(s"$dir/a.dta", 1, 10)
    val e = intercept[IllegalArgumentException] {
      read(s"$dir/a.dta", "lenient").collect()
    }
    assert(e.getMessage.contains("failfast, dropmalformed, permissive"),
      e.getMessage)
  }

  test("dropmalformed drops a corrupt-header file from a directory scan") {
    val dir = tmpDir("drop")
    writeDta(s"$dir/a.dta", 1, 100)
    writeDta(s"$dir/b.dta", 101, 200)
    writeDta(s"$dir/c.dta", 201, 300)
    zeroPrefix(s"$dir/b.dta", 256)

    // default fails loudly on the corrupt member
    intercept[Throwable] { read(dir, "failfast").collect() }

    for (mode <- Seq("dropmalformed", "permissive")) {
      val got = read(dir, mode).collect().map(_.getInt(0)).sorted
      assert(got.toSeq == ((1 to 100) ++ (201 to 300)), s"mode=$mode")
    }
  }

  test("tolerant schema inference survives a corrupt first file") {
    val dir = tmpDir("first")
    // 'a' sorts first so inference would hit the corrupt file head-on
    writeDta(s"$dir/a.dta", 1, 10)
    writeDta(s"$dir/b.dta", 11, 20)
    zeroPrefix(s"$dir/a.dta", 256)
    intercept[Throwable] { read(dir, "failfast").schema }
    val df = read(dir, "dropmalformed")
    assert(df.columns.toSeq == Seq("id", "x", "s"))
    assert(df.count() == 10)
  }

  test("permissive clamps a truncated dta to its complete rows, exactly") {
    val dir = tmpDir("clamp")
    val p = s"$dir/t.dta"
    writeDta(p, 1, 5000)
    val md = StataModule.metadata(p)
    val dataStart = md.dataOffset + (if (md.version >= 117) 6 else 0)
    val k = 3210
    truncateTo(p, dataStart + k.toLong * md.rowLen + 3) // mid-row cut

    // failfast and dropmalformed (header parses fine) both still throw
    intercept[Throwable] { read(p, "failfast").collect() }
    intercept[Throwable] { read(p, "dropmalformed").collect() }

    val got = read(p, "permissive")
    assert(got.count() == k)
    val ids = got.collect().map(_.getInt(0))
    assert(ids.length == k && ids.head == 1 && ids.last == k)
    // composes with single-file OFFSET pushdown: rows [10, k)
    assert(read(p, "permissive").offset(10).count() == k - 10)
    // COUNT(*) must NOT shortcut to the (overstated) metadata count
    assert(read(p, "permissive").groupBy().count().collect()(0).getLong(0) == k)
  }

  test("permissive clamps a truncated uncompressed sav exactly") {
    import spark.implicits._
    val dir = tmpDir("sav")
    val p = s"$dir/t.sav"
    (1 to 4000).map(i => (i.toDouble, i * 1.5)).toDF("id", "x")
      .coalesce(1)
      .write.format("readstat").mode("overwrite").save(p)
    val full = Files.size(Paths.get(p))
    val module = graft.spark.readstat.SpssModule
    val opts = graft.spark.readstat.ReadstatOptions()
    val before = module.salvageableRowCount(p, opts)
    if (before.contains(4000L)) { // uncompressed regime reached
      // cut 1000 rows' worth of tail bytes plus a mid-row remainder
      val md = graft.spark.readstat.SpssModule.metadata(p)
      truncateTo(p, full - 1000L * md.recordLen - 5)
      intercept[Throwable] { read(p, "failfast").collect() }
      assert(read(p, "permissive").count() == 2999)
    } else {
      // writer produced a compressed regime: exec salvage still applies
      truncateTo(p, full * 6 / 10)
      intercept[Throwable] { read(p, "failfast").collect() }
      val n = read(p, "permissive").count()
      assert(n < 4000, s"salvaged $n")
    }
  }

  test("permissive salvages the decodable prefix of a damaged zsav") {
    import spark.implicits._
    val dir = tmpDir("zsav")
    val p = s"$dir/t.zsav"
    (1 to 30000).map(i => (i.toDouble, i * 1.5, s"s$i")).toDF("id", "x", "s")
      .coalesce(1)
      .write.format("readstat").mode("overwrite").save(p)
    truncateTo(p, Files.size(Paths.get(p)) * 6 / 10)
    intercept[Throwable] { read(p, "failfast").collect() }
    // decoded prefix rows carry real values, not junk defaults (a pushed
    // LIMIT on a truncated zsav may salvage zero rows — its planner
    // needs the EOF trailer the cut destroyed — so the prefix check
    // rides the same full-scan plan as the count)
    val rows = read(p, "permissive").collect()
    assert(rows.length < 30000, s"salvaged ${rows.length} of 30000")
    assert(rows.take(3).map(_.getDouble(0)).toSeq == Seq(1.0, 2.0, 3.0))
  }

  test("permissive salvages the intact page prefix of a truncated sas7bdat") {
    import spark.implicits._
    val dir = tmpDir("sas")
    val p = s"$dir/t.sas7bdat"
    (1 to 20000).map(i => (i.toDouble, i * 1.5)).toDF("id", "x")
      .coalesce(1)
      .write.format("readstat").mode("overwrite").save(p)
    truncateTo(p, Files.size(Paths.get(p)) * 6 / 10)
    intercept[Throwable] { read(p, "failfast").collect() }
    // page-grained: partitions overlapping the cut end early via the
    // executor-side backstop; whole-page prefix decodes with real values
    val rows = read(p, "permissive").collect()
    assert(rows.length > 0 && rows.length < 20000,
      s"salvaged ${rows.length} of 20000")
    val ids = rows.map(_.getDouble(0)).sorted
    assert(ids.take(3).toSeq == Seq(1.0, 2.0, 3.0))
  }

  test("permissive salvages the decodable prefix of a truncated por") {
    import spark.implicits._
    val dir = tmpDir("por")
    val p = s"$dir/t.por"
    (1 to 5000).map(i => (i.toDouble, i * 1.5)).toDF("ID", "X")
      .coalesce(1)
      .write.format("readstat").mode("overwrite").save(p)
    // cut mid-stream: the 'Z' end-of-data marker is gone
    truncateTo(p, Files.size(Paths.get(p)) * 6 / 10)
    intercept[Throwable] { read(p, "failfast").collect() }
    val rows = read(p, "permissive").collect()
    assert(rows.length > 0 && rows.length < 5000,
      s"salvaged ${rows.length} of 5000")
    assert(rows.take(3).map(_.getDouble(0)).toSeq == Seq(1.0, 2.0, 3.0))
  }

  test("permissive offset query on a damaged zsav refuses the push and salvages") {
    import spark.implicits._
    val dir = tmpDir("zsavoff")
    val p = s"$dir/t.zsav"
    (1 to 30000).map(i => (i.toDouble, i * 1.5)).toDF("id", "x")
      .coalesce(1)
      .write.format("readstat").mode("overwrite").save(p)
    truncateTo(p, Files.size(Paths.get(p)) * 6 / 10)
    // the pushOffset probe's index build fails on the lost EOF trailer;
    // the push must be REFUSED (Catalyst keeps its Offset) instead of
    // the query dying at planning — the salvaged prefix minus the
    // offset comes back
    val rows = spark.read.format("readstat").option("mode", "permissive")
      .load(p).offset(10).collect()
    assert(rows.length > 0 && rows.length < 30000,
      s"salvaged-with-offset ${rows.length}")
    assert(rows.head.getDouble(0) == 11.0, "offset not applied")
  }

  test("dropmalformed still throws on data-region damage (header intact)") {
    import spark.implicits._
    val dir = tmpDir("dropdata")
    val p = s"$dir/t.zsav"
    (1 to 30000).map(i => (i.toDouble, i * 1.5)).toDF("id", "x")
      .coalesce(1)
      .write.format("readstat").mode("overwrite").save(p)
    truncateTo(p, Files.size(Paths.get(p)) * 6 / 10)
    // contract: dropmalformed drops HEADER-corrupt files only; a
    // parseable header with damaged data must fail loudly, not drop
    // silently at planning
    intercept[Throwable] { read(p, "dropmalformed").collect() }
  }

  test("permissive salvages a multi-partition truncated por (index path)") {
    import spark.implicits._
    val dir = tmpDir("porbig")
    val p = s"$dir/t.por"
    (1 to 20000).map(i => (i.toDouble, i * 1.5)).toDF("ID", "X")
      .coalesce(1)
      .write.format("readstat").mode("overwrite").save(p)
    truncateTo(p, Files.size(Paths.get(p)) * 6 / 10)
    // a small partition target forces the checkpoint-index planner,
    // whose skim fails on the missing Z marker — permissive degrades to
    // ONE sequential partition and salvages, instead of dropping the file
    val rows = spark.read.format("readstat")
      .option("mode", "permissive")
      .option("partitionTargetBytes", "32768")
      .load(p).collect()
    assert(rows.length > 0 && rows.length < 20000,
      s"salvaged ${rows.length} of 20000")
    assert(rows.take(3).map(_.getDouble(0)).toSeq == Seq(1.0, 2.0, 3.0))
  }

  test("tolerant modes refuse the multi-file offset/limit window push") {
    val dir = tmpDir("window")
    writeDta(s"$dir/a.dta", 1, 50)
    writeDta(s"$dir/b.dta", 51, 100)
    val df = read(dir, "permissive").offset(30).limit(40)
    val leaves = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(!leaves.contains("offset="), leaves) // not pushed...
    assert(df.collect().map(_.getInt(0)).sorted.toSeq == (31 to 70)) // ...still right
  }

  test("tolerant file-metadata sweep reports corrupt files as error rows") {
    val dir = tmpDir("audit")
    writeDta(s"$dir/a.dta", 1, 100)
    writeDta(s"$dir/b.dta", 101, 200)
    zeroPrefix(s"$dir/b.dta", 256)
    // default: the sweep fails on the corrupt member
    intercept[Throwable] {
      spark.read.format("readstat-file-metadata").load(dir).collect()
    }
    val rows = spark.read.format("readstat-file-metadata")
      .option("mode", "dropmalformed").load(dir)
      .orderBy("file").collect()
    assert(rows.length == 2)
    assert(rows(0).getString(0).endsWith("a.dta") && rows(0).getLong(2) == 100)
    assert(rows(1).getString(0).endsWith("b.dta") && rows(1).isNullAt(2))
    assert(rows(1).getString(1) == "dta") // format still from extension
    assert(rows(1).getString(7).contains("error"))
  }

  test("tolerant per-variable metadata skips a corrupt first file") {
    val dir = tmpDir("varmeta")
    writeDta(s"$dir/a.dta", 1, 10)
    writeDta(s"$dir/b.dta", 11, 20)
    zeroPrefix(s"$dir/a.dta", 256) // 'a' sorts first
    intercept[Throwable] {
      spark.read.format("readstat-metadata").load(dir).collect()
    }
    val rows = spark.read.format("readstat-metadata")
      .option("mode", "dropmalformed").load(dir).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("id", "x", "s"))
  }

  test("tolerant stream outlives a malformed drop and keeps ingesting") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val dir = tmpDir("stream")
    def writeFile(name: String, ids: Range): Unit =
      ids.map(i => (i.toLong, s"row$i")).toDF("id", "s")
        .write.format("readstat").mode("overwrite").save(s"$dir/$name")

    writeFile("a.dta", 1 to 100)
    val stream = spark.readStream.format("readstat")
      .option("mode", "dropmalformed").load(dir)
    val query = stream.writeStream.format("memory")
      .queryName("malformed_stream").outputMode("append")
      .trigger(Trigger.ProcessingTime(100)).start()
    try {
      query.processAllAvailable()
      assert(spark.table("malformed_stream").count() == 100L)
      // a corrupt drop arrives: never admitted, stream stays alive
      writeFile("b.dta", 101 to 200)
      zeroPrefix(s"$dir/b.dta", 256)
      // ...and a healthy one after it still ingests
      writeFile("c.dta", 201 to 250)
      query.processAllAvailable()
      assert(query.isActive, "stream died on the malformed drop")
      // dta has no int64 storage, so ids round-trip as double
      val ids = spark.table("malformed_stream")
        .select("id").collect().map(_.getDouble(0).toLong).sorted
      assert(ids.toSeq == ((1L to 100L) ++ (201L to 250L)),
        s"got ${ids.length} rows")
    } finally query.stop()
  }

  test("spark.sql.files.ignoreCorruptFiles defaults the mode to dropmalformed") {
    val dir = tmpDir("conf")
    writeDta(s"$dir/a.dta", 1, 50)
    writeDta(s"$dir/b.dta", 51, 100)
    zeroPrefix(s"$dir/b.dta", 256)
    val key = "spark.sql.files.ignoreCorruptFiles"
    // conf off (default): loud
    intercept[Throwable] {
      spark.read.format("readstat").load(dir).collect()
    }
    spark.conf.set(key, "true")
    try {
      // the built-in file sources' switch now reads as dropmalformed
      val got = spark.read.format("readstat").load(dir)
        .collect().map(_.getInt(0)).sorted
      assert(got.toSeq == (1 to 50))
      // an explicit mode always wins over the conf
      intercept[Throwable] {
        read(dir, "failfast").collect()
      }
    } finally spark.conf.unset(key)
  }

  test("permissive leaves intact files byte-for-byte identical to failfast") {
    val dir = tmpDir("intact")
    val p = s"$dir/ok.dta"
    writeDta(p, 1, 2500)
    assertSameData(read(p, "permissive"), read(p, "failfast"), "intact dta")
  }
}
