package graft.readstat

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming WRITE paths.
  *
  * 1. SINGLE-FILE sink (`writeStream.format("readstat").start(p.dta)`) —
  *    the direct analog of the reference's `sink_stata` (reference:
  *    crates/polars_readstat_bindings/src/pybindings.rs:951-1096): every
  *    epoch appends into ONE .dta that is complete and valid between
  *    commits, exactly-once across restarts via the sidecar epoch state.
  *
  * 2. `foreachBatch` + append-mode multiFile directories — the
  *    parallel-write path (each micro-batch lands as self-contained
  *    part files). Crash-safety contract under test: every part is
  *    written to a same-directory `.inprogress` temp and atomically
  *    renamed into place (AtomicFile), and readers filter `.inprogress`
  *    residue — so a reader racing the stream (or surviving a writer
  *    crash) sees only complete parts, never a half-written file.
  *    Delivery is at-least-once: a batch retried after a crash mid-write
  *    re-appends under a fresh unique run prefix (readers may then see
  *    duplicates; exactly-once needs idempotent downstream dedup).
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

  test("single-file streaming sink: epochs append into ONE valid .dta") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_sfsink").toFile
    dir.deleteOnExit()
    val sink = s"$dir/stream.dta"

    val input = MemoryStream[(Long, Double, String)]
    val query = input.toDF().toDF("id", "v", "s").writeStream
      .format("readstat")
      .option("checkpointLocation", s"$dir/ckpt")
      .option("strWidth.s", "8")
      .start(sink)
    try {
      input.addData((1L, 1.5, "aa"), (2L, 2.5, "bb"))
      query.processAllAvailable()
      // the file is a COMPLETE valid .dta between epochs
      val mid = spark.read.format("readstat").load(sink)
      assert(mid.count() == 2L)
      input.addData((3L, 3.5, "cc"))
      query.processAllAvailable()
      input.addData((4L, 4.5, null))
      query.processAllAvailable()
      val back = spark.read.format("readstat").load(sink).orderBy("id")
      assert(back.count() == 4L)
      val rows = back.collect()
      assert(rows.map(_.getDouble(0)).toSeq == Seq(1.0, 2.0, 3.0, 4.0))
      assert(rows.map(_.getDouble(1)).toSeq == Seq(1.5, 2.5, 3.5, 4.5))
      // fixed-width str#: null stores as empty, reader surfaces null
      assert(rows.map(r => Option(r.getString(2)).getOrElse("-")).toSeq ==
        Seq("aa", "bb", "cc", "-"))
      // ONE file plus sidecar state — no parts directory
      assert(new java.io.File(sink).isFile)
      assert(new java.io.File(sink + ".stream_state").isFile)
    } finally query.stop()

    // restart replay: a commit with the SAME query id and an already-
    // committed epoch id must be skipped (exactly-once across restarts)
    val st = graft.spark.readstat.writers.StataStreamSink.readState(sink).get
    graft.spark.readstat.writers.StataStreamSink.commitEpoch(
      sink, st.epoch, Nil,
      org.apache.spark.sql.types.StructType.fromDDL(
        "id DOUBLE, v DOUBLE, s STRING"), Map("strWidth.s" -> "8"),
      queryId = st.queryId)
    assert(spark.read.format("readstat").load(sink).count() == 4L)
  }

  test("a NEW query appending to an existing sink is NOT mistaken for replay") {
    // a fresh checkpoint restarts epoch numbering at 0; a bare
    // `epochId <= committed` guard would silently discard its batches
    // (r10 review finding) — replay detection must be query-scoped
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_newq").toFile
    dir.deleteOnExit()
    val sink = s"$dir/append.dta"
    val in1 = MemoryStream[(Long, Double)]
    val q1 = in1.toDF().toDF("id", "v").writeStream.format("readstat")
      .option("checkpointLocation", s"$dir/ckpt1").start(sink)
    try {
      in1.addData((1L, 1.0), (2L, 2.0)); q1.processAllAvailable()
      in1.addData((3L, 3.0)); q1.processAllAvailable()
    } finally q1.stop()
    // committed epoch is now >= 1; the new query's epochs start at 0
    val in2 = MemoryStream[(Long, Double)]
    val q2 = in2.toDF().toDF("id", "v").writeStream.format("readstat")
      .option("checkpointLocation", s"$dir/ckpt2").start(sink)
    try {
      in2.addData((4L, 4.0)); q2.processAllAvailable()
    } finally q2.stop()
    val back = spark.read.format("readstat").load(sink)
    assert(back.count() == 4L, "the new query's rows must not be dropped")
    assert(back.agg(org.apache.spark.sql.functions.sum("v"))
      .collect()(0).getDouble(0) == 10.0)
    // but a SCHEMA change on append is refused before bytes are mixed
    val in3 = MemoryStream[(Double, Long)]
    val q3 = in3.toDF().toDF("v", "id").writeStream.format("readstat")
      .option("checkpointLocation", s"$dir/ckpt3").start(sink)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try { in3.addData((9.0, 9L)); q3.processAllAvailable() }
      finally q3.stop()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: msgs(t.getCause)
    assert(msgs(e).exists(_.contains("schema drift")), msgs(e).mkString(" | "))
  }

  test("single-file sink: crash mid-splice heals on the next commit") {
    import graft.spark.readstat.writers.StataStreamSink
    val dir = java.nio.file.Files.createTempDirectory("graft_heal").toFile
    dir.deleteOnExit()
    val sink = s"$dir/heal.dta"
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id DOUBLE, v DOUBLE")
    val opts = Map.empty[String, String]
    def chunk(rows: Seq[(Double, Double)]): (Int, String, Long) = {
      val f = java.io.File.createTempFile("graft_healchunk", ".chunk")
      val bb = java.nio.ByteBuffer.allocate(rows.length * 16)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      rows.foreach { case (a, b) => bb.putDouble(a); bb.putDouble(b) }
      java.nio.file.Files.write(f.toPath, bb.array())
      (0, f.getAbsolutePath, rows.length.toLong)
    }
    StataStreamSink.commitEpoch(sink, 0L, Seq(chunk(Seq((1.0, 10.0)))), schema, opts)
    StataStreamSink.commitEpoch(sink, 1L, Seq(chunk(Seq((2.0, 20.0)))), schema, opts)
    assert(spark.read.format("readstat").load(sink).count() == 2L)

    // simulate a crash AFTER bytes hit the file but BEFORE the state
    // update: garbage appended past the committed boundary, state at
    // epoch 1 / 2 rows
    val ch = java.nio.channels.FileChannel.open(java.nio.file.Paths.get(sink),
      java.nio.file.StandardOpenOption.WRITE, java.nio.file.StandardOpenOption.APPEND)
    ch.write(java.nio.ByteBuffer.wrap(Array.fill[Byte](37)(0x7f)))
    ch.close()

    // next epoch re-truncates to the committed row boundary and appends
    StataStreamSink.commitEpoch(sink, 2L, Seq(chunk(Seq((3.0, 30.0)))), schema, opts)
    val back = spark.read.format("readstat").load(sink).orderBy("id")
    assert(back.collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq ==
      Seq((1.0, 10.0), (2.0, 20.0), (3.0, 30.0)))

    // replayed epoch (restart from checkpoint): skipped by id
    StataStreamSink.commitEpoch(sink, 2L, Seq(chunk(Seq((99.0, 99.0)))), schema, opts)
    assert(spark.read.format("readstat").load(sink).count() == 3L)

    // multi-partition epoch: chunks splice in partition order
    val c1 = chunk(Seq((5.0, 50.0)))
    val c0 = chunk(Seq((4.0, 40.0)))
    StataStreamSink.commitEpoch(sink, 3L,
      Seq((1, c1._2, 1L), (0, c0._2, 1L)), schema, opts)
    val all = spark.read.format("readstat").load(sink)
      .withColumn("ord", org.apache.spark.sql.functions.monotonically_increasing_id())
      .orderBy("ord").collect().map(_.getDouble(0)).toSeq
    assert(all == Seq(1.0, 2.0, 3.0, 4.0, 5.0), all)
  }

  test("single-file sink rejects over-width strings loudly, never truncates") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_sfw").toFile
    dir.deleteOnExit()
    val input = MemoryStream[(Long, String)]
    val query = input.toDF().toDF("id", "s").writeStream
      .format("readstat")
      .option("checkpointLocation", s"$dir/ckpt")
      .option("strWidth.s", "4")
      .start(s"$dir/narrow.dta")
    try {
      input.addData((1L, "toolongforwidth4"))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        query.processAllAvailable()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else String.valueOf(t.getMessage) +: msgs(t.getCause)
      assert(msgs(e).exists(_.contains("strWidth.s")), msgs(e).mkString(" | "))
    } finally query.stop()
  }

  test("single-file sink carries value labels through every epoch commit") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_sflbl").toFile
    dir.deleteOnExit()
    val sink = s"$dir/lbl.dta"
    val input = MemoryStream[(Long, Int)]
    val query = input.toDF().toDF("id", "sex").writeStream
      .format("readstat")
      .option("checkpointLocation", s"$dir/ckpt")
      .option("valueLabels", "sex:1=Male,2=Female")
      .start(sink)
    try {
      input.addData((1L, 1), (2L, 2))
      query.processAllAvailable()
      input.addData((3L, 1))
      query.processAllAvailable()
      // labels decode via the reader's label switch after BOTH commits
      // (the trailer is rewritten per epoch — labels must survive)
      val labeled = spark.read.format("readstat")
        .option("valueLabelsAsStrings", "true").load(sink)
      assert(labeled.select("sex").as[String].collect().sorted.toSeq ==
        Seq("Female", "Male", "Male"))
    } finally query.stop()

    // variable labels stream through too (reference sink_stata's
    // variable_labels dict) — epoch-rewritten prefix must carry them
    val sink2 = s"$dir/lbl2.dta"
    val input2 = MemoryStream[(Long, Int)]
    val q2 = input2.toDF().toDF("id", "sex").writeStream
      .format("readstat")
      .option("checkpointLocation", s"$dir/ckpt2")
      .option("varLabels", "sex:Respondent sex")
      .start(sink2)
    try {
      input2.addData((1L, 1)); q2.processAllAvailable()
      input2.addData((2L, 2)); q2.processAllAvailable()
      val back = spark.read.format("readstat").load(sink2)
      assert(back.schema("sex").metadata.getString("readstat.label") ==
        "Respondent sex")
    } finally q2.stop()
  }

  test("malformed per-variable option segments fail loudly, never drop entries") {
    import spark.implicits._
    // a '|' inside a label splits into a colon-less segment — the old
    // silent-drop behavior would truncate the label to 'Male' quietly
    val e = intercept[IllegalArgumentException] {
      Seq((1.0, 2.0)).toDF("sex", "v").write.format("readstat")
        .mode("overwrite")
        .option("varLabels", "sex:Male|Female indicator")
        .save(java.nio.file.Files.createTempDirectory("graft_badopt")
          .resolve("x.dta").toString)
    }
    assert(e.getMessage.contains("cannot parse"), e.getMessage)
  }

  test("a corrupt sidecar state stops the stream instead of restarting at offset 0") {
    import graft.spark.readstat.writers.StreamSinkCore
    val dir = java.nio.file.Files.createTempDirectory("graft_badstate").toFile
    dir.deleteOnExit()
    val sink = s"$dir/x.dta"
    java.nio.file.Files.write(
      java.nio.file.Paths.get(sink + ".stream_state"),
      "{not json".getBytes("UTF-8"))
    val e = intercept[IllegalStateException] { StreamSinkCore.readState(sink) }
    assert(e.getMessage.contains("refusing to append blindly"), e.getMessage)
  }

  test("sav sink refuses a cross-query append that would shift the dictionary") {
    // different varLabels change the sav dictionary LENGTH; an append
    // from a new query must be refused before old rows are shifted
    // (r10 second-review finding — preLen guard)
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_prelen").toFile
    dir.deleteOnExit()
    val sink = s"$dir/drift.sav"
    val in1 = MemoryStream[(Long, Double)]
    val q1 = in1.toDF().toDF("id", "v").writeStream.format("readstat")
      .option("checkpointLocation", s"$dir/c1").start(sink)
    try { in1.addData((1L, 1.0)); q1.processAllAvailable() } finally q1.stop()
    val in2 = MemoryStream[(Long, Double)]
    val q2 = in2.toDF().toDF("id", "v").writeStream.format("readstat")
      .option("checkpointLocation", s"$dir/c2")
      .option("varLabels", "v:Some value label text")
      .start(sink)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try { in2.addData((2L, 2.0)); q2.processAllAvailable() }
      finally q2.stop()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: msgs(t.getCause)
    assert(msgs(e).exists(_.contains("pre-data section length")),
      msgs(e).mkString(" | "))
    // the original row is untouched
    assert(spark.read.format("readstat").load(sink).count() == 1L)
  }

  test("single-file streaming .sav sink: epochs append into ONE valid sav") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_savsink").toFile
    dir.deleteOnExit()
    val sink = s"$dir/stream.sav"
    val input = MemoryStream[(Long, Double, String)]
    val query = input.toDF().toDF("id", "v", "s").writeStream
      .format("readstat")
      .option("checkpointLocation", s"$dir/ckpt")
      .option("strWidth.s", "6")
      .start(sink)
    try {
      input.addData((1L, 1.5, "ab"), (2L, 2.5, "cd"))
      query.processAllAvailable()
      assert(spark.read.format("readstat").load(sink).count() == 2L)
      input.addData((3L, 3.5, "ef"))
      query.processAllAvailable()
      val back = spark.read.format("readstat").load(sink).orderBy("id")
      val rows = back.collect()
      assert(rows.map(_.getDouble(0)).toSeq == Seq(1.0, 2.0, 3.0))
      assert(rows.map(_.getDouble(1)).toSeq == Seq(1.5, 2.5, 3.5))
      assert(rows.map(_.getString(2).trim).toSeq == Seq("ab", "cd", "ef"))
      assert(new java.io.File(sink).isFile)
    } finally query.stop()
  }

  test("single-file streaming .zsav sink: epochs append deflate blocks into ONE valid zsav") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_zsavsink").toFile
    dir.deleteOnExit()
    val sink = s"$dir/stream.zsav"
    val input = MemoryStream[(Long, Double, String)]
    val query = input.toDF().toDF("id", "v", "s").writeStream
      .format("readstat")
      .option("checkpointLocation", s"$dir/ckpt")
      .option("strWidth.s", "6")
      .start(sink)
    try {
      input.addData((1L, 1.5, "ab"), (2L, 2.5, "cd"))
      query.processAllAvailable()
      assert(spark.read.format("readstat").load(sink).count() == 2L)
      // epoch 2 is big enough (>4 MiB raw) to span multiple deflate
      // blocks, so the append exercises the multi-block index path
      input.addData((3L to 200002L).map(i => (i, i * 0.5, "ef")): _*)
      query.processAllAvailable()
      val back = spark.read.format("readstat").load(sink)
      assert(back.count() == 200002L)
      val head = back.orderBy("id").limit(3).collect()
      assert(head.map(_.getDouble(0)).toSeq == Seq(1.0, 2.0, 3.0))
      assert(head.map(_.getDouble(1)).toSeq == Seq(1.5, 2.5, 1.5))
      assert(head.map(_.getString(2).trim).toSeq == Seq("ab", "cd", "ef"))
      // the committed block index rode the sidecar: multiple data blocks
      // (extra = base64 of one LE (u32 u, u32 c) pair per block)
      val st = graft.spark.readstat.writers.StreamSinkCore.readState(sink).get
      assert(java.util.Base64.getDecoder.decode(st.extra).length / 8 >= 2,
        st.extra.length)
      assert(new java.io.File(sink).isFile)
    } finally query.stop()
  }

  test("zsav sink: a lost ztrailer heals from the sidecar block index on the next commit") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_zsavheal").toFile
    dir.deleteOnExit()
    val sink = s"$dir/heal.zsav"
    val input = MemoryStream[(Long, Double)]
    val query = input.toDF().toDF("id", "v").writeStream
      .format("readstat")
      .option("checkpointLocation", s"$dir/ckpt")
      .start(sink)
    try {
      input.addData((1L, 1.0), (2L, 2.0))
      query.processAllAvailable()
      // simulate a crash mid-commit: chop the trailer (the sidecar still
      // holds the committed block index, which is what healing uses)
      val ch = java.nio.channels.FileChannel.open(
        java.nio.file.Paths.get(sink),
        java.nio.file.StandardOpenOption.WRITE)
      try ch.truncate(ch.size() - 20) finally ch.close()
      input.addData((3L, 3.0))
      query.processAllAvailable()
      val back = spark.read.format("readstat").load(sink).orderBy("id").collect()
      assert(back.map(_.getDouble(0)).toSeq == Seq(1.0, 2.0, 3.0))
    } finally query.stop()
  }

  test("zsav sink refuses cross-query append with a changed declared width") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_zsavdrift").toFile
    dir.deleteOnExit()
    val sink = s"$dir/drift.zsav"
    val in1 = MemoryStream[(Long, String)]
    val q1 = in1.toDF().toDF("id", "s").writeStream
      .format("readstat")
      .option("checkpointLocation", s"$dir/ckpt1")
      .option("strWidth.s", "6")
      .start(sink)
    try { in1.addData((1L, "ab")); q1.processAllAvailable() } finally q1.stop()
    // same 8-byte slot count, different declared width -> fingerprint
    // drift must refuse the append rather than re-declare width 8 for
    // the already-committed rows
    val in2 = MemoryStream[(Long, String)]
    val e = intercept[Exception] {
      val q2 = in2.toDF().toDF("id", "s").writeStream
        .format("readstat")
        .option("checkpointLocation", s"$dir/ckpt2")
        .option("strWidth.s", "8")
        .start(sink)
      try { in2.addData((2L, "cd")); q2.processAllAvailable() } finally q2.stop()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: msgs(t.getCause)
    assert(msgs(e).exists(_.contains("schema drift")), msgs(e).mkString(" | "))
  }

  test("single-file streaming .xpt sink: pad-to-80 re-append stays valid") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_xptsink").toFile
    dir.deleteOnExit()
    val sink = s"$dir/stream.xpt"
    val input = MemoryStream[(Long, Double, String)]
    val query = input.toDF().toDF("id", "v", "s").writeStream
      .format("readstat")
      .option("checkpointLocation", s"$dir/ckpt")
      .option("strWidth.s", "5")
      .start(sink)
    try {
      // rowLen = 8 + 8 + 5 = 21, coprime with 80 → every commit ends
      // mid-block and the next must append OVER the previous padding
      input.addData((1L, 1.5, "ab"), (2L, 2.5, "cd"))
      query.processAllAvailable()
      assert(spark.read.format("readstat").load(sink).count() == 2L)
      assert(new java.io.File(sink).length() % 80 == 0, "80-byte blocking")
      input.addData((3L, 3.5, "ef"))
      query.processAllAvailable()
      val back = spark.read.format("readstat").load(sink).orderBy("ID")
      val rows = back.collect()
      assert(rows.map(_.getDouble(0)).toSeq == Seq(1.0, 2.0, 3.0))
      assert(rows.map(_.getDouble(1)).toSeq == Seq(1.5, 2.5, 3.5))
      assert(rows.map(_.getString(2).trim).toSeq == Seq("ab", "cd", "ef"))
      assert(new java.io.File(sink).length() % 80 == 0)
    } finally query.stop()
  }

  test("streaming sinks refuse taggedMissings loudly (layout reshape needs the batch writer)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_sftag").toFile
    dir.deleteOnExit()
    val input = MemoryStream[(Double, String)]
    val e = intercept[Exception] {
      val q = input.toDF().toDF("v", "ind").writeStream
        .format("readstat")
        .option("checkpointLocation", s"$dir/ckpt")
        .option("taggedMissings", "v:ind")
        .start(s"$dir/out.dta")
      try { input.addData((1.0, ".A")); q.processAllAvailable() }
      finally q.stop()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: msgs(t.getCause)
    assert(msgs(e).exists(_.contains("taggedMissings is not supported")),
      msgs(e).mkString(" | "))
  }

  test("xpt sink varFormats declare namestr display formats across epochs") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_xptfmt").toFile
    dir.deleteOnExit()
    val sink = s"$dir/fmt.xpt"
    val input = MemoryStream[(Double, Double)]
    val q = input.toDF().toDF("price", "v").writeStream
      .format("readstat")
      .option("checkpointLocation", s"$dir/ckpt")
      .option("varFormats", "price:DOLLAR12.2")
      .start(sink)
    try {
      input.addData((1.5, 1.0))
      q.processAllAvailable()
      input.addData((2.5, 2.0))
      q.processAllAvailable()
    } finally q.stop()
    val md = graft.core.xpt.XptCore.parse(sink)
    assert(md.columns.find(_.name == "PRICE").get.format == "DOLLAR12.2",
      md.columns.map(c => c.name + "=" + c.format).mkString(","))
    assert(md.columns.find(_.name == "V").get.format.isEmpty)
    assert(spark.read.format("readstat").load(sink).count() == 2L)
  }

  test("xpt sink honors tableName/fileLabel and validates them") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_xptds").toFile
    dir.deleteOnExit()
    val sink = s"$dir/named.xpt"
    val input = MemoryStream[(Double, Double)]
    val q = input.toDF().toDF("a", "b").writeStream
      .format("readstat")
      .option("checkpointLocation", s"$dir/ckpt")
      .option("tableName", "MYDATA")
      .option("fileLabel", "stream label")
      .start(sink)
    try { input.addData((1.0, 2.0)); q.processAllAvailable() }
    finally q.stop()
    val md = graft.core.xpt.XptCore.parse(sink)
    assert(md.tableName == "MYDATA", md.tableName)
    assert(md.fileLabel == "stream label", md.fileLabel)
    // over-long tableName is refused (v5 caps at 8 chars), not dropped
    val e = intercept[Exception] {
      val input2 = MemoryStream[(Double, Double)]
      val q2 = input2.toDF().toDF("a", "b").writeStream
        .format("readstat")
        .option("checkpointLocation", s"$dir/ckpt2")
        .option("xptVersion", "5")
        .option("tableName", "WAY_TOO_LONG_NAME")
        .start(s"$dir/bad.xpt")
      try { input2.addData((1.0, 2.0)); q2.processAllAvailable() }
      finally q2.stop()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: msgs(t.getCause)
    assert(msgs(e).exists(_.contains("tableName")), msgs(e).mkString(" | "))
  }

  test("streaming sinks refuse write-side compress loudly (reference sink_stata parity)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_sfcompress").toFile
    dir.deleteOnExit()
    val input = MemoryStream[(Long, Double)]
    val e = intercept[Exception] {
      val q = input.toDF().toDF("id", "v").writeStream
        .format("readstat")
        .option("checkpointLocation", s"$dir/ckpt")
        .option("compress", "true")
        .start(s"$dir/out.dta")
      try { input.addData((1L, 1.0)); q.processAllAvailable() }
      finally q.stop()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: msgs(t.getCause)
    assert(msgs(e).exists(_.contains("full-data stats pass")),
      msgs(e).mkString(" | "))
  }

  test("single-file sink refuses multiFile loudly (batch-only option)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_sfmf").toFile
    dir.deleteOnExit()
    val input = MemoryStream[(Long, Double)]
    val e = intercept[Exception] {
      val q = input.toDF().toDF("id", "v").writeStream
        .format("readstat")
        .option("checkpointLocation", s"$dir/ckpt")
        .option("multiFile", "true")
        .start(s"$dir/out.dta")
      try { input.addData((1L, 1.0)); q.processAllAvailable() }
      finally q.stop()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: msgs(t.getCause)
    assert(msgs(e).exists(_.contains("foreachBatch")), msgs(e).mkString(" | "))
  }

  test("single-file sink: non-appendable format is refused") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_sfbad").toFile
    dir.deleteOnExit()
    val input = MemoryStream[(Long, Double)]
    val e = intercept[Exception] {
      val q = input.toDF().toDF("id", "v").writeStream
        .format("readstat")
        .option("checkpointLocation", s"$dir/ckpt")
        .start(s"$dir/out.csv")
      try { input.addData((1L, 1.0)); q.processAllAvailable() }
      finally q.stop()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: msgs(t.getCause)
    assert(msgs(e).exists(_.contains("single-file streaming supports")),
      msgs(e).mkString(" | "))
  }

  test("single-file streaming .por sink: logical-byte append re-wraps the line transport") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_porsink").toFile
    dir.deleteOnExit()
    val sink = s"$dir/stream.por"
    val input = MemoryStream[(Long, Double, String)]
    // varied string lengths ensure epoch boundaries land MID-line, so a
    // wrong resume position would corrupt every later cell
    val query = input.toDF().toDF("id", "v", "s").writeStream
      .format("readstat")
      .option("checkpointLocation", s"$dir/ckpt")
      .option("valueLabels", "id:1=One,2=Two")
      .option("missingValues", "v:99")
      .start(sink)
    try {
      input.addData((1L, 1.5, "alpha"), (2L, 99.0, "b"))
      query.processAllAvailable()
      assert(spark.read.format("readstat").load(sink).count() == 2L)
      input.addData((3L, 3.5, "a much longer string value"))
      query.processAllAvailable()
      input.addData((4L, 4.5, "x"))
      query.processAllAvailable()
      val back = spark.read.format("readstat").load(sink).orderBy("ID")
      val rows = back.collect()
      assert(rows.map(_.getDouble(0)).toSeq == Seq(1.0, 2.0, 3.0, 4.0))
      // v: declared missing 99 comes back null (header options carried
      // through the once-written header)
      assert(rows.map(r => if (r.isNullAt(1)) null else r.getDouble(1)).toSeq ==
        Seq(1.5, null, 3.5, 4.5))
      assert(rows.map(_.getString(2)).toSeq ==
        Seq("alpha", "b", "a much longer string value", "x"))
      // value labels decode across all epochs
      val lbl = spark.read.format("readstat")
        .option("valueLabelsAsStrings", "true").load(sink)
        .orderBy("S").collect()
      assert(lbl.map(_.getString(0)).sorted.toSeq == Seq("4", "One", "Two", "3").sorted)
      assert(new java.io.File(sink).isFile)
      // the file is a valid 80-column transport: every line ≤ 80 chars
      val lines = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(sink)), java.nio.charset.StandardCharsets.ISO_8859_1)
        .split("\n", -1)
      assert(lines.forall(_.length <= 80), "over-long line in por transport")
    } finally query.stop()
  }

  test("por sink: a clobbered trailer heals from the sidecar on the next commit") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_porheal").toFile
    dir.deleteOnExit()
    val sink = s"$dir/heal.por"
    val input = MemoryStream[(Long, Double)]
    val q1 = input.toDF().toDF("id", "v").writeStream
      .format("readstat")
      .option("checkpointLocation", s"$dir/ckpt1")
      .start(sink)
    try { input.addData((1L, 1.0), (2L, 2.0)); q1.processAllAvailable() }
    finally q1.stop()
    // simulate a crash between splice and trailer: chop the file's tail
    // (the 'Z' run) and scribble garbage — the sidecar's dataLen:linePos
    // is the committed truth, so the next commit re-truncates over it
    val ch = java.nio.channels.FileChannel.open(
      java.nio.file.Paths.get(sink),
      java.nio.file.StandardOpenOption.WRITE)
    try {
      ch.truncate(ch.size() - 3)
      ch.position(ch.size())
      ch.write(java.nio.ByteBuffer.wrap("@@GARBAGE@@".getBytes))
    } finally ch.close()
    // the damaged tail makes a direct read fail (no clean 'Z' end)
    assert(intercept[Exception] {
      spark.read.format("readstat").load(sink).count()
    } != null)
    // a new query appends an epoch; the commit heals the tail first
    val input2 = MemoryStream[(Long, Double)]
    val q2 = input2.toDF().toDF("id", "v").writeStream
      .format("readstat")
      .option("checkpointLocation", s"$dir/ckpt2")
      .start(sink)
    try { input2.addData((3L, 3.0)); q2.processAllAvailable() }
    finally q2.stop()
    val back = spark.read.format("readstat").load(sink).orderBy("ID").collect()
    assert(back.map(_.getDouble(0)).toSeq == Seq(1.0, 2.0, 3.0))
    assert(back.map(_.getDouble(1)).toSeq == Seq(1.0, 2.0, 3.0))
  }

  test("por sink refuses a cross-query append with different header options") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_porsink2").toFile
    dir.deleteOnExit()
    val sink = s"$dir/drift.por"
    val input = MemoryStream[(Long, Double)]
    val q1 = input.toDF().toDF("id", "v").writeStream
      .format("readstat")
      .option("checkpointLocation", s"$dir/ckpt1")
      .option("varLabels", "id:Person id")
      .start(sink)
    try { input.addData((1L, 1.0)); q1.processAllAvailable() } finally q1.stop()
    // a NEW query with a DIFFERENT label would disagree with the
    // committed header — refused as drift, never silently appended
    val input2 = MemoryStream[(Long, Double)]
    val e = intercept[Exception] {
      val q2 = input2.toDF().toDF("id", "v").writeStream
        .format("readstat")
        .option("checkpointLocation", s"$dir/ckpt2")
        .option("varLabels", "id:Different label")
        .start(sink)
      try { input2.addData((2L, 2.0)); q2.processAllAvailable() }
      finally q2.stop()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: msgs(t.getCause)
    assert(msgs(e).exists(_.contains("drift")), msgs(e).mkString(" | "))
    // same options from a new query DO append (new-query epoch reset)
    val input3 = MemoryStream[(Long, Double)]
    val q3 = input3.toDF().toDF("id", "v").writeStream
      .format("readstat")
      .option("checkpointLocation", s"$dir/ckpt3")
      .option("varLabels", "id:Person id")
      .start(sink)
    try { input3.addData((2L, 2.0)); q3.processAllAvailable() } finally q3.stop()
    val back = spark.read.format("readstat").load(sink)
    assert(back.count() == 2L)
    assert(back.schema("ID").metadata.getString("readstat.label") == "Person id")
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

  test("single-file streaming .sas7bdat sink: epochs append into ONE valid file") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_sassink").toFile
    dir.deleteOnExit()
    val sink = s"$dir/stream.sas7bdat"

    val input = MemoryStream[(Long, Double, String)]
    val query = input.toDF().toDF("id", "v", "s").writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .option("strWidth.s", "12")
      .format("readstat").start(sink)
    try {
      input.addData((1L, 1.5, "a"), (2L, 2.5, "bb"))
      query.processAllAvailable()
      // file is complete and valid between commits
      val mid = spark.read.format("readstat").load(sink)
      assert(mid.count() == 2L)
      // second epoch continues the PARTIAL last data page in place
      input.addData((3L, 3.5, "ccc"))
      query.processAllAvailable()
      val back = spark.read.format("readstat").load(sink)
      assert(back.count() == 3L)
      assert(back.columns.toSeq == Seq("id", "v", "s"))
      assert(back.agg(sum("v")).collect()(0).getDouble(0) == 7.5)
      assert(back.orderBy("id").select("s").collect()
        .map(_.getString(0)).toSeq == Seq("a", "bb", "ccc"))
      val md = graft.core.sas.SasCore.parse(sink)
      assert(md.rowCount == 3L && md.compression == 0)
      // over-width strings fail the task loudly, never truncate
      input.addData((4L, 4.0, "x" * 13))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        query.processAllAvailable()
      }
      assert(e.getMessage.contains("declared width") ||
        Option(e.getCause).exists(_.getMessage.contains("declared width")),
        e.getMessage)
    } finally query.stop()
  }

  test("single-file streaming rle .sas7bdat sink: epochs append whole compressed pages") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_sasrlesink").toFile
    dir.deleteOnExit()
    val sink = s"$dir/stream.sas7bdat"
    val input = MemoryStream[(Long, Double, String)]
    val query = input.toDF().toDF("id", "v", "s").writeStream
      .format("readstat")
      .option("checkpointLocation", s"$dir/ckpt")
      .option("compression", "rle")
      .option("strWidth.s", "24")
      .start(sink)
    try {
      input.addData((1L, 1.5, "padded string ab"), (2L, 2.5, "padded string cd"))
      query.processAllAvailable()
      assert(spark.read.format("readstat").load(sink).count() == 2L)
      // epoch 2 large enough to span multiple rle pages per partition
      input.addData((3L to 20002L).map(i => (i, i * 0.5, "padded string ef")): _*)
      query.processAllAvailable()
      val back = spark.read.format("readstat").load(sink)
      assert(back.count() == 20002L)
      val head = back.orderBy("id").limit(3).collect()
      assert(head.map(_.getDouble(0)).toSeq == Seq(1.0, 2.0, 3.0))
      assert(head.map(_.getString(2)).toSeq == Seq(
        "padded string ab", "padded string cd", "padded string ef"))
      // the file really is SASYZCRL-compressed, and the sidecar carries
      // the committed page count healing rebuilds positions from
      val md = graft.core.sas.SasCore.parse(sink)
      assert(md.compression != 0, s"expected compressed file, got ${md.compression}")
      val st = graft.spark.readstat.writers.StreamSinkCore.readState(sink).get
      assert(st.extra.toLong >= 2L, st.extra)
      assert(new java.io.File(sink).length() ==
        st.preLen + st.extra.toLong * graft.core.sas.SasCore.parse(sink).pageLength)
    } finally query.stop()
  }

  test("rle and uncompressed sas sink appends to one file refuse as drift") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_sasrledrift").toFile
    dir.deleteOnExit()
    val sink = s"$dir/drift.sas7bdat"
    val in1 = MemoryStream[(Long, Double)]
    val q1 = in1.toDF().toDF("id", "v").writeStream
      .format("readstat")
      .option("checkpointLocation", s"$dir/ckpt1")
      .start(sink)
    try { in1.addData((1L, 1.0)); q1.processAllAvailable() } finally q1.stop()
    val in2 = MemoryStream[(Long, Double)]
    val e = intercept[Exception] {
      val q2 = in2.toDF().toDF("id", "v").writeStream
        .format("readstat")
        .option("checkpointLocation", s"$dir/ckpt2")
        .option("compression", "rle")
        .start(sink)
      try { in2.addData((2L, 2.0)); q2.processAllAvailable() } finally q2.stop()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: msgs(t.getCause)
    assert(msgs(e).exists(_.contains("schema drift")), msgs(e).mkString(" | "))
  }

  test("sas7bdat sink: replay skip, new-query append, drift refusal") {
    import graft.spark.readstat.writers.SasStreamSink
    val dir = java.nio.file.Files.createTempDirectory("graft_sasreplay").toFile
    dir.deleteOnExit()
    val sink = s"$dir/replay.sas7bdat"
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "v DOUBLE, s STRING")
    def chunk(x: Double, s: String, w: Int): (Int, String, Long) = {
      val f = java.io.File.createTempFile("graft_saschunk", ".chunk")
      val bb = java.nio.ByteBuffer.allocate(8 + w)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putDouble(x)
      val sb = s.getBytes("UTF-8")
      val pad = Array.fill[Byte](w)(' ')
      System.arraycopy(sb, 0, pad, 0, sb.length)
      bb.put(pad)
      java.nio.file.Files.write(f.toPath, bb.array())
      (0, f.getAbsolutePath, 1L)
    }
    val opts = Map("strWidth.s" -> "8")
    SasStreamSink.commitEpoch(sink, 0L, Seq(chunk(1.0, "a", 8)), schema,
      opts, queryId = "q1")
    // same query replaying epoch 0: skipped
    SasStreamSink.commitEpoch(sink, 0L, Seq(chunk(9.0, "dup", 8)), schema,
      opts, queryId = "q1")
    assert(spark.read.format("readstat").load(sink).count() == 1L)
    // a NEW query appends from epoch 0 (fresh checkpoint, same file)
    SasStreamSink.commitEpoch(sink, 0L, Seq(chunk(2.0, "b", 8)), schema,
      opts, queryId = "q2")
    val back = spark.read.format("readstat").load(sink)
    assert(back.count() == 2L)
    assert(back.agg(sum("v")).collect()(0).getDouble(0) == 3.0)
    // width change = schema drift: refused before any byte moves
    val e = intercept[IllegalArgumentException] {
      SasStreamSink.commitEpoch(sink, 0L, Seq(chunk(3.0, "c", 16)), schema,
        Map("strWidth.s" -> "16"), queryId = "q3")
    }
    assert(e.getMessage.contains("schema drift"), e.getMessage)
    // an rle append to this uncompressed file is fingerprint drift (the
    // compression mode is part of the schema hash): refused, not mixed
    assert(intercept[IllegalArgumentException] {
      SasStreamSink.commitEpoch(sink, 0L, Nil, schema,
        opts + ("compression" -> "rle"), queryId = "q4")
    }.getMessage.contains("schema drift"))
    // crash healing: garbage past the committed boundary (a torn splice)
    // is overwritten and truncated by the next commit
    val raf = new java.io.RandomAccessFile(sink, "rw")
    try {
      raf.seek(raf.length())
      raf.write(Array.fill[Byte](100000)(0x5A))
    } finally raf.close()
    SasStreamSink.commitEpoch(sink, 1L, Seq(chunk(4.0, "d", 8)), schema,
      opts, queryId = "q2")
    val healed = spark.read.format("readstat").load(sink)
    assert(healed.count() == 3L)
    assert(healed.agg(sum("v")).collect()(0).getDouble(0) == 7.0)
  }

  test("sinks fail loudly on per-column options naming unknown columns") {
    // a typo'd column would otherwise silently lose the label/format the
    // user asked for (frame()/buildDictionary use getOrElse lookups) —
    // r10 review finding: the batch writers validate, the sinks didn't
    import graft.spark.readstat.writers.{SavStreamSink, StataStreamSink}
    val dir = java.nio.file.Files.createTempDirectory("graft_typo").toFile
    dir.deleteOnExit()
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id DOUBLE, v DOUBLE")
    def err(f: => Unit): String =
      intercept[IllegalArgumentException](f).getMessage
    def dta(opts: (String, String)*): String =
      err(StataStreamSink.commitEpoch(s"$dir/t.dta", 0L, Nil, schema, opts.toMap))
    def sav(opts: (String, String)*): String =
      err(SavStreamSink.commitEpoch(s"$dir/t.sav", 0L, Nil, schema, opts.toMap))
    assert(dta("varLabels" -> "sx:Sex").contains("unknown column"))
    assert(dta("valueLabels" -> "sx:1=M").contains("unknown column"))
    assert(dta("varFormats" -> "sx:%9.2f").contains("unknown column"))
    assert(sav("varLabels" -> "sx:Sex").contains("unknown column"))
    assert(sav("varMeasures" -> "sx:scale").contains("unknown column"))
    assert(sav("valueLabels" -> "sx:1=M").contains("unknown column"))
    assert(sav("varFormats" -> "sx:F8.2").contains("unknown column"))
  }

  test("sav sink refuses cross-query append with changed format width/decimals") {
    // same fmtType, different width/dec: the dictionary LENGTH is
    // unchanged (fixed-width fmt word), so only the schema hash can
    // refuse it — r10 review finding: hash the full fmt triple, not
    // just the type code
    import graft.spark.readstat.writers.SavStreamSink
    val dir = java.nio.file.Files.createTempDirectory("graft_fmtdrift").toFile
    dir.deleteOnExit()
    val sink = s"$dir/fmt.sav"
    val schema = org.apache.spark.sql.types.StructType.fromDDL("v DOUBLE")
    def chunk(x: Double): (Int, String, Long) = {
      val f = java.io.File.createTempFile("graft_fmtchunk", ".chunk")
      val bb = java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putDouble(x)
      java.nio.file.Files.write(f.toPath, bb.array())
      (0, f.getAbsolutePath, 1L)
    }
    SavStreamSink.commitEpoch(sink, 0L, Seq(chunk(1.0)), schema,
      Map("varFormats" -> "v:F8.2"), queryId = "q1")
    val e = intercept[IllegalArgumentException] {
      SavStreamSink.commitEpoch(sink, 0L, Seq(chunk(2.0)), schema,
        Map("varFormats" -> "v:F10.4"), queryId = "q2")
    }
    assert(e.getMessage.contains("schema drift"), e.getMessage)
    // identical formats from a new query still append fine
    SavStreamSink.commitEpoch(sink, 0L, Seq(chunk(3.0)), schema,
      Map("varFormats" -> "v:F8.2"), queryId = "q3")
    assert(spark.read.format("readstat").load(sink).count() == 2L)
  }
}
