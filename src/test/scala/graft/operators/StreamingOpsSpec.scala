package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.readstat.SparkTestBase
import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.{Event, Session}

/** Stateful streaming operators driven deterministically via MemoryStream. */
class StreamingOpsSpec extends SparkTestBase {

  // offset from epoch: an event exactly at the initial watermark (0)
  // would be dropped as late
  private def ts(min: Long): Timestamp = new Timestamp((1000 + min) * 60000L)

  test("flatMapGroupsWithState sessionization closes sessions by gap and timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = StreamingOps.sessionize(input.toDS(), gapMinutes = 30)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess_out")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      // user 1: two events 10 min apart (one session), then a 40-min gap
      // inside the same batch -> first session closes mid-stream
      input.addData(
        Event(1L, ts(0), "view", 1.0),
        Event(1L, ts(10), "view", 2.0),
        Event(1L, ts(50), "purchase", 5.0))
      q.processAllAvailable()
      val mid = spark.sql("SELECT * FROM sess_out").as[Session].collect()
      assert(mid.length == 1, s"expected 1 mid-stream session, got ${mid.toSeq}")
      assert(mid(0).userId == 1L && mid(0).nEvents == 2 && mid(0).totalValue == 3.0)
      assert(mid(0).sessionStart == ts(0) && mid(0).sessionEnd == ts(10))

      // advance the watermark far past user 1's open session (50 + 30 gap)
      // with unrelated traffic -> the open session closes via timeout
      input.addData(Event(2L, ts(200), "view", 0.5))
      q.processAllAvailable()
      input.addData(Event(2L, ts(201), "view", 0.5))
      q.processAllAvailable()
      val all = spark.sql("SELECT * FROM sess_out ORDER BY userId, sessionStart")
        .as[Session].collect()
      assert(all.length == 2, s"expected timed-out session, got ${all.toSeq}")
      assert(all(1).userId == 1L && all(1).nEvents == 1 &&
        all(1).sessionStart == ts(50) && all(1).totalValue == 5.0)
    } finally q.stop()
  }

  test("streaming funnel emits one completion when view->click->purchase lands") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val out = StreamingOps.funnelStream(input.toDS(), expireMinutes = 120)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("funnel_out")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      // user 1 completes across batches; user 2 clicks before viewing
      // (no completion); user 3 views only
      input.addData(
        Event(1L, ts(0), "view", 1.0),
        Event(2L, ts(0), "click", 1.0),
        Event(3L, ts(0), "view", 1.0))
      q.processAllAvailable()
      input.addData(
        Event(1L, ts(10), "click", 1.0),
        Event(2L, ts(10), "view", 1.0))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM funnel_out").count() == 0)
      input.addData(
        // completes user 1; the second, later purchase must NOT emit a
        // second completion
        Event(1L, ts(30), "purchase", 9.0),
        Event(1L, ts(40), "purchase", 2.0))
      q.processAllAvailable()
      val got = spark.sql("SELECT * FROM funnel_out")
        .as[StreamingOps.FunnelCompletion].collect()
      assert(got.length == 1, got.toSeq.toString)
      assert(got(0).userId == 1L && got(0).viewTs == ts(0) &&
        got(0).purchaseTs == ts(30) && got(0).convSeconds == 30 * 60)

      // user 2 completes the proper order after the early click
      input.addData(Event(2L, ts(20), "click", 1.0),
        Event(2L, ts(25), "purchase", 1.0))
      q.processAllAvailable()
      val all = spark.sql("SELECT * FROM funnel_out ORDER BY userId")
        .as[StreamingOps.FunnelCompletion].collect()
      assert(all.length == 2 && all(1).userId == 2L &&
        all(1).convSeconds == 15 * 60)
    } finally q.stop()
  }

  test("streaming funnel agrees with the batch funnel on the events table") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // real testdata through the streaming operator in ONE batch (the
    // in-batch sort makes single-batch delivery exactly order-free), vs
    // the same min-chain computed with batch operators
    val ev = graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))
      .as[(Long, Timestamp, String, Double)].collect()
      .map { case (u, t, tp, v) => Event(u, t, tp, v) }
    val input = MemoryStream[Event]
    val out = StreamingOps.funnelStream(input.toDS(), expireMinutes = 10000)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("funnel_parity")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(ev.toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.sql(
        "SELECT userId, convSeconds FROM funnel_parity ORDER BY userId")
      .as[(Long, Long)].collect().toSeq

    val base = graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
    def stage(tpe: String) = base.filter(col("event_type") === tpe)
      .select(col("user_id"), col("ts"))
    val v = stage("view").groupBy("user_id").agg(min("ts").as("t1"))
    val c = stage("click").join(v, "user_id").filter(col("ts") > col("t1"))
      .groupBy("user_id").agg(min("ts").as("t2"), min("t1").as("t1"))
    val p = stage("purchase").join(c, "user_id").filter(col("ts") > col("t2"))
      .groupBy("user_id").agg(min("ts").as("t3"), min("t1").as("t1"))
    val batch = p.select(col("user_id"),
        floor((unix_micros(col("t3")) - unix_micros(col("t1"))) / 1000000L)
          .cast("long").as("conv"))
      .orderBy("user_id").as[(Long, Long)].collect().toSeq
    assert(batch.nonEmpty, "testdata has no completed funnels — test is vacuous")
    assert(streamed == batch,
      s"stream/batch divergence:\nstream: $streamed\nbatch: $batch")
  }

  test("stream-stream range join pairs events within tolerance, bounded state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[Event]
    val errors = MemoryStream[Event]
    val joined = StreamingOps.streamRangeJoin(
      purchases.toDS().toDF("userId", "p_ts", "p_type", "p_value"),
      errors.toDS().toDF("userId", "e_ts", "e_type", "e_value"),
      key = "userId", leftTs = "p_ts", rightTs = "e_ts",
      toleranceMinutes = 60, watermark = "30 minutes")
    val q = joined.select("userId", "p_ts", "e_ts")
      .writeStream.outputMode("append")
      .format("memory").queryName("rj_out")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      purchases.addData(Event(1L, ts(100), "purchase", 1.0),
        Event(2L, ts(100), "purchase", 1.0))
      errors.addData(
        Event(1L, ts(130), "error", 0.0),   // within 60 min -> match
        Event(2L, ts(300), "error", 0.0))   // 200 min away -> no match
      q.processAllAvailable()
      // push both watermarks forward so the joined rows become emittable
      purchases.addData(Event(9L, ts(500), "purchase", 0.0))
      errors.addData(Event(9L, ts(510), "error", 0.0))
      q.processAllAvailable()
      purchases.addData(Event(8L, ts(700), "purchase", 0.0))
      errors.addData(Event(8L, ts(800), "error", 0.0))
      q.processAllAvailable()
      val got = spark.sql("SELECT userId FROM rj_out ORDER BY userId")
        .collect().map(_.getLong(0)).toSeq
      assert(got.contains(1L), s"in-tolerance pair missing: $got")
      assert(!got.contains(2L), s"out-of-tolerance pair emitted: $got")
      assert(got.contains(9L), s"same-batch pair missing: $got")
    } finally q.stop()
  }

  test("streaming stat-file sink writes one dta per microbatch, re-readable") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_sink").toFile
    dir.deleteOnExit()
    val input = MemoryStream[Event]
    val q = StreamingOps.writeStatFiles(
      input.toDS().toDF().withColumn("v2", col("value") * 2),
      dir.getAbsolutePath, "dta", s"${dir.getAbsolutePath}/_ckpt")
    try {
      input.addData(Event(1L, ts(0), "view", 1.0), Event(2L, ts(1), "view", 2.0))
      q.processAllAvailable()
      input.addData(Event(3L, ts(2), "buy", 3.0))
      q.processAllAvailable()
    } finally q.stop()
    val files = dir.listFiles().filter(_.getName.endsWith(".dta")).sortBy(_.getName)
    assert(files.length == 2, files.mkString(","))
    val back = spark.read.format("readstat")
      .load(files.map(_.getAbsolutePath).toIndexedSeq: _*)
    assert(back.count() == 3)
    assert(back.agg(sum("v2")).collect()(0).getDouble(0) == 12.0)
  }

  test("watermarked streaming dedup keeps one row per fingerprint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val docs = input.toDF().toDF("ts", "text")
    val out = StreamingOps.dedupStream(docs, "ts", "text", "10 minutes")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(
        (ts(0), "the quick brown fox"),
        (ts(1), "the  quick   brown fox"), // same fingerprint after normalize
        (ts(2), "a different document"))
      q.processAllAvailable()
      val n = spark.sql("SELECT count(*) FROM dedup_out").collect()(0).getLong(0)
      assert(n == 2, s"expected 2 unique docs, got $n")
    } finally q.stop()
  }

  test("windowed language/quality stats aggregate under a watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, String)]
    val docs = input.toDF().toDF("ts", "text", "lang")
    val out = StreamingOps.langQualityStats(docs, "ts", "text", "lang",
      window = "1 hour", watermark = "30 minutes")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("lq_out")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(
        (ts(0), "hello world", "en"),
        (ts(5), "one two three four", "en"),
        (ts(10), "bonjour le monde", "fr"))
      q.processAllAvailable()
      // close the first window by advancing the watermark
      input.addData((ts(200), "later doc", "en"))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT lang, n_docs, avg_tokens FROM lq_out ORDER BY lang").collect()
      assert(rows.length == 2, s"expected en+fr windows, got ${rows.toSeq}")
      assert(rows(0).getString(0) == "en" && rows(0).getLong(1) == 2)
      assert(rows(0).getDouble(2) == 3.0) // (2 + 4) / 2 tokens
      assert(rows(1).getString(0) == "fr" && rows(1).getLong(1) == 1)
    } finally q.stop()
  }

  test("streaming heavy hitters match batch counts exactly below capacity") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // skewed keys fed across two batches; capacity >= distinct per shard
    val batch1 = (0 until 2000).map(i => s"k${i % 37}")
    val batch2 = (0 until 3000).map(i => s"k${i % 53}")
    val input = MemoryStream[String]
    val out = StreamingOps.heavyHittersStream(input.toDS(),
      capacity = 256, shards = 4, emitK = 256)
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("hh_out")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(batch1: _*); q.processAllAvailable()
      input.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()
    // Update mode re-emits per trigger: the latest count per key is the max
    val streamed = spark.sql(
        "SELECT key, max(count) AS c, max(err) AS e FROM hh_out GROUP BY key")
      .as[(String, Long, Long)].collect()
    val truth = (batch1 ++ batch2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(streamed.map(_._1).toSet == truth.keySet)
    streamed.foreach { case (k, c, e) =>
      assert(c == truth(k), s"$k: streamed $c vs true ${truth(k)}")
      assert(e == 0L, s"$k: nonzero error below capacity")
    }
  }

  test("streaming per-group distinct matches batch COUNT(DISTINCT) exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // two days of user ids with heavy repetition, split across batches
    val b1 = (0 until 3000).map(i => ("d1", (i % 211).toLong)) ++
      (0 until 1000).map(i => ("d2", (i % 97).toLong))
    val b2 = (0 until 2000).map(i => ("d1", (i % 307).toLong)) ++
      (0 until 500).map(i => ("d2", (i % 89).toLong))
    val input = MemoryStream[(String, Long)]
    val out = StreamingOps.distinctStream(input.toDS(), k = 1024)
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("dist_out")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    // latest estimate per group = the max (kept-set size is monotone)
    val streamed = spark.sql(
        "SELECT `group`, max(estimate), min(CAST(isExact AS INT)) " +
        "FROM dist_out GROUP BY `group`")
      .as[(String, Long, Int)].collect()
      .map { case (g, v, e) => g -> ((v, e)) }.toMap
    val truth = (b1 ++ b2).groupBy(_._1).view
      .mapValues(_.map(_._2).distinct.size.toLong).toMap
    assert(streamed.keySet == truth.keySet)
    truth.foreach { case (g, n) =>
      assert(streamed(g)._1 == n, s"$g: streamed ${streamed(g)._1} vs true $n")
      assert(streamed(g)._2 == 1, s"$g: below capacity must be exact")
    }
  }

  test("streaming anomaly flags agree exactly with the batch query") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // real testdata in ONE batch: the in-batch (time, id) sort makes
    // delivery order identical to the batch window order, so the flag
    // sets — and every numeric column — must match bit-for-bit
    val ev = graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .as[(Long, Long, Timestamp, Double)].collect()
      .map { case (id, u, t, v) => StreamingOps.VEvent(u, id, t, v) }
    val input = MemoryStream[StreamingOps.VEvent]
    val out = StreamingOps.anomalyStream(input.toDS(), expireMinutes = 100000)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("anom_parity")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(ev.toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.sql(
        """SELECT userId, eventId, value, mu, z FROM anom_parity
          |ORDER BY userId, eventId""".stripMargin)
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    val batch = graft.queries.Analytics
      .eventsAnomaly(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("event_id"), col("value"), col("mu"), col("z"))
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    assert(batch.nonEmpty, "no anomalies at sf0.001 — parity test is vacuous")
    assert(streamed == batch,
      s"stream/batch divergence:\nstream: ${streamed.take(5)}…\nbatch: ${batch.take(5)}…")
  }

  test("streaming anomaly scores cross-batch against prior-batch state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingOps.VEvent]
    val out = StreamingOps.anomalyStream(input.toDS(),
      cap = 20, minPrior = 10, zThreshold = 2.2, expireMinutes = 100000)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("anom_xbatch")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      // batch 1: ten calm events (value 10) — builds state, no flags
      input.addData((0 until 10).map(i =>
        StreamingOps.VEvent(7L, i.toLong, ts(i.toLong), 10.0)): _*)
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM anom_xbatch").count() == 0)
      // batch 2: one calm then one wild event — only the wild one flags,
      // scored against state carried over from batch 1
      input.addData(
        StreamingOps.VEvent(7L, 100L, ts(20), 10.1),
        StreamingOps.VEvent(7L, 101L, ts(21), 500.0))
      q.processAllAvailable()
      val flags = spark.sql(
          "SELECT userId, eventId FROM anom_xbatch ORDER BY eventId")
        .as[(Long, Long)].collect().toSeq
      assert(flags == Seq((7L, 101L)), s"got $flags")
    } finally q.stop()
  }
}
