package graft.queries

import graft.readstat.SparkTestBase
import org.apache.spark.sql.functions._

/** Independent local replays of the round-8 analytics queries (BM25,
  * CDC latest/SCD2, gap-fill) over the sf0.001 testdata. The driver's
  * DuckDB oracle is the cross-engine check; these pin the semantics
  * against straight Scala reimplementations.
  */
class AnalyticsSpec extends SparkTestBase {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("bm25 matches a local scoring replay") {
    val terms = Seq("query", "join", "vector")
    val docs = Tables.documents(spark, dir)
      .select($"doc_id".cast("long"), $"text").as[(Long, String)].collect()
    val toks = docs.map { case (id, t) =>
      id -> t.trim.toLowerCase.split("\\s+").toSeq }
    val n = toks.length.toLong
    val avgdl = toks.map(_._2.size).sum.toDouble / n
    val dfm = terms.map(t => t -> toks.count(_._2.contains(t)).toLong).toMap
    def score(dl: Int, tfs: Map[String, Int]): Double =
      terms.map { t =>
        val tf = tfs.getOrElse(t, 0)
        if (tf == 0) 0.0
        else {
          val idf = math.log(1.0 + (n - dfm(t) + 0.5) / (dfm(t) + 0.5))
          idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
        }
      }.sum
    val want = toks.map { case (id, ws) =>
      val tfs = terms.map(t => t -> ws.count(_ == t)).toMap
      val s = BigDecimal(score(ws.size, tfs))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      (id, s, tfs.values.count(_ > 0))
    }.filter(_._2 > 0).sortBy { case (id, s, _) => (-s, id) }.take(20).toSeq
    val got = Analytics.bm25Topk(spark, dir)
      .as[(Long, Double, Int)].collect().toSeq
    assert(got == want)
    assert(got.nonEmpty && got.head._2 >= got.last._2)
  }

  test("cdc_latest_state keeps the last non-tombstone event per user") {
    val ev = Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"event_type",
        round($"value", 2).as("value"), unix_micros($"ts").as("us"))
      .as[(Long, Long, String, Double, Long)].collect()
    val want = ev.groupBy(_._1).toSeq.flatMap { case (uid, rows) =>
      val last = rows.maxBy(r => (r._5, r._2))
      val op = last._3 match {
        case "signup" => "I"; case "error" => "D"; case _ => "U" }
      if (op == "D") None
      else Some((uid, last._2, op, last._4, last._5))
    }.sortBy(_._1)
    val got = Analytics.cdcLatestState(spark, dir)
      .as[(Long, Long, String, Double, Long)].collect().toSeq
    assert(got == want)
    // the tombstone branch is live: some users' latest op is a delete
    val users = ev.map(_._1).distinct.length
    assert(got.size < users, "no user ended on a delete — vacuous mapping")
  }

  test("cdc_scd2_intervals chains half-open versions per user") {
    val got = Analytics.cdcScd2Intervals(spark, dir).collect()
    val total = Tables.events(spark, dir).count()
    assert(got.length == total, "every event opens exactly one version")
    val byUser = got.groupBy(_.getLong(0))
    byUser.foreach { case (uid, rows) =>
      // rows arrive ordered (user, valid_from, event_id)
      rows.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(5) == b.getLong(4),
            s"user $uid: valid_to must equal the next valid_from")
        case _ =>
      }
      assert(rows.count(_.getInt(6) == 1) == 1,
        s"user $uid: exactly one current version")
      assert(rows.last.isNullAt(5) == false || rows.last.getInt(6) == 1)
    }
  }

  test("events_gapfill densifies each user's day span and forward-fills") {
    val got = Analytics.eventsGapfill(spark, dir)
      .as[(Long, String, Long, Double, Double)].collect().toSeq
    val byUser = got.groupBy(_._1)
    val fmt = java.time.format.DateTimeFormatter.ISO_LOCAL_DATE
    byUser.foreach { case (uid, rows) =>
      val days = rows.map(r => java.time.LocalDate.parse(r._2, fmt))
      // contiguous: every consecutive pair is exactly one day apart
      days.sliding(2).foreach {
        case Seq(a, b) => assert(b == a.plusDays(1), s"user $uid gap at $a")
        case _ =>
      }
      // zero-filled gap rows carry the previous day's value forward
      rows.sliding(2).foreach {
        case Seq(prev, cur) if cur._3 == 0 =>
          assert(cur._4 == 0.0)
          assert(cur._5 == prev._5, s"user $uid: ffill broke at ${cur._2}")
        case _ =>
      }
    }
    // per-user event totals survive the densification
    val wantTotals = Tables.events(spark, dir).groupBy("user_id")
      .agg(count(lit(1)).as("n")).as[(Long, Long)].collect().toMap
    val gotTotals = byUser.view.mapValues(_.map(_._3).sum).toMap
    assert(gotTotals == wantTotals)
    // gaps exist at this SF — otherwise the fill logic is untested
    assert(got.exists(_._3 == 0), "no gap days — vacuous")
  }
}
