package graft.queries

import graft.SparkEntry
import graft.readstat.SparkTestBase

/** Environment-pinning test: the driver's oracle harness (and any plain
  * Spark 4 session) reads the testdata WITHOUT
  * `spark.sql.legacy.parquet.nanosAsLong`, so `events.ts` — currently
  * parquet `timestamp[us]` with no timezone — arrives as TIMESTAMP_NTZ.
  * Round 7 shipped two queries that analyzed only against the older
  * nanos-as-long testdata; they threw DATATYPE_MISMATCH in every real
  * session and silently vanished from the correctness record.
  *
  * This spec runs EVERY registry query through Catalyst analysis in a
  * session with nanosAsLong off — the exact check that would have caught
  * that regression the day the testdata changed. Analysis only (no
  * execution): type errors like `unix_micros` on NTZ, unresolved
  * columns, and watermark-type violations all surface at analysis.
  */
class NtzEnvironmentSpec extends SparkTestBase {

  test("every registry query analyzes in a session without nanosAsLong") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    s2.conf.set("spark.sql.session.timeZone", "UTC")
    val dir = "/root/testdata/sf0.001"
    val errs = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(s2, dir).queryExecution.assertAnalyzed(); None }
      catch { case t: Throwable =>
        Some(s"$name: ${t.getClass.getSimpleName}: " +
          String.valueOf(t.getMessage).take(300))
      }
    }
    assert(errs.isEmpty, "queries failing analysis in the driver-oracle " +
      s"environment:\n${errs.mkString("\n")}")
  }
}
