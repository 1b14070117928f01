package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Helpers to load the driver-generated TPC-H-ish parquet tables
  * (see /root/repo/TESTDATA.md). All queries take the sf directory so the
  * same code runs at any scale factor.
  */
object Tables {
  /** Whitespace token boundary, spelled as an explicit character class so
    * the java.util.regex side and the DuckDB (RE2) oracle side agree BY
    * CONSTRUCTION: RE2's \s is exactly [ \t\n\f\r], while Java's \s also
    * includes \x0B (vertical tab) — a document containing \x0B would
    * tokenize differently across engines and break the hash gate. Every
    * Spark-side whitespace tokenizer uses this constant; oracle SQL may
    * keep RE2 \s (the identical set). */
  val Ws = "[ \\t\\n\\f\\r]+"

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  /** Normalize `events.ts` to TimestampType regardless of how the parquet
    * file stores it, so every downstream consumer (instant arithmetic via
    * `unix_micros`, streaming watermarks) sees a concrete instant type:
    *
    *  - TIMESTAMP(NANOS): Spark 4 reads it as LongType only under
    *    spark.sql.legacy.parquet.nanosAsLong — rebuild micros from nanos.
    *  - timestamp[us] with no timezone: Spark reads TIMESTAMP_NTZ, which
    *    `unix_micros` / watermarks reject. Cast to TimestampType — the
    *    session timezone is pinned to UTC (build.sbt), so the cast is an
    *    identity on the underlying micros value.
    *
    * This mirrors how the reference lands file temporals on concrete
    * dtypes before any expression work (polars_readstat,
    * src/stata/polars_output.rs:782-828).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = t(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.col("ts") / 1000L cast "long"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.col("ts")
            .cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
