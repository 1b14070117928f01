package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Relational, Similarity, Text}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator names (SURVEY.md §2 inventory + the
  * training-data-pipeline layer) to DataFrame builders over a scale-factor
  * directory; `oracleSql` holds the DuckDB-equivalent SQL the driver runs
  * on the same parquet tables. Column names/order and row order match the
  * Spark output exactly (the driver hashes after sorting columns by name).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q3Shipping(spark, "/root/testdata/sf0.001")

  private val registry: Map[String, ((SparkSession, String) => DataFrame, String)] =
    Relational.all ++ Text.all ++ Similarity.all ++
    _root_.graft.queries.ReadstatQueries.all ++ _root_.graft.queries.Pipeline.all ++
    _root_.graft.queries.Curation.all ++ _root_.graft.queries.Analytics.all

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (k, (fn, _)) => k -> fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    registry.collect { case (k, (_, sql)) if sql.nonEmpty => k -> sql }
}
