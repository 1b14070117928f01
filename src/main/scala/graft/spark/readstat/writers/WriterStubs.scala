package graft.spark.readstat.writers

import org.apache.spark.sql.DataFrame

// Phase C writers — SURVEY.md §7.2 step 8.
object SasCsvBundleWriter {
  def write(df: DataFrame, path: String, options: Map[String, String]): Unit =
    throw new UnsupportedOperationException("sas csv bundle writer not yet implemented")
}
