package graft.tools

import org.apache.spark.sql.SparkSession

/** Probe Spark 4.1 SQL surface: recursive CTEs, EXISTS decorrelation. */
object DevSqlProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val r = spark.sql(
        """WITH RECURSIVE t(n) AS (
          |  SELECT 1
          |  UNION ALL
          |  SELECT n + 1 FROM t WHERE n < 5)
          |SELECT sum(n) FROM t""".stripMargin).collect()
      println(s"[probe] recursive CTE: OK -> ${r.toSeq}")
    } catch { case e: Exception =>
      println(s"[probe] recursive CTE: FAIL ${e.getClass.getSimpleName}: ${e.getMessage.take(200)}")
    }
    try {
      val r = spark.sql(
        """WITH RECURSIVE reach(src, node) AS (
          |  SELECT 1 AS src, 1 AS node
          |  UNION
          |  SELECT r.src, r.node + 1 FROM reach r WHERE r.node < 4)
          |SELECT count(*), min(node), max(node) FROM reach""".stripMargin).collect()
      println(s"[probe] recursive UNION dedup: OK -> ${r.toSeq}")
    } catch { case e: Exception =>
      println(s"[probe] recursive UNION: FAIL ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}")
    }
    try {
      import spark.implicits._
      Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("x", "y")
        .createOrReplaceTempView("probe_edges")
      val r = spark.sql(
        """WITH RECURSIVE reach(src, node) AS (
          |  SELECT x AS src, x AS node FROM (SELECT DISTINCT x FROM
          |    (SELECT x FROM probe_edges UNION ALL SELECT y FROM probe_edges) t(x)) s
          |  UNION
          |  SELECT r.src, e.y FROM reach r
          |  JOIN (SELECT x, y FROM probe_edges
          |        UNION ALL SELECT y, x FROM probe_edges) e(x, y)
          |    ON e.x = r.node)
          |SELECT src, min(node) AS comp FROM reach GROUP BY src ORDER BY src""".stripMargin)
        .collect()
      println(s"[probe] recursive closure over view: OK -> ${r.toSeq}")
    } catch { case e: Exception =>
      println(s"[probe] recursive closure: FAIL ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}")
    }
    spark.stop()
  }
}
