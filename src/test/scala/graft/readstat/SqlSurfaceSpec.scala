package graft.readstat

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Pure-SQL access to stat files — the surface a SQL-only user (JDBC,
  * notebooks, `spark.sql`) needs to adopt the connector without any
  * Scala: CREATE TABLE ... USING readstat, metadata tables, and writes
  * via INSERT. */
class SqlSurfaceSpec extends SparkTestBase {

  private def tmpDir(): String = {
    val d = Files.createTempDirectory("graft_sql").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("CREATE TABLE USING readstat reads a dta file from plain SQL") {
    import spark.implicits._
    val dir = tmpDir()
    (1 to 50).map(i => (i.toLong, s"v$i", i * 0.5))
      .toDF("id", "s", "v")
      .write.format("readstat").mode("overwrite").save(s"$dir/t.dta")
    spark.sql("DROP TABLE IF EXISTS sql_dta")
    spark.sql(
      s"CREATE TABLE sql_dta USING readstat OPTIONS (path '$dir/t.dta')")
    try {
      val got = spark.sql(
        "SELECT count(*) AS n, sum(v) AS sv FROM sql_dta WHERE id <= 10")
        .collect()(0)
      assert(got.getLong(0) == 10L)
      assert(got.getDouble(1) == (1 to 10).map(_ * 0.5).sum)
      // projection pushdown survives the SQL path: only `s` is decoded
      val plan = spark.sql("SELECT s FROM sql_dta").queryExecution
        .executedPlan.toString
      assert(plan.contains("cols=s"), plan.take(800))
    } finally spark.sql("DROP TABLE sql_dta")
  }

  test("CREATE TABLE over a multiFile directory + readstat-metadata in SQL") {
    import spark.implicits._
    val dir = tmpDir()
    (1 to 200).map(i => (i.toLong, i % 7)).toDF("id", "grp")
      .repartition(4)
      .write.format("readstat").mode("overwrite")
      .option("multiFile", "true").save(s"$dir/m.dta")
    spark.sql("DROP TABLE IF EXISTS sql_mdta")
    spark.sql(
      s"CREATE TABLE sql_mdta USING readstat OPTIONS (path '$dir/m.dta')")
    try {
      assert(spark.sql("SELECT count(*) FROM sql_mdta").collect()(0)
        .getLong(0) == 200L)
      // per-variable metadata table, also from SQL only
      spark.sql("DROP TABLE IF EXISTS sql_meta")
      spark.sql("CREATE TABLE sql_meta USING `readstat-metadata` " +
        s"OPTIONS (path '$dir/m.dta')")
      try {
        val names = spark.sql("SELECT name FROM sql_meta ORDER BY name")
          .collect().map(_.getString(0)).toSeq
        assert(names == Seq("grp", "id"))
      } finally spark.sql("DROP TABLE sql_meta")
    } finally spark.sql("DROP TABLE sql_mdta")
  }

  test("INSERT INTO a readstat table appends through the writer") {
    import spark.implicits._
    val dir = tmpDir()
    Seq((1.0, "a"), (2.0, "b")).toDF("id", "s")
      .write.format("readstat").mode("overwrite").save(s"$dir/w.dta")
    spark.sql("DROP TABLE IF EXISTS sql_wdta")
    spark.sql(
      s"CREATE TABLE sql_wdta USING readstat OPTIONS (path '$dir/w.dta')")
    try {
      spark.sql("INSERT OVERWRITE sql_wdta VALUES (3.0, 'c'), (4.0, 'd')")
      val back = spark.read.format("readstat").load(s"$dir/w.dta")
      assert(back.count() == 2L)
      assert(back.select("s").as[String].collect().toSet == Set("c", "d"))
    } finally spark.sql("DROP TABLE sql_wdta")
  }
}
