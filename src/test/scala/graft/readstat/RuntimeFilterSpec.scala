package graft.readstat

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.connector.read.SupportsRuntimeFiltering
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{Filter, In, IsNotNull}

import graft.spark.readstat.{ReadstatScan, RuntimeFilteredPartition}

/** Runtime (DPP-style) filtering on the readstat scan (r13, SURVEY
  * §2.2): a broadcast join against a filtered small dimension hands the
  * scan an In-filter on the join key at execution time, and the scan
  * skips decoding the fact rows the build side ruled out. The filters
  * ride on re-planned [[RuntimeFilteredPartition]]s (the reader factory
  * predates `filter()`), and — like the static pushdown — the skip is
  * advisory: the join re-checks every surviving row, so correctness
  * never depends on it.
  */
class RuntimeFilterSpec extends SparkTestBase {

  private lazy val dir = {
    val d = Files.createTempDirectory("graft_rtf").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  /** 20k-row fact .dta: key = i % 100, payload double + string. */
  private lazy val factPath: String = {
    import spark.implicits._
    val p = s"$dir/fact.dta"
    (1 to 20000).map(i => (i % 100, i * 0.5, s"s${i % 7}"))
      .toDF("k", "x", "s")
      .write.format("readstat").mode("overwrite").save(p)
    p
  }

  private def readstatScan(df: DataFrame): ReadstatScan =
    df.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case b: BatchScanExec => b.scan }
      .getOrElse(fail("no BatchScanExec leaf")) match {
      case s: ReadstatScan => s
      case other => fail(s"unexpected scan ${other.getClass}")
    }

  test("scan advertises evaluable columns as runtime-filterable") {
    val scan = readstatScan(spark.read.format("readstat").load(factPath))
    assert(scan.isInstanceOf[SupportsRuntimeFiltering])
    val attrs = scan.filterAttributes().map(_.describe()).toSet
    assert(attrs == Set("k", "x", "s"), attrs.toString)
  }

  test("filter() re-plans partitions with the filters riding along; readers skip") {
    val scan = readstatScan(spark.read.format("readstat").load(factPath))
    // before filter(): plain partitions
    assert(!scan.toBatch.planInputPartitions()
      .exists(_.isInstanceOf[RuntimeFilteredPartition]))
    scan.filter(Array[Filter](In("k", Array(3, 17, 42))))
    val parts = scan.toBatch.planInputPartitions()
    assert(parts.nonEmpty &&
      parts.forall(_.isInstanceOf[RuntimeFilteredPartition]), parts.mkString(","))
    // drive the readers directly: only matching rows come back (the In
    // compiles on this plain int column, so the skip is exact here)
    val factory = scan.toBatch.createReaderFactory()
    val keys = scala.collection.mutable.ArrayBuffer[Int]()
    parts.foreach { part =>
      val r = factory.createReader(part)
      while (r.next()) keys += r.get().getInt(0)
      r.close()
    }
    assert(keys.length == 600, s"got ${keys.length} rows") // 3 of 100 keys × 200
    assert(keys.toSet == Set(3, 17, 42), keys.toSet.toString)
  }

  test("unsupported runtime filters are dropped, not applied") {
    val scan = readstatScan(spark.read.format("readstat").load(factPath))
    scan.filter(Array[Filter](In("no_such_col", Array(1))))
    val parts = scan.toBatch.planInputPartitions()
    assert(!parts.exists(_.isInstanceOf[RuntimeFilteredPartition]))
  }

  /** Every node of the final adaptive plan, descending into query
    * stages and reused subtrees (collect() treats them as leaves). */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] =
    p.collect { case n => n }.flatMap {
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case q: QueryStageExec => q +: allNodes(q.plan)
      case n => Seq(n)
    }

  test("broadcast join DPP reaches the scan end-to-end and prunes decode") {
    val dimPath = s"$dir/dim.parquet"
    import spark.implicits._
    (0 until 100).map(i => (i, if (i == 3 || i == 17 || i == 42) "hot" else "cold"))
      .toDF("dk", "cat").write.mode("overwrite").parquet(dimPath)

    val fact = spark.read.format("readstat").load(factPath)
    val dim = spark.read.parquet(dimPath).filter(col("cat") === "hot")
    val joined = fact.join(dim, col("k") === col("dk"))
      .groupBy("k").agg(count(lit(1)).as("n"), round(sum("x"), 2).as("sx"))
      .orderBy("k")
    val rows = joined.collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(3, 17, 42))
    assert(rows.forall(_.getLong(1) == 200L))

    val nodes = allNodes(joined.queryExecution.executedPlan)
    val scans = nodes.collect {
      case b: BatchScanExec if b.scan.isInstanceOf[ReadstatScan] => b
    }
    assert(scans.nonEmpty, "no readstat BatchScanExec in the executed plan")
    assert(scans.exists(_.runtimeFilters.nonEmpty),
      s"no runtime filters on the readstat scan:\n${joined.queryExecution.executedPlan}")
    // the skip must have engaged: the scan emitted (at most) the 600
    // matching rows plus nothing else — not the full 20k
    val out = scans.filter(_.runtimeFilters.nonEmpty)
      .map(_.metrics("numOutputRows").value).sum
    assert(out == 600, s"scan emitted $out rows; runtime skip did not engage")
  }

  test("runtime filters compose with statically pushed filters") {
    val dimPath = s"$dir/dim2.parquet"
    import spark.implicits._
    (0 until 100).map(i => (i, i % 2 == 0)).toDF("dk", "even")
      .write.mode("overwrite").parquet(dimPath)
    val fact = spark.read.format("readstat").load(factPath)
      .filter(col("x") > 5000.0) // static pushdown: i > 10000
    val dim = spark.read.parquet(dimPath).filter(col("even") === true)
      .select("dk")
    val joined = fact.join(dim, col("k") === col("dk"))
    val got = joined.collect()
    // expected: i in (10001..20000) with (i%100) even → 100 per even key × 50
    assert(got.length == 5000, s"got ${got.length}")
    assert(got.forall(r => r.getInt(0) % 2 == 0 && r.getDouble(1) > 5000.0))
  }

  test("double join keys: DPP may plan but never filters the scan — results exact") {
    // Spark wraps float/double join keys in KnownFloatingPointNormalized
    // and refuses to translate the wrapped runtime filter for any DSv2
    // source ("Can't translate ... to source filter" WARN). Pin that a
    // double-keyed join still computes exactly (the filter is dropped,
    // not half-applied) — and that if a future Spark starts translating
    // it, results stay identical (the skip is advisory either way).
    val dimPath = s"$dir/dimd.parquet"
    import spark.implicits._
    (0 until 100).map(i => (i.toDouble / 2, i % 3)).toDF("dk", "m")
      .write.mode("overwrite").parquet(dimPath)
    val fact = spark.read.format("readstat").load(factPath) // k is int
    val dim = spark.read.parquet(dimPath).filter(col("m") === 0)
      .select(col("dk"))
    val joined = fact.join(dim, col("k").cast("double") === col("dk"))
    val got = joined.collect()
    // dk in {0.0, 1.5, 3.0, ...}: integral dks divisible by 3 → k in
    // {0, 3, 6, ..., 49 range} with dk=k when 2k%6==0 → k ∈ {0,3,...,48}
    val hotK = (0 until 100).filter(_ % 3 == 0).map(_ / 2.0)
      .filter(d => d == math.rint(d)).map(_.toInt).toSet
    val expected = (1 to 20000).count(i => hotK.contains(i % 100))
    assert(got.length == expected, s"got ${got.length} want $expected")
  }

  test("IsNotNull probe matches what filter() accepts") {
    val scan = readstatScan(spark.read.format("readstat").load(factPath))
    val advertised = scan.filterAttributes().map(_.describe()).toSet
    advertised.foreach { c =>
      scan.filter(Array[Filter](IsNotNull(c)))
      assert(scan.toBatch.planInputPartitions()
        .forall(_.isInstanceOf[RuntimeFilteredPartition]), s"column $c")
      scan.filter(Array.empty[Filter]) // reset
    }
  }
}
