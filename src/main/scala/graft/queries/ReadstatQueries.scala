package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables._

/** Driver-gate coverage for the readstat connector: each query routes
  * testdata through our writer + DSv2 reader and aggregates; the DuckDB
  * oracle computes the same aggregate over the original parquet. A hash
  * match therefore certifies the whole binary write→read path (types,
  * nulls, temporal conversion, pushdown) — DuckDB can't read .dta, so
  * this is the strongest oracle available to the driver.
  */
object ReadstatQueries {

  private def scratch(d: String, name: String): String = {
    val tag = d.replaceAll("[^a-zA-Z0-9]", "_")
    s"/tmp/graft_rt/${tag}_$name"
  }

  /** Runs INDEPENDENT eager actions (scratch-file writes to distinct
    * paths) from a small thread pool so their fixed job overheads
    * overlap — Spark schedules concurrent jobs FIFO and back-fills idle
    * cores (guide §2.6); the stat writers hold no shared mutable state.
    * r14 optimization: the setup writes of the roundtrip queries ran
    * strictly sequentially, serializing 2-4 single-task jobs each. */
  private def parActions(fs: Seq[() => Unit]): Unit = if (fs.nonEmpty) {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(fs.size)
    try {
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      // no deadline (r15, ADVICE): the old sequential code had none, and
      // a fixed 10-min Await would turn a merely-slow large-SF write
      // into a TimeoutException; a genuinely wedged write should hang
      // visibly (and be diagnosed), not be converted into a failure here
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(fs.map(f => scala.concurrent.Future(f()))),
        scala.concurrent.duration.Duration.Inf)
      ()
    } finally pool.shutdown()
  }

  /** lineitem → .dta → read → Q1-style aggregate (dates as strings). */
  def dtaRoundtripAgg(s: SparkSession, d: String): DataFrame = {
    val path = scratch(d, "lineitem.dta")
    lineitem(s, d)
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_returnflag"), col("l_shipdate"))
      .write.format("readstat").mode("overwrite").save(path)
    val back = s.read.format("readstat").load(path)
    back.groupBy("l_returnflag")
      .agg(count(lit(1)).as("cnt"),
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"),
        date_format(min("l_shipdate"), "yyyy-MM-dd HH:mm:ss").as("min_ship"),
        date_format(max("l_shipdate"), "yyyy-MM-dd HH:mm:ss").as("max_ship"))
      .orderBy("l_returnflag")
  }

  val dtaRoundtripAggSql: String =
    """SELECT l_returnflag, count(*) AS cnt,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
      |  strftime(min(l_shipdate), '%Y-%m-%d %H:%M:%S') AS min_ship,
      |  strftime(max(l_shipdate), '%Y-%m-%d %H:%M:%S') AS max_ship
      |FROM lineitem
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Projection + filter over a .dta scan: only 2 of 5 written columns are
    * decoded (SupportsPushDownRequiredColumns reaches the byte planner). */
  def dtaPushdown(s: SparkSession, d: String): DataFrame = {
    val path = scratch(d, "orders.dta")
    orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderstatus"), col("o_orderpriority"))
      .write.format("readstat").mode("overwrite").save(path)
    s.read.format("readstat").load(path)
      .select(col("o_orderstatus"), col("o_totalprice"))
      .filter(col("o_totalprice") > 50000)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
      .orderBy("o_orderstatus")
  }

  val dtaPushdownSql: String =
    """SELECT o_orderstatus, count(*) AS n,
      |       round(sum(o_totalprice), 2) AS total
      |FROM orders WHERE o_totalprice > 50000
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Decode-skipping filter pushdown (r12, SURVEY §2.2): a multi-
    * conjunct predicate — numeric range + string equality + null-prone
    * column — evaluated INSIDE the scan (failing rows' other cells are
    * never decoded), hash-gated against DuckDB applying the same
    * predicate to the original parquet. Pins null semantics (comparisons
    * reject nulls), string binary equality and the conjunction logic of
    * the pushed predicate. */
  def dtaFilterPushdown(s: SparkSession, d: String): DataFrame = {
    val path = scratch(d, "orders_fp.dta")
    orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderstatus"), col("o_orderpriority"))
      .write.format("readstat").mode("overwrite").save(path)
    s.read.format("readstat").load(path)
      .filter(col("o_totalprice") > 100000 && col("o_totalprice") <= 200000 &&
        col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
        col("o_orderstatus") =!= "F")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        // keys may read back as double (dta has no int64) — pin BIGINT
        sum(col("o_orderkey").cast("long")).as("sum_key"),
        round(sum("o_totalprice"), 2).as("total"))
      .orderBy("o_orderpriority")
  }

  val dtaFilterPushdownSql: String =
    """SELECT o_orderpriority, count(*) AS n,
      |  CAST(sum(o_orderkey) AS BIGINT) AS sum_key,
      |  round(sum(o_totalprice), 2) AS total
      |FROM orders
      |WHERE o_totalprice > 100000 AND o_totalprice <= 200000
      |  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
      |  AND o_orderstatus <> 'F'
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Temporal filter pushdown (r13, SURVEY §2.2): date-range + timestamp
    * conjuncts evaluated INSIDE the scan — the literals convert once at
    * compile to days/micros and every row is a primitive long compare
    * (date filters are the most common real filter on survey data; the
    * r12 compiler refused temporals and left them entirely to the
    * residual). Hash-gated against DuckDB applying the same predicate
    * to the original parquet, so the dta %td/%tc roundtrip AND the
    * pushed evaluation must both be exact. */
  def dtaTemporalFilterPushdown(s: SparkSession, d: String): DataFrame = {
    val path = scratch(d, "lineitem_tfp.dta")
    lineitem(s, d)
      .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"),
        col("l_shipdate").cast("date").as("ship_d"),
        col("l_shipdate").as("ship_ts"))
      .write.format("readstat").mode("overwrite").save(path)
    s.read.format("readstat").load(path)
      .filter(col("ship_d") >= lit("1996-01-01").cast("date") &&
        col("ship_d") < lit("1998-01-01").cast("date") &&
        col("ship_ts") > lit("1996-06-15 12:00:00").cast("timestamp_ntz"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        round(sum("l_quantity"), 2).as("sum_qty"),
        date_format(min("ship_d"), "yyyy-MM-dd").as("min_d"),
        date_format(max("ship_ts"), "yyyy-MM-dd HH:mm:ss").as("max_ts"))
      .orderBy("l_returnflag")
  }

  val dtaTemporalFilterPushdownSql: String =
    """SELECT l_returnflag, count(*) AS n,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  strftime(min(CAST(l_shipdate AS DATE)), '%Y-%m-%d') AS min_d,
      |  strftime(max(l_shipdate), '%Y-%m-%d %H:%M:%S') AS max_ts
      |FROM lineitem
      |WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
      |  AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
      |  AND l_shipdate > TIMESTAMP '1996-06-15 12:00:00'
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** String predicate pushdown (r13): StartsWith/EndsWith/Contains
    * conjuncts (including an OR of two prefixes) evaluated inside the
    * sav scan via UTF8String prefix/suffix/contains — common shapes in
    * text-corpus paths. Residual-covered as always; the hash gate pins
    * the skip logic never drops a kept row. */
  def savStringFilterPushdown(s: SparkSession, d: String): DataFrame = {
    val path = scratch(d, "orders_sfp.sav")
    orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"),
        col("o_orderstatus"), col("o_orderpriority"))
      .write.format("readstat").mode("overwrite").save(path)
    s.read.format("readstat").load(path)
      .filter((col("o_orderpriority").startsWith("1-") ||
          col("o_orderpriority").startsWith("2-")) &&
        (col("o_orderpriority").endsWith("T") ||
          col("o_orderpriority").endsWith("H")) &&
        col("o_orderpriority").contains("G") &&
        col("o_orderstatus").contains("O"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(col("o_orderkey").cast("long")).as("sum_key"),
        round(sum("o_totalprice"), 2).as("total"))
      .orderBy("o_orderpriority")
  }

  val savStringFilterPushdownSql: String =
    """SELECT o_orderpriority, count(*) AS n,
      |  CAST(sum(o_orderkey) AS BIGINT) AS sum_key,
      |  round(sum(o_totalprice), 2) AS total
      |FROM orders
      |WHERE (o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%')
      |  AND (o_orderpriority LIKE '%T' OR o_orderpriority LIKE '%H')
      |  AND o_orderpriority LIKE '%G%'
      |  AND o_orderstatus LIKE '%O%'
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Runtime (DPP-style) join pruning (r13, SURVEY §2.2): a .dta fact
    * scan broadcast-joined to a selectively filtered parquet dimension.
    * The scan advertises its join key via SupportsRuntimeFiltering, so
    * Catalyst's PartitionPruning rule attaches a DynamicPruningSubquery:
    * at execution the broadcast build side hands the scan an In-filter
    * on the fact keys that survive the dimension filter, and the scan
    * skips decoding every other row — at 100 TB, the difference between
    * decoding a full fact corpus and only the joined slice. The skip is
    * advisory (the join re-checks), and the oracle computes the same
    * join over the original parquet. */
  def dtaRuntimePruneJoin(s: SparkSession, d: String): DataFrame = {
    val path = scratch(d, "orders_rpj.dta")
    // the join key must stay INTEGER end to end: Spark wraps
    // float/double join keys in KnownFloatingPointNormalized, which
    // runtime-filter translation refuses for every DSv2 source — a
    // double-keyed version of this query would still plan the
    // DynamicPruningSubquery but the In-filter would never reach the
    // scan (WARN: "Can't translate ... to source filter")
    orders(s, d)
      .select(col("o_orderkey"), col("o_custkey").cast("int").as("o_custkey"),
        col("o_totalprice"), col("o_orderstatus"))
      .write.format("readstat").mode("overwrite").save(path)
    val fact = s.read.format("readstat").load(path)
    val dim = customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").cast("int").as("ck"), col("c_nationkey"))
    fact.join(dim, fact("o_custkey") === dim("ck"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("c_nationkey")).as("nations"),
        round(sum("o_totalprice"), 2).as("total"))
      .orderBy("o_orderstatus")
  }

  val dtaRuntimePruneJoinSql: String =
    """SELECT o_orderstatus, count(*) AS n,
      |  count(DISTINCT c_nationkey) AS nations,
      |  round(sum(o_totalprice), 2) AS total
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** OFFSET pushdown (r13, SURVEY §2.2 offset/slice): the file is
    * written in o_orderkey order (sort + coalesce(1) → single .dta in
    * that row order), so `df.offset(n)` — which the scan applies by
    * planning partitions starting AT row n, zero prefix bytes read —
    * selects a well-defined slice the oracle reproduces with ORDER BY
    * + OFFSET. Aggregation makes the compare order-insensitive. */
  def dtaOffsetSlice(s: SparkSession, d: String): DataFrame = {
    val path = scratch(d, "orders_off.dta")
    orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      .orderBy("o_orderkey")
      .coalesce(1)
      .write.format("readstat").mode("overwrite").save(path)
    s.read.format("readstat").load(path)
      .offset(5000)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(col("o_orderkey").cast("long")).as("sum_key"),
        round(sum("o_totalprice"), 2).as("total"))
      .orderBy("o_orderstatus")
  }

  val dtaOffsetSliceSql: String =
    """SELECT o_orderstatus, count(*) AS n,
      |  CAST(sum(o_orderkey) AS BIGINT) AS sum_key,
      |  round(sum(o_totalprice), 2) AS total
      |FROM (SELECT * FROM orders ORDER BY o_orderkey OFFSET 5000)
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** SAS offset pushdown (r13): same slice as [[dtaOffsetSlice]] but
    * through the .sas7bdat page planner — the cached page-row prefix
    * finds the offset's page and `skipRows` drops the mid-page
    * remainder positionally (the reference's `with_offset` sliced SAS
    * read, done exactly instead of by page estimation + lookback). */
  def sasOffsetSlice(s: SparkSession, d: String): DataFrame = {
    val path = scratch(d, "orders_off.sas7bdat")
    orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      .orderBy("o_orderkey")
      .coalesce(1)
      .write.format("readstat").mode("overwrite").save(path)
    s.read.format("readstat").load(path)
      .offset(5000)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(col("o_orderkey").cast("long")).as("sum_key"),
        round(sum("o_totalprice"), 2).as("total"))
      .orderBy("o_orderstatus")
  }

  val sasOffsetSliceSql: String = dtaOffsetSliceSql

  /** zsav offset pushdown (r14, the last sequential regimes closed —
    * reference slice pushdown reaches every format, __init__.py:631-661):
    * same slice as [[dtaOffsetSlice]] but through the zlib-compressed
    * regime. A small partition target forces the CHECKPOINT path: the
    * scan resumes the command-stream state at the nearest checkpoint
    * ≤ offset and decode-forwards the mid-interval remainder, inflating
    * none of the blocks before it — at 100 TB, paginating a compressed
    * corpus touches only the blocks the page overlaps. */
  def zsavOffsetSlice(s: SparkSession, d: String): DataFrame = {
    val path = scratch(d, "orders_off.zsav")
    orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      .orderBy("o_orderkey")
      .coalesce(1)
      .write.format("readstat").mode("overwrite").save(path)
    s.read.format("readstat")
      .option("partitionTargetBytes", "32768")
      .load(path)
      .offset(5000)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(col("o_orderkey").cast("long")).as("sum_key"),
        round(sum("o_totalprice"), 2).as("total"))
      .orderBy("o_orderstatus")
  }

  val zsavOffsetSliceSql: String = dtaOffsetSliceSql

  /** POR offset pushdown (r14): the base-30 ASCII stream cannot seek,
    * but the parallel-scan checkpoint index resumes the line state at
    * the nearest checkpoint ≤ offset and boundary-SKIMS the remainder
    * (cell boundaries only — no base-30 parse, no String building). */
  def porOffsetSlice(s: SparkSession, d: String): DataFrame = {
    val path = scratch(d, "orders_off.por")
    // POR variable names are 8-char uppercase — alias within the limit
    orders(s, d)
      .select(col("o_orderkey").as("okey"), col("o_totalprice").as("tprice"),
        col("o_orderstatus").as("ostatus"))
      .orderBy("okey")
      .coalesce(1)
      .write.format("readstat").mode("overwrite").save(path)
    s.read.format("readstat")
      .option("partitionTargetBytes", "32768")
      .load(path)
      .offset(5000)
      .groupBy("OSTATUS")
      .agg(count(lit(1)).as("n"),
        sum(col("OKEY").cast("long")).as("sum_key"),
        round(sum("TPRICE"), 2).as("total"))
      .orderBy("OSTATUS")
  }

  val porOffsetSliceSql: String =
    """SELECT o_orderstatus AS OSTATUS, count(*) AS n,
      |  CAST(sum(o_orderkey) AS BIGINT) AS sum_key,
      |  round(sum(o_totalprice), 2) AS total
      |FROM (SELECT * FROM orders ORDER BY o_orderkey OFFSET 5000)
      |GROUP BY o_orderstatus ORDER BY OSTATUS""".stripMargin

  /** Multi-file offset+limit pushdown (r14): orders split into four
    * contiguous .dta chunks (name-sorted directory read preserves the
    * global o_orderkey order); the window [5000, 12000) maps onto the
    * directory's cumulative METADATA row prefix, so chunk 0 and the
    * tail beyond the window plan zero partitions and their data bytes
    * are never opened — the 1000-small-files directory (this engine's
    * characteristic deployment) pages without touching out-of-window
    * files. */
  /** Shared setup of the directory-scan queries: orders(o_orderkey,
    * o_totalprice, o_orderstatus) written as four contiguous,
    * o_orderkey-ordered .dta quartile chunks part0..part3 under `dir`.
    *
    * r14 optimization: the row-numbered frame persists across the four
    * chunk writes — each write previously re-ran the full single-task
    * window sort, four sort passes producing one result (guide §2.4:
    * share one exchange/sort across consumers) — and the four writes
    * are submitted from a small thread pool so their fixed single-task
    * job overheads overlap (guide §2.6; the writers hold no shared
    * mutable state and target distinct paths). The persist is released
    * before returning, so the session stays cache-clean
    * (CacheHygieneSpec). Measured 2.0 s → ~1.0 s per query at sf0.1. */
  private def writeOrderQuartiles(s: SparkSession, d: String, dir: String): Unit = {
    val src = orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    val n = src.count()
    // r15: NO global row_number window at all (its single sort task held
    // the whole table — the one remaining scale-killer of this setup,
    // r14 verdict). o_orderkey is unique (TPC-H primary key), so the
    // rank ranges (k·n/4, (k+1)·n/4] select exactly the key ranges
    // (b(k), b(k+1)] where b(j) is the j·n/4-th smallest key — an exact
    // order statistic read off a PARALLEL range sort of the bare key
    // column (8 B/row) via zipWithIndex. The narrow sorted-key RDD is
    // persisted only because zipWithIndex runs its own partition-count
    // job before the boundary lookup. Each chunk write then filters its
    // key range straight off the source scan: single-task by necessity
    // (one contiguous .dta per chunk) but bounded at a quarter of the
    // table, sorted independently, and overlapped via parActions (§2.6).
    val sortedKeys = src.select(col("o_orderkey").cast("long").as("k"))
      .orderBy("k").rdd.map(_.getLong(0))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // boundary ranks; a rank of 0 (n < 4) means "below every key"
      val targets = (1L to 3L).map(k => k * n / 4)
      val wanted = targets.filter(_ >= 1L).toSet
      val keyAtRank: Map[Long, Long] = sortedKeys.zipWithIndex()
        .filter { case (_, i) => wanted.contains(i + 1) }
        .map { case (key, i) => (i + 1, key) }
        .collect().toMap
      val b: IndexedSeq[Long] =
        targets.map(t => if (t < 1L) Long.MinValue else keyAtRank(t)).toIndexedSeq
      parActions((0 until 4).map { k => () =>
        val lo = if (k == 0) lit(true) else col("o_orderkey") > b(k - 1)
        val hi = if (k == 3) lit(true) else col("o_orderkey") <= b(k)
        src.filter(lo && hi)
          .coalesce(1).sortWithinPartitions("o_orderkey")
          .write.format("readstat").mode("overwrite")
          .save(s"$dir/part$k.dta")
      })
    } finally sortedKeys.unpersist(blocking = false)
  }

  def dirOffsetSlice(s: SparkSession, d: String): DataFrame = {
    val dir = scratch(d, "orders_off_dir")
    writeOrderQuartiles(s, d, dir)
    s.read.format("readstat").load(dir)
      .offset(5000).limit(7000)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(col("o_orderkey").cast("long")).as("sum_key"),
        round(sum("o_totalprice"), 2).as("total"))
      .orderBy("o_orderstatus")
  }

  val dirOffsetSliceSql: String =
    """SELECT o_orderstatus, count(*) AS n,
      |  CAST(sum(o_orderkey) AS BIGINT) AS sum_key,
      |  round(sum(o_totalprice), 2) AS total
      |FROM (SELECT * FROM orders ORDER BY o_orderkey LIMIT 7000 OFFSET 5000)
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** mode=dropmalformed over a directory with one header-smashed file
    * (r14): orders split into four contiguous .dta chunks, chunk 1's
    * header zeroed — at 100 TB one corrupt upload must not kill a
    * 1000-executor ingest, so the tolerant modes drop files whose
    * METADATA fails to parse (with a warning) instead of throwing; the
    * CSV/JSON source's `mode` surface re-expressed for binary stat
    * files. The oracle excludes exactly chunk 1's row quartile. */
  def dtaDropMalformedDir(s: SparkSession, d: String): DataFrame = {
    val dir = scratch(d, "orders_badhdr_dir")
    writeOrderQuartiles(s, d, dir)
    val raf = new java.io.RandomAccessFile(s"$dir/part1.dta", "rw")
    try { raf.seek(0); raf.write(new Array[Byte](64)) } finally raf.close()
    s.read.format("readstat").option("mode", "dropmalformed").load(dir)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(col("o_orderkey").cast("long")).as("sum_key"),
        round(sum("o_totalprice"), 2).as("total"))
      .orderBy("o_orderstatus")
  }

  val dtaDropMalformedDirSql: String =
    """SELECT o_orderstatus, count(*) AS n,
      |  CAST(sum(o_orderkey) AS BIGINT) AS sum_key,
      |  round(sum(o_totalprice), 2) AS total
      |FROM (SELECT *, row_number() OVER (ORDER BY o_orderkey) AS rn,
      |        count(*) OVER () AS cnt FROM orders)
      |WHERE NOT (rn > cnt // 4 AND rn <= (2 * cnt) // 4)
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** mode=permissive truncated-tail salvage (r14): a sorted single-file
    * .dta cut mid-row after 40% of its data region. The PLANNER clamps
    * its row-addressed partitions to the complete rows physically
    * present (StataModule.salvageableRowCount — pure arithmetic, no
    * decode), so the salvaged prefix is deterministic: exactly the
    * first 2n/5 rows, independent of reader chunk granularity. The
    * oracle takes the same prefix by row_number. */
  def dtaSalvageTruncated(s: SparkSession, d: String): DataFrame = {
    val path = scratch(d, "orders_trunc.dta")
    orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      .orderBy("o_orderkey")
      .coalesce(1)
      .write.format("readstat").mode("overwrite").save(path)
    // cut mid-row after the first 2n/5 data rows, using the file's own
    // geometry (same arithmetic the salvage clamp applies in reverse)
    val md = graft.spark.readstat.StataModule.metadata(path)
    val dataStart = md.dataOffset + (if (md.version >= 117) 6 else 0)
    val keep = md.nObs * 2 / 5
    val raf = new java.io.RandomAccessFile(path, "rw")
    try raf.setLength(dataStart + keep * md.rowLen + md.rowLen / 2)
    finally raf.close()
    s.read.format("readstat").option("mode", "permissive").load(path)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(col("o_orderkey").cast("long")).as("sum_key"),
        round(sum("o_totalprice"), 2).as("total"))
      .orderBy("o_orderstatus")
  }

  val dtaSalvageTruncatedSql: String =
    """SELECT o_orderstatus, count(*) AS n,
      |  CAST(sum(o_orderkey) AS BIGINT) AS sum_key,
      |  round(sum(o_totalprice), 2) AS total
      |FROM (SELECT *, row_number() OVER (ORDER BY o_orderkey) AS rn,
      |        count(*) OVER () AS cnt FROM orders)
      |WHERE rn <= (2 * cnt) // 5
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Value-label decode through the DICTIONARY-encoded columnar path
    * (r12): an int code column written with a label table, read back
    * with valueLabelsAsStrings (labeled scans now run columnar with
    * per-cell dictionary ids), grouped BY the decoded label — codes
    * beyond the table exercise the code-form fallback ids. The oracle
    * rebuilds the same decode as a CASE over the original parquet. */
  def dtaLabeledAgg(s: SparkSession, d: String): DataFrame = {
    val path = scratch(d, "orders_lab.dta")
    orders(s, d)
      .select(col("o_orderkey"),
        substring(col("o_orderpriority"), 1, 1).cast("int").as("prio_code"),
        col("o_totalprice"))
      .write.format("readstat").mode("overwrite")
      .option("valueLabels", "prio_code:1=Urgent,2=High,3=Medium")
      .save(path)
    s.read.format("readstat")
      .option("valueLabelsAsStrings", "true").load(path)
      .groupBy(col("prio_code").as("prio"))
      .agg(count(lit(1)).as("n"),
        round(sum("o_totalprice"), 2).as("total"))
      .orderBy("prio")
  }

  val dtaLabeledAggSql: String =
    """SELECT CASE CAST(substring(o_orderpriority, 1, 1) AS INT)
      |         WHEN 1 THEN 'Urgent' WHEN 2 THEN 'High' WHEN 3 THEN 'Medium'
      |         ELSE CAST(CAST(substring(o_orderpriority, 1, 1) AS INT) AS VARCHAR)
      |       END AS prio,
      |       count(*) AS n,
      |       round(sum(o_totalprice), 2) AS total
      |FROM orders GROUP BY prio ORDER BY prio""".stripMargin

  /** Text through strL: documents (long text → strL blobs) roundtrip. */
  def dtaStrlRoundtrip(s: SparkSession, d: String): DataFrame = {
    val path = scratch(d, "documents.dta")
    documents(s, d).select(col("doc_id"), col("text"), col("lang"))
      .write.format("readstat").mode("overwrite").save(path)
    s.read.format("readstat").load(path)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text"))).as("sum_chars"),
        min(md5(col("text"))).as("min_md5"))
      .orderBy("lang")
  }

  val dtaStrlRoundtripSql: String =
    """SELECT lang, count(*) AS n_docs,
      |  CAST(sum(length(text)) AS BIGINT) AS sum_chars,
      |  min(md5(text)) AS min_md5
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** customer → .sav → read → join-flavored aggregate. The sav writer's
    * uncompressed records keep the re-read row-range partitionable. */
  def savRoundtripAgg(s: SparkSession, d: String): DataFrame = {
    val path = scratch(d, "customer.sav")
    customer(s, d)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_mktsegment"))
      .write.format("readstat").mode("overwrite").save(path)
    s.read.format("readstat").load(path)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        round(sum("c_acctbal"), 2).as("sum_bal"),
        round(avg("c_acctbal"), 4).as("avg_bal"))
      .orderBy("c_mktsegment")
  }

  val savRoundtripAggSql: String =
    """SELECT c_mktsegment, count(*) AS n,
      |  round(sum(c_acctbal), 2) AS sum_bal,
      |  round(avg(c_acctbal), 4) AS avg_bal
      |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** documents (very-long strings → 255/256 sav segmentation) roundtrip. */
  def savLongStrings(s: SparkSession, d: String): DataFrame = {
    val path = scratch(d, "documents.sav")
    documents(s, d).select(col("doc_id"), col("text"), col("source"))
      .write.format("readstat").mode("overwrite").save(path)
    s.read.format("readstat").load(path)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text"))).as("sum_chars"),
        min(md5(col("text"))).as("min_md5"))
      .orderBy("source")
  }

  val savLongStringsSql: String =
    """SELECT source, count(*) AS n_docs,
      |  CAST(sum(length(text)) AS BIGINT) AS sum_chars,
      |  min(md5(text)) AS min_md5
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  /** Long-string VALUE LABELS end-to-end (subtype 21): 20-byte string
    * values (too wide for the 8-byte type-3 slot) get per-value labels
    * on write, and the labelled read switch must surface the labels —
    * the oracle rebuilds the same mapping in SQL over the original
    * parquet, so a hash match certifies the whole subtype-21 write →
    * parse → decode-switch chain cross-engine. */
  def savLongStrLabels(s: SparkSession, d: String): DataFrame = {
    val path = scratch(d, "cust_lsvl.sav")
    val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
      "MACHINERY")
    customer(s, d)
      .select(col("c_custkey").cast("double").as("c_custkey"),
        col("c_acctbal"), rpad(col("c_mktsegment"), 20, ".").as("seg20"))
      .write.format("readstat").mode("overwrite")
      .option("valueLabels", "seg20:" +
        segs.map(g => s"${g.padTo(20, '.')}=Segment $g").mkString(","))
      .save(path)
    s.read.format("readstat")
      .option("valueLabelsAsStrings", "true").load(path)
      .groupBy("seg20")
      .agg(count(lit(1)).as("n"),
        sum(col("c_custkey").cast("long")).as("sum_key"),
        round(sum("c_acctbal"), 2).as("sum_bal"))
      .orderBy("seg20")
  }

  val savLongStrLabelsSql: String =
    """SELECT 'Segment ' || c_mktsegment AS seg20, count(*) AS n,
      |  CAST(sum(c_custkey) AS BIGINT) AS sum_key,
      |  round(sum(c_acctbal), 2) AS sum_bal
      |FROM customer GROUP BY 1 ORDER BY seg20""".stripMargin

  /** POR value labels in BOTH directions — beyond the reference, whose
    * por.rs:441-446 parses and discards tag-'D' records and whose write_por
    * takes no value_labels parameter. Numeric labels (with an unlabeled
    * code exercising the formatNum fallback) and string labels roundtrip
    * through one .por; the decode is hash-compared with a DuckDB CASE map
    * over the original parquet. */
  def porValueLabels(s: SparkSession, d: String): DataFrame = {
    val path = scratch(d, "cust_vl.por")
    customer(s, d)
      .select((col("c_custkey") % 3).cast("double").as("tier"),
        col("c_acctbal").as("bal"), col("c_mktsegment").as("seg"))
      .write.format("readstat").mode("overwrite")
      .option("valueLabels",
        "tier:0=Bronze,1=Silver|seg:AUTOMOBILE=Cars,BUILDING=Construction")
      .save(path)
    s.read.format("readstat")
      .option("valueLabelsAsStrings", "true").load(path)
      .groupBy(col("TIER").as("tier"), col("SEG").as("seg"))
      .agg(count(lit(1)).as("n"), round(sum("BAL"), 2).as("sum_bal"))
      .orderBy("tier", "seg")
  }

  val porValueLabelsSql: String =
    """SELECT CASE CAST(c_custkey % 3 AS INT)
      |    WHEN 0 THEN 'Bronze' WHEN 1 THEN 'Silver' ELSE '2' END AS tier,
      |  CASE c_mktsegment WHEN 'AUTOMOBILE' THEN 'Cars'
      |    WHEN 'BUILDING' THEN 'Construction' ELSE c_mktsegment END AS seg,
      |  count(*) AS n, round(sum(c_acctbal), 2) AS sum_bal
      |FROM customer GROUP BY 1, 2 ORDER BY tier, seg""".stripMargin

  /** POR user-missing declarations + informative nulls — beyond the
    * reference, whose por.rs:388-415 reads and discards tags 8/9/A/B and
    * whose writer declares none. Discrete missings (one value-labeled)
    * roundtrip through one .por; the plain read nulls them and the
    * indicator column carries label-or-code with sav semantics. */
  def porMissingInformative(s: SparkSession, d: String): DataFrame = {
    val path = scratch(d, "cust_miss.por")
    customer(s, d)
      .select((col("c_custkey") % 5).cast("double").as("tier"),
        col("c_acctbal").as("bal"))
      .write.format("readstat").mode("overwrite")
      .option("missingValues", "tier:3,4")
      .option("valueLabels", "tier:4=Refused")
      .save(path)
    s.read.format("readstat")
      .option("informativeNulls", "true").load(path)
      .groupBy(coalesce(col("TIER_null"), lit("OK")).as("miss"))
      .agg(count(lit(1)).as("n"),
        count(col("TIER")).as("n_vals"),
        round(sum("BAL"), 2).as("sum_bal"))
      .orderBy("miss")
  }

  val porMissingInformativeSql: String =
    """SELECT CASE CAST(c_custkey % 5 AS INT)
      |    WHEN 3 THEN '3' WHEN 4 THEN 'Refused' ELSE 'OK' END AS miss,
      |  count(*) AS n,
      |  CAST(sum(CASE WHEN CAST(c_custkey % 5 AS INT) IN (3, 4)
      |    THEN 0 ELSE 1 END) AS BIGINT) AS n_vals,
      |  round(sum(c_acctbal), 2) AS sum_bal
      |FROM customer GROUP BY 1 ORDER BY miss""".stripMargin

  /** Binary .sas7bdat WRITE roundtrip — beyond the reference (its docs:
    * "SAS binary writing is not supported"). lineitem flows through our
    * sas7bdat writer and back through the reader (golden-tested against
    * pandas on the reference fixture matrix), then the aggregate is
    * hash-compared with DuckDB over the original parquet. Dates ride the
    * DATE format; strings exercise the text-blob layout. */
  def sasWriteRoundtrip(s: SparkSession, d: String): DataFrame = {
    val path = scratch(d, "lineitem.sas7bdat")
    lineitem(s, d)
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"),
        col("l_returnflag"), col("l_shipdate").cast("date").as("l_shipdate"))
      // r14 storageWidths (SAS LENGTH width compression): the chosen
      // widths hold these integer-valued columns EXACTLY at any SF
      // (w5 → ints to 2^29, w3 → 8192, w4 → 2^21 epoch-days), so the
      // DuckDB oracle is unchanged while the roundtrip now certifies
      // the truncated-numeric layout end to end
      .write.format("readstat").mode("overwrite")
      .option("storageWidths", "l_orderkey:5|l_quantity:3|l_shipdate:4")
      .save(path)
    s.read.format("readstat").load(path)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_orderkey").cast("long")).as("sum_key"),
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_price"),
        date_format(min("l_shipdate"), "yyyy-MM-dd").as("min_ship"),
        date_format(max("l_shipdate"), "yyyy-MM-dd").as("max_ship"))
      .orderBy("l_returnflag")
  }

  val sasWriteRoundtripSql: String =
    """SELECT l_returnflag, count(*) AS cnt,
      |  CAST(sum(l_orderkey) AS BIGINT) AS sum_key,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_price,
      |  strftime(CAST(min(l_shipdate) AS DATE), '%Y-%m-%d') AS min_ship,
      |  strftime(CAST(max(l_shipdate) AS DATE), '%Y-%m-%d') AS max_ship
      |FROM lineitem
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** SAS scan correctness: read a real ACS survey fixture (uncompressed,
    * 50 pages, page-range partitioned) and aggregate; the oracle reads the
    * committed pandas-exported golden parquet of the same file. */
  def sasScanAgg(s: SparkSession, d: String): DataFrame = {
    val fixture = "/root/repo/src/test/resources/fixtures/sas/owner.sas7bdat"
    s.read.format("readstat").load(fixture)
      .groupBy(coalesce(col("OWNHERE"), lit("<null>")).as("ownhere"))
      .agg(count(lit(1)).as("n"),
        min("CONTROL").as("min_control"),
        max("CONTROL").as("max_control"))
      .orderBy("ownhere")
  }

  val sasScanAggSql: String =
    """SELECT coalesce(OWNHERE, '<null>') AS ownhere, count(*) AS n,
      |       min(CONTROL) AS min_control, max(CONTROL) AS max_control
      |FROM read_parquet('/root/repo/src/test/resources/golden/sas/owner.parquet')
      |GROUP BY 1 ORDER BY ownhere""".stripMargin

  /** supplier → .xpt (IBM hex floats) roundtrip. */
  def xptRoundtrip(s: SparkSession, d: String): DataFrame = {
    val path = scratch(d, "supplier.xpt")
    supplier(s, d).select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
      .write.format("readstat").mode("overwrite").save(path)
    s.read.format("readstat").load(path)
      .agg(count(lit(1)).as("n"),
        round(sum("S_ACCTBA"), 2).as("sum_bal"),
        min("S_NAME").as("min_name"),
        round(sum("S_SUPPKE"), 2).as("sum_key"))
  }

  val xptRoundtripSql: String =
    """SELECT count(*) AS n, round(sum(s_acctbal), 2) AS sum_bal,
      |       min(s_name) AS min_name,
      |       round(sum(CAST(s_suppkey AS DOUBLE)), 2) AS sum_key
      |FROM supplier""".stripMargin

  /** nation ⋈ region → .por (base-30 ASCII) roundtrip. */
  def porRoundtrip(s: SparkSession, d: String): DataFrame = {
    val path = scratch(d, "nation.por")
    nation(s, d).select(col("n_nationkey").cast("double").as("nkey"),
        col("n_name"), col("n_regionkey").cast("double").as("rkey"))
      .write.format("readstat").mode("overwrite").save(path)
    s.read.format("readstat").load(path)
      .groupBy("RKEY")
      .agg(count(lit(1)).as("n"), min("N_NAME").as("min_nation"))
      .orderBy("RKEY")
  }

  val porRoundtripSql: String =
    """SELECT CAST(n_regionkey AS DOUBLE) AS RKEY, count(*) AS n,
      |       min(n_name) AS min_nation
      |FROM nation GROUP BY 1 ORDER BY RKEY""".stripMargin

  /** File-level metadata surface: write customer as .dta and .sav, read the
    * one-row-per-file header frame back, and check the row/var counts the
    * headers claim against the parquet truth. Certifies the metadata path
    * never touches data pages (header parse only). */
  def fileMetadata(s: SparkSession, d: String): DataFrame = {
    val dtaPath = scratch(d, "meta_customer.dta")
    val savPath = scratch(d, "meta_customer.sav")
    val src = customer(s, d)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_mktsegment"))
    parActions(Seq(
      () => src.write.format("readstat").mode("overwrite").save(dtaPath),
      () => src.write.format("readstat").mode("overwrite").save(savPath)))
    s.read.format("readstat-file-metadata").load(dtaPath, savPath)
      .select(col("format"), col("row_count"), col("var_count"))
      .orderBy("format")
  }

  val fileMetadataSql: String =
    """SELECT * FROM (
      |  SELECT 'dta' AS format, count(*) AS row_count, 4 AS var_count FROM customer
      |  UNION ALL
      |  SELECT 'sav' AS format, count(*) AS row_count, 4 AS var_count FROM customer
      |) ORDER BY format""".stripMargin

  /** Tolerant file-metadata audit (r14): a directory with one header-
    * smashed member, swept by `readstat-file-metadata` under
    * mode=dropmalformed — the corrupt file yields an ERROR ROW (null
    * row_count, failure message in details) instead of killing the
    * sweep, so one metadata query over a 100 TB drop directory lists
    * exactly which files a tolerant data scan would skip. */
  def fileMetadataMalformed(s: SparkSession, d: String): DataFrame = {
    val dir = scratch(d, "meta_badhdr_dir")
    val src = customer(s, d).select(col("c_custkey"), col("c_acctbal"))
    parActions(Seq(
      () => src.coalesce(1).write.format("readstat").mode("overwrite")
        .save(s"$dir/ok.dta"),
      () => src.coalesce(1).write.format("readstat").mode("overwrite")
        .save(s"$dir/bad.dta")))
    val raf = new java.io.RandomAccessFile(s"$dir/bad.dta", "rw")
    try { raf.seek(0); raf.write(new Array[Byte](64)) } finally raf.close()
    s.read.format("readstat-file-metadata")
      .option("mode", "dropmalformed").load(dir)
      .select(element_at(split(col("file"), "/"), -1).as("fname"),
        col("format"), col("row_count"),
        col("row_count").isNull.as("failed"))
      .orderBy("fname")
  }

  val fileMetadataMalformedSql: String =
    """SELECT * FROM (
      |  SELECT 'bad.dta' AS fname, 'dta' AS format,
      |    CAST(NULL AS BIGINT) AS row_count, true AS failed
      |  UNION ALL
      |  SELECT 'ok.dta', 'dta', count(*), false FROM customer
      |) ORDER BY fname""".stripMargin

  /** Cross-format join: lineitem through .dta, orders through .xpt (IBM
    * floats + 8-char name truncation), customer through .sav — three
    * binary formats meeting in one Catalyst plan. Certifies that types,
    * keys, and values survive each format's encoding well enough to JOIN
    * exactly, not just aggregate in isolation. */
  def crossFormatJoin(s: SparkSession, d: String): DataFrame = {
    val liPath = scratch(d, "xf_lineitem.dta")
    val ordPath = scratch(d, "xf_orders.xpt")
    val custPath = scratch(d, "xf_customer.sav")
    // three independent single-table writes — overlapped (guide §2.6)
    parActions(Seq(
      () => lineitem(s, d)
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        .write.format("readstat").mode("overwrite").save(liPath),
      () => orders(s, d).select(col("o_orderkey"), col("o_custkey"))
        .write.format("readstat").mode("overwrite").save(ordPath),
      () => customer(s, d).select(col("c_custkey"), col("c_mktsegment"))
        .write.format("readstat").mode("overwrite").save(custPath)))
    val li = s.read.format("readstat").load(liPath)
    val ord = s.read.format("readstat").load(ordPath) // XPT names: 8-char upper
    val cust = s.read.format("readstat").load(custPath)
    li.join(ord, li("l_orderkey") === ord("O_ORDERK"))
      .join(cust, ord("O_CUSTKE") === cust("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
      .orderBy("c_mktsegment")
  }

  val crossFormatJoinSql: String =
    """SELECT c_mktsegment, count(*) AS n_items,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** orders → .dta with WRITE-SIDE COMPRESS → read → aggregate, plus the
    * read-back storage types as literal columns so the oracle certifies
    * the narrowing actually happened on disk (o_orderkey long → int16 or
    * int32 depending on the SF's key range — the oracle derives the same
    * expectation from max(o_orderkey); the 0/1 flag → boolean → stata
    * byte). Values prove the compressed encoding decodes exactly. */
  def dtaCompressRoundtrip(s: SparkSession, d: String): DataFrame = {
    val path = scratch(d, "orders_compress.dta")
    orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        (col("o_orderkey") % 2 === 0).cast("double").as("even_flag"))
      .write.format("readstat").option("compress", "true")
      .mode("overwrite").save(path)
    val back = s.read.format("readstat").load(path)
    val types = back.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    back.groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(col("o_orderkey").cast("long")).as("sum_key"),
        round(sum("o_totalprice"), 2).as("sum_price"),
        sum(col("even_flag").cast("long")).as("n_even"))
      .withColumn("key_storage", lit(types("o_orderkey")))
      .withColumn("flag_storage", lit(types("even_flag")))
      .orderBy("o_orderstatus")
  }

  val dtaCompressRoundtripSql: String =
    """SELECT o_orderstatus, count(*) AS n,
      |  CAST(sum(o_orderkey) AS BIGINT) AS sum_key,
      |  round(sum(o_totalprice), 2) AS sum_price,
      |  CAST(sum(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_even,
      |  (SELECT CASE WHEN max(o_orderkey) <= 100 THEN 'tinyint'
      |               WHEN max(o_orderkey) <= 32740 THEN 'smallint'
      |               WHEN max(o_orderkey) <= 2147483620 THEN 'int'
      |               ELSE 'double' END FROM orders) AS key_storage,
      |  'tinyint' AS flag_storage
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** orders → .sav with write-side compress INCLUDING the string-parse
    * path (`compressCheckString`, reference compress.rs try_parse):
    * a numeric-string column must land on disk as a sav NUMERIC (read
    * back double — sav stores all numerics as f64, so 'double' is the
    * deterministic tag), a 0/1 double flag routes through boolean, and
    * an all-midnight timestamp narrows to DateType which survives as a
    * sav DATE format — the one narrowing that is type-visible after a
    * sav roundtrip. Values certify the parse didn't corrupt anything. */
  def savCompressRoundtrip(s: SparkSession, d: String): DataFrame = {
    val path = scratch(d, "orders_compress.sav")
    orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_custkey").cast("string").as("custkey_str"),
        (col("o_orderkey") % 2 === 0).cast("double").as("even_flag"),
        col("o_orderdate").cast("timestamp_ntz").as("od_ts"))
      .write.format("readstat")
      .option("compress", "true").option("compressCheckString", "true")
      .mode("overwrite").save(path)
    val back = s.read.format("readstat").load(path)
    val types = back.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    back.groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(col("custkey_str").cast("long")).as("sum_cust"),
        sum(col("even_flag").cast("long")).as("n_even"),
        date_format(min("od_ts"), "yyyy-MM-dd").as("min_od"),
        date_format(max("od_ts"), "yyyy-MM-dd").as("max_od"))
      .withColumn("cust_storage", lit(types("custkey_str")))
      .withColumn("date_storage", lit(types("od_ts")))
      .orderBy("o_orderstatus")
  }

  val savCompressRoundtripSql: String =
    """SELECT o_orderstatus, count(*) AS n,
      |  CAST(sum(o_custkey) AS BIGINT) AS sum_cust,
      |  CAST(sum(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_even,
      |  strftime(min(o_orderdate), '%Y-%m-%d') AS min_od,
      |  strftime(max(o_orderdate), '%Y-%m-%d') AS max_od,
      |  'double' AS cust_storage,
      |  'date' AS date_storage
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** End-to-end STREAMING path: orders lands in a stat-file landing zone,
    * a Structured Streaming query reads it with the readstat stream
    * source and appends into the SINGLE-FILE streaming .dta sink
    * (reference `sink_stata` analog — one valid file, epoch-committed),
    * then the batch reader aggregates the sunk file against the DuckDB
    * oracle on the original parquet. Certifies the whole streaming
    * write path (chunk encode, epoch splice, header/map rewrite,
    * declared widths) value-exactly cross-engine. */
  def dtaStreamSinkRoundtrip(s: SparkSession, d: String): DataFrame = {
    val landing = scratch(d, "stream_landing")
    val sink = scratch(d, "stream_single.dta")
    val ckpt = scratch(d, "stream_ckpt")
    // deterministic re-runs: clear sink, sidecar state, and checkpoint
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    Seq(sink, sink + ".stream_state", ckpt)
      .foreach(p => rm(new java.io.File(p)))
    orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"),
        col("o_orderdate"))
      .write.format("readstat").mode("overwrite").save(s"$landing/drop1.dta")
    val q = s.readStream.format("readstat")
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "o_orderkey DOUBLE, o_totalprice DOUBLE, " +
          "o_orderstatus STRING, o_orderdate TIMESTAMP_NTZ"))
      .load(landing)
      .writeStream.format("readstat")
      .option("checkpointLocation", ckpt)
      .option("strWidth.o_orderstatus", "8")
      .start(sink)
    try q.processAllAvailable() finally q.stop()
    s.read.format("readstat").load(sink)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(col("o_orderkey").cast("long")).as("sum_key"),
        round(sum("o_totalprice"), 2).as("sum_price"),
        date_format(min("o_orderdate"), "yyyy-MM-dd").as("min_od"),
        date_format(max("o_orderdate"), "yyyy-MM-dd").as("max_od"))
      .orderBy("o_orderstatus")
  }

  val dtaStreamSinkRoundtripSql: String =
    """SELECT o_orderstatus, count(*) AS n,
      |  CAST(sum(o_orderkey) AS BIGINT) AS sum_key,
      |  round(sum(o_totalprice), 2) AS sum_price,
      |  strftime(min(o_orderdate), '%Y-%m-%d') AS min_od,
      |  strftime(max(o_orderdate), '%Y-%m-%d') AS max_od
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Single-file streaming .sav sink, TWO-EPOCH append: the even-key half
    * of customer lands before the stream starts, the odd-key half lands
    * between two `processAllAvailable()` calls, so the second epoch
    * SPLICES onto an already-committed file (dictionary ncases rewrite +
    * record append). The final aggregate over the sunk .sav must match
    * the oracle over the WHOLE customer table — certifying the
    * beyond-reference sav epoch-append protocol value-exactly, not just
    * single-shot encode. */
  def savStreamSinkRoundtrip(s: SparkSession, d: String): DataFrame = {
    val landing = scratch(d, "sav_stream_landing")
    val sink = scratch(d, "sav_stream_single.sav")
    val ckpt = scratch(d, "sav_stream_ckpt")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    Seq(landing, sink, sink + ".stream_state", ckpt)
      .foreach(p => rm(new java.io.File(p)))
    val base = customer(s, d).select(
      col("c_custkey").cast("double").as("c_custkey"),
      col("c_acctbal"), col("c_mktsegment"))
    base.filter(col("c_custkey") % 2 === 0)
      .write.format("readstat").mode("overwrite").save(s"$landing/drop1.dta")
    val q = s.readStream.format("readstat")
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "c_custkey DOUBLE, c_acctbal DOUBLE, c_mktsegment STRING"))
      .load(landing)
      .writeStream.format("readstat")
      .option("checkpointLocation", ckpt)
      .option("strWidth.c_mktsegment", "10")
      .option("varFormats", "c_acctbal:F10.2")
      .start(sink)
    try {
      q.processAllAvailable()
      base.filter(col("c_custkey") % 2 === 1)
        .write.format("readstat").mode("overwrite").save(s"$landing/drop2.dta")
      q.processAllAvailable()
    } finally q.stop()
    s.read.format("readstat").load(sink)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        sum(col("c_custkey").cast("long")).as("sum_key"),
        round(sum("c_acctbal"), 2).as("sum_bal"))
      .orderBy("c_mktsegment")
  }

  val savStreamSinkRoundtripSql: String =
    """SELECT c_mktsegment, count(*) AS n,
      |  CAST(sum(c_custkey) AS BIGINT) AS sum_key,
      |  round(sum(c_acctbal), 2) AS sum_bal
      |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Single-file streaming .zsav sink, two-epoch append. Unlike the
    * fixed-width sinks the append unit is a DEFLATE BLOCK: epoch 2
    * splices its blocks over epoch 1's terminal block + ztrailer and
    * rewrites both, so this certifies the block-index commit protocol
    * (offsets rebuilt from the sidecar) end-to-end against the DuckDB
    * oracle, not just in ScalaTest. */
  def zsavStreamSinkRoundtrip(s: SparkSession, d: String): DataFrame = {
    val landing = scratch(d, "zsav_stream_landing")
    val sink = scratch(d, "zsav_stream_single.zsav")
    val ckpt = scratch(d, "zsav_stream_ckpt")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    Seq(landing, sink, sink + ".stream_state", ckpt)
      .foreach(p => rm(new java.io.File(p)))
    val base = customer(s, d).select(
      col("c_custkey").cast("double").as("c_custkey"),
      col("c_acctbal"), col("c_mktsegment"))
    base.filter(col("c_custkey") % 2 === 0)
      .write.format("readstat").mode("overwrite").save(s"$landing/drop1.dta")
    val q = s.readStream.format("readstat")
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "c_custkey DOUBLE, c_acctbal DOUBLE, c_mktsegment STRING"))
      .load(landing)
      .writeStream.format("readstat")
      .option("checkpointLocation", ckpt)
      .option("strWidth.c_mktsegment", "10")
      .start(sink)
    try {
      q.processAllAvailable()
      base.filter(col("c_custkey") % 2 === 1)
        .write.format("readstat").mode("overwrite").save(s"$landing/drop2.dta")
      q.processAllAvailable()
    } finally q.stop()
    s.read.format("readstat").load(sink)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        sum(col("c_custkey").cast("long")).as("sum_key"),
        round(sum("c_acctbal"), 2).as("sum_bal"))
      .orderBy("c_mktsegment")
  }

  val zsavStreamSinkRoundtripSql: String = savStreamSinkRoundtripSql

  /** Single-file streaming .xpt sink, two-epoch append (same drop
    * choreography as the sav one). XPT keeps NO row count in the file —
    * the count lives only in the sidecar — so this additionally
    * certifies that the commit re-pads the 80-byte tail correctly across
    * epochs: a stale pad byte would surface as a phantom row or a
    * truncated last record in the read-back aggregate. */
  def xptStreamSinkRoundtrip(s: SparkSession, d: String): DataFrame = {
    val landing = scratch(d, "xpt_stream_landing")
    val sink = scratch(d, "xpt_stream_single.xpt")
    val ckpt = scratch(d, "xpt_stream_ckpt")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    Seq(landing, sink, sink + ".stream_state", ckpt)
      .foreach(p => rm(new java.io.File(p)))
    val base = part(s, d).select(
      col("p_partkey").cast("double").as("p_partkey"),
      col("p_size").cast("double").as("p_size"),
      col("p_retailprice"), col("p_brand"))
    base.filter(col("p_partkey") % 2 === 0)
      .write.format("readstat").mode("overwrite").save(s"$landing/drop1.dta")
    val q = s.readStream.format("readstat")
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "p_partkey DOUBLE, p_size DOUBLE, p_retailprice DOUBLE, p_brand STRING"))
      .load(landing)
      .writeStream.format("readstat")
      .option("checkpointLocation", ckpt)
      .option("strWidth.p_brand", "10")
      .option("xptVersion", "8")
      .start(sink)
    try {
      q.processAllAvailable()
      base.filter(col("p_partkey") % 2 === 1)
        .write.format("readstat").mode("overwrite").save(s"$landing/drop2.dta")
      q.processAllAvailable()
    } finally q.stop()
    s.read.format("readstat").load(sink)
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"),
        sum(col("p_partkey").cast("long")).as("sum_key"),
        sum(col("p_size").cast("long")).as("sum_size"),
        round(sum("p_retailprice"), 2).as("sum_price"))
      .orderBy("p_brand")
  }

  val xptStreamSinkRoundtripSql: String =
    """SELECT p_brand, count(*) AS n,
      |  CAST(sum(p_partkey) AS BIGINT) AS sum_key,
      |  CAST(sum(p_size) AS BIGINT) AS sum_size,
      |  round(sum(p_retailprice), 2) AS sum_price
      |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** Single-file streaming .por sink, two-epoch append — BEYOND the
    * reference (streaming sink is Stata-only there) and the last format
    * to join the sink matrix. POR's variable-length base-30 cells make
    * this the one VARIABLE-WIDTH append: executors encode logical byte
    * chunks, the driver commit re-wraps the 80-column line transport
    * from the committed position recorded in the sidecar. */
  def porStreamSinkRoundtrip(s: SparkSession, d: String): DataFrame = {
    val landing = scratch(d, "por_stream_landing")
    val sink = scratch(d, "por_stream_single.por")
    val ckpt = scratch(d, "por_stream_ckpt")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    Seq(landing, sink, sink + ".stream_state", ckpt)
      .foreach(p => rm(new java.io.File(p)))
    val base = part(s, d).select(
      col("p_partkey").cast("double").as("key"),
      col("p_size").cast("double").as("size"),
      col("p_retailprice").as("price"), col("p_brand").as("brand"))
    base.filter(col("key") % 2 === 0)
      .write.format("readstat").mode("overwrite").save(s"$landing/drop1.dta")
    val q = s.readStream.format("readstat")
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "key DOUBLE, size DOUBLE, price DOUBLE, brand STRING"))
      .load(landing)
      .writeStream.format("readstat")
      .option("checkpointLocation", ckpt)
      .start(sink)
    try {
      q.processAllAvailable()
      base.filter(col("key") % 2 === 1)
        .write.format("readstat").mode("overwrite").save(s"$landing/drop2.dta")
      q.processAllAvailable()
    } finally q.stop()
    s.read.format("readstat").load(sink)
      .groupBy(col("BRAND").as("brand"))
      .agg(count(lit(1)).as("n"),
        sum(col("KEY").cast("long")).as("sum_key"),
        sum(col("SIZE").cast("long")).as("sum_size"),
        round(sum("PRICE"), 2).as("sum_price"))
      .orderBy("brand")
  }

  val porStreamSinkRoundtripSql: String =
    """SELECT p_brand AS brand, count(*) AS n,
      |  CAST(sum(p_partkey) AS BIGINT) AS sum_key,
      |  CAST(sum(p_size) AS BIGINT) AS sum_size,
      |  round(sum(p_retailprice), 2) AS sum_price
      |FROM part GROUP BY 1 ORDER BY brand""".stripMargin

  /** Single-file streaming .sas7bdat sink, two-epoch append (same drop
    * choreography as the sav/xpt ones). sas7bdat is PAGE-structured, so
    * this additionally certifies the page-aware splice: the second
    * epoch must continue the committed partial DATA page in place and
    * re-patch its block count — an off-by-one there surfaces as
    * missing/phantom rows in the read-back aggregate. */
  def sasStreamSinkRoundtrip(s: SparkSession, d: String): DataFrame =
    sasStreamSink(s, d, rle = false)

  /** rle variant: the append unit is a WHOLE SASYZCRL page spliced at
    * the sidecar-carried page boundary — the second epoch certifies
    * that committed compressed pages are left untouched and the header
    * page count re-patches correctly, cross-engine via the oracle. */
  def sasRleStreamSinkRoundtrip(s: SparkSession, d: String): DataFrame =
    sasStreamSink(s, d, rle = true)

  private def sasStreamSink(s: SparkSession, d: String,
      rle: Boolean): DataFrame = {
    val tag = if (rle) "sas_rle_stream" else "sas_stream"
    val landing = scratch(d, s"${tag}_landing")
    val sink = scratch(d, s"${tag}_single.sas7bdat")
    val ckpt = scratch(d, s"${tag}_ckpt")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    Seq(landing, sink, sink + ".stream_state", ckpt)
      .foreach(p => rm(new java.io.File(p)))
    val base = supplier(s, d).select(
      col("s_suppkey").cast("double").as("s_suppkey"),
      col("s_acctbal"), col("s_nationkey").cast("double").as("s_nationkey"))
    base.filter(col("s_suppkey") % 2 === 0)
      .write.format("readstat").mode("overwrite").save(s"$landing/drop1.dta")
    val q0 = s.readStream.format("readstat")
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "s_suppkey DOUBLE, s_acctbal DOUBLE, s_nationkey DOUBLE"))
      .load(landing)
      .writeStream.format("readstat")
      .option("checkpointLocation", ckpt)
    val q = (if (rle) q0.option("compression", "rle") else q0).start(sink)
    try {
      q.processAllAvailable()
      base.filter(col("s_suppkey") % 2 === 1)
        .write.format("readstat").mode("overwrite").save(s"$landing/drop2.dta")
      q.processAllAvailable()
    } finally q.stop()
    s.read.format("readstat").load(sink)
      .groupBy(col("s_nationkey").cast("long").as("nation"))
      .agg(count(lit(1)).as("n"),
        sum(col("s_suppkey").cast("long")).as("sum_key"),
        round(sum("s_acctbal"), 2).as("sum_bal"))
      .orderBy("nation")
  }

  val sasStreamSinkRoundtripSql: String =
    """SELECT CAST(s_nationkey AS BIGINT) AS nation, count(*) AS n,
      |  CAST(sum(s_suppkey) AS BIGINT) AS sum_key,
      |  round(sum(s_acctbal), 2) AS sum_bal
      |FROM supplier GROUP BY 1 ORDER BY nation""".stripMargin

  /** Heterogeneous DIRECTORY read: customer split into a .dta half (even
    * keys, 3 columns) and a .sav half (odd keys, + c_nationkey), loaded
    * back as ONE directory with mergeSchema — union-by-name, null-fill
    * for the dta half's missing column, int/double widening across
    * formats. The aggregate's n_sav/sum_nation only see the .sav rows,
    * so the oracle check certifies per-file column routing, not just the
    * union row count. */
  def mixedDirMerge(s: SparkSession, d: String): DataFrame = {
    val dir = scratch(d, "mixed_dir")
    val base = customer(s, d).select(col("c_custkey"), col("c_acctbal"),
      col("c_mktsegment"), col("c_nationkey"))
    parActions(Seq(
      () => base.filter(col("c_custkey") % 2 === 0)
        .select("c_custkey", "c_acctbal", "c_mktsegment")
        .write.format("readstat").mode("overwrite").save(s"$dir/even.dta"),
      () => base.filter(col("c_custkey") % 2 === 1)
        .write.format("readstat").mode("overwrite").save(s"$dir/odd.sav")))
    s.read.format("readstat").option("mergeSchema", "true").load(dir)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        round(sum("c_acctbal"), 2).as("sum_bal"),
        count(col("c_nationkey")).as("n_sav"),
        round(sum(coalesce(col("c_nationkey"), lit(0.0))), 2).as("sum_nation"))
      .orderBy("c_mktsegment")
  }

  val mixedDirMergeSql: String =
    """SELECT c_mktsegment, count(*) AS n,
      |  round(sum(c_acctbal), 2) AS sum_bal,
      |  CAST(count(CASE WHEN c_custkey % 2 = 1 THEN 1 END) AS BIGINT) AS n_sav,
      |  round(sum(CASE WHEN c_custkey % 2 = 1
      |            THEN CAST(c_nationkey AS DOUBLE) ELSE 0.0 END), 2)
      |    AS sum_nation
      |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** orders → seconds-of-day → .dta (%tc time format) → read back as
    * Spark 4.1 TIME(6) via timeAsTimeType → per-hour aggregate on the
    * rendered time strings; DuckDB reproduces them through its own TIME
    * type (make_time → VARCHAR). Certifies cross-engine TIME semantics
    * end-to-end — before this only the nanos-of-day LongType form was
    * oracle-gated. */
  def timeTypeAgg(s: SparkSession, d: String): DataFrame = {
    val path = scratch(d, "ordertimes.dta")
    orders(s, d)
      .select(col("o_orderkey"),
        // ×977 spreads the keys over the whole day at every SF
        (((col("o_orderkey") * 977) % 86400).cast("double") * 1000.0).as("t_ms"))
      .write.format("readstat").mode("overwrite")
      .option("varFormats", "t_ms:%tcHH:MM:SS").save(path)
    val back = s.read.format("readstat")
      .option("timeAsTimeType", "true").load(path)
    back.select(col("t_ms").cast("string").as("ts"))
      .withColumn("hr", substring(col("ts"), 1, 2))
      .groupBy("hr")
      .agg(count(lit(1)).as("cnt"), min("ts").as("t_min"), max("ts").as("t_max"))
      .orderBy("hr")
  }

  val timeTypeAggSql: String =
    """SELECT substr(ts, 1, 2) AS hr, count(*) AS cnt,
      |  min(ts) AS t_min, max(ts) AS t_max
      |FROM (
      |  SELECT CAST(make_time(
      |    CAST(((o_orderkey * 977) % 86400) // 3600 AS BIGINT),
      |    CAST((((o_orderkey * 977) % 86400) % 3600) // 60 AS BIGINT),
      |    CAST(((o_orderkey * 977) % 86400) % 60 AS DOUBLE)) AS VARCHAR) AS ts
      |  FROM orders)
      |GROUP BY hr ORDER BY hr""".stripMargin

  val all: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "time_type_agg" -> (timeTypeAgg _, timeTypeAggSql),
    "stata_compress_roundtrip" -> (dtaCompressRoundtrip _, dtaCompressRoundtripSql),
    "spss_compress_roundtrip" -> (savCompressRoundtrip _, savCompressRoundtripSql),
    "stata_stream_sink" -> (dtaStreamSinkRoundtrip _, dtaStreamSinkRoundtripSql),
    "spss_stream_sink" -> (savStreamSinkRoundtrip _, savStreamSinkRoundtripSql),
    "zsav_stream_sink" -> (zsavStreamSinkRoundtrip _, zsavStreamSinkRoundtripSql),
    "xpt_stream_sink" -> (xptStreamSinkRoundtrip _, xptStreamSinkRoundtripSql),
    "sas_stream_sink" -> (sasStreamSinkRoundtrip _, sasStreamSinkRoundtripSql),
    "sas_rle_stream_sink" -> (sasRleStreamSinkRoundtrip _, sasStreamSinkRoundtripSql),
    "por_stream_sink" -> (porStreamSinkRoundtrip _, porStreamSinkRoundtripSql),
    "mixed_dir_mergeschema" -> (mixedDirMerge _, mixedDirMergeSql),
    "cross_format_join" -> (crossFormatJoin _, crossFormatJoinSql),
    "file_metadata" -> (fileMetadata _, fileMetadataSql),
    "file_metadata_malformed" -> (fileMetadataMalformed _, fileMetadataMalformedSql),
    "sas_scan_agg" -> (sasScanAgg _, sasScanAggSql),
    "sas_write_roundtrip" -> (sasWriteRoundtrip _, sasWriteRoundtripSql),
    "xpt_roundtrip_agg" -> (xptRoundtrip _, xptRoundtripSql),
    "por_roundtrip_agg" -> (porRoundtrip _, porRoundtripSql),
    "por_value_labels" -> (porValueLabels _, porValueLabelsSql),
    "por_missing_informative" -> (porMissingInformative _, porMissingInformativeSql),
    "stata_roundtrip_agg" -> (dtaRoundtripAgg _, dtaRoundtripAggSql),
    "stata_scan_pushdown" -> (dtaPushdown _, dtaPushdownSql),
    "stata_filter_pushdown" -> (dtaFilterPushdown _, dtaFilterPushdownSql),
    "stata_temporal_filter_pushdown" ->
      (dtaTemporalFilterPushdown _, dtaTemporalFilterPushdownSql),
    "spss_string_filter_pushdown" ->
      (savStringFilterPushdown _, savStringFilterPushdownSql),
    "stata_runtime_prune_join" ->
      (dtaRuntimePruneJoin _, dtaRuntimePruneJoinSql),
    "stata_offset_slice" -> (dtaOffsetSlice _, dtaOffsetSliceSql),
    "sas_offset_slice" -> (sasOffsetSlice _, sasOffsetSliceSql),
    "zsav_offset_slice" -> (zsavOffsetSlice _, zsavOffsetSliceSql),
    "por_offset_slice" -> (porOffsetSlice _, porOffsetSliceSql),
    "dir_offset_slice" -> (dirOffsetSlice _, dirOffsetSliceSql),
    "stata_dropmalformed_dir" -> (dtaDropMalformedDir _, dtaDropMalformedDirSql),
    "stata_salvage_truncated" -> (dtaSalvageTruncated _, dtaSalvageTruncatedSql),
    "stata_labeled_agg" -> (dtaLabeledAgg _, dtaLabeledAggSql),
    "stata_strl_roundtrip" -> (dtaStrlRoundtrip _, dtaStrlRoundtripSql),
    "spss_roundtrip_agg" -> (savRoundtripAgg _, savRoundtripAggSql),
    "spss_longstr_roundtrip" -> (savLongStrings _, savLongStringsSql),
    "spss_longstr_labels" -> (savLongStrLabels _, savLongStrLabelsSql),
  )
}
