package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Tables._

/** Round-8 analytics layer: retrieval ranking (BM25), bounded-memory
  * frequency sketching (Space-Saving heavy hitters), CDC changelog
  * application (latest-state and SCD-2 validity intervals), and per-key
  * time-series gap-filling. Every query has a DuckDB oracle in
  * [[graft.SparkEntry.oracleSql]]; column names and row order match.
  *
  * Scale notes are per query; the common theme is ONE pass over the fact
  * table and scalar/broadcast-sized side state — none of these collect
  * anything corpus-sized to the driver or shuffle more than group keys.
  */
object Analytics {

  // ---------------------------------------------------------------- BM25

  /** Okapi BM25 top-20 retrieval for a fixed 3-term query over the
    * documents table (k1 = 1.2, b = 0.75, idf = ln(1 + (N−df+0.5)/(df+0.5))).
    *
    * Scale shape: because the query-term set is small and known, per-doc
    * term frequencies and document length come from ONE projection over
    * the scan — the token array is bound to a column once (the
    * `text_ngram_topk` lesson: never re-evaluate the split inside a
    * lambda) and each tf is a linear `size(filter(...))` over it. No
    * explode, no shuffle for tf/dl. Corpus stats (N, avgdl, per-term df)
    * reduce to ONE scalar row that broadcasts back via crossJoin, scoring
    * is a pure projection, and the top-k is TakeOrderedAndProject. For
    * arbitrary (non-literal) query sets the same pipeline becomes
    * explode → semi-join against a broadcast term list → groupBy — still
    * one shuffle of query-term postings only.
    */
  def bm25Topk(s: SparkSession, d: String): DataFrame = {
    val terms = Seq("query", "join", "vector")
    val k1 = 1.2
    val b = 0.75
    val toks = documents(s, d).select(col("doc_id"),
      split(lower(trim(col("text"))), graft.queries.Tables.Ws).as("a"))
    val per = toks.select(
      col("doc_id") +: size(col("a")).as("dl") +:
        terms.map(t => size(filter(col("a"), x => x === t)).as(s"tf_$t")): _*)
    val statCols = count(lit(1)).as("n") +: avg("dl").as("avgdl") +:
      terms.map(t =>
        sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"df_$t"))
    val stats = per.agg(statCols.head, statCols.tail: _*)
    val scored = per.crossJoin(broadcast(stats))
    def contrib(t: String): Column = {
      val tf = col(s"tf_$t").cast("double")
      val idf = log(lit(1.0) +
        (col("n") - col(s"df_$t") + lit(0.5)) / (col(s"df_$t") + lit(0.5)))
      when(col(s"tf_$t") > 0,
        idf * tf * lit(k1 + 1.0) /
          (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
        .otherwise(lit(0.0))
    }
    val matched = terms.map(t => when(col(s"tf_$t") > 0, 1).otherwise(0))
      .reduce(_ + _)
    scored
      .withColumn("bm25", round(terms.map(contrib).reduce(_ + _), 4))
      .withColumn("matched", matched)
      .where(col("bm25") > 0)
      .select("doc_id", "bm25", "matched")
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(20)
  }

  val bm25TopkSql: String =
    """WITH per AS (
      |  SELECT doc_id, len(a) AS dl,
      |         len(list_filter(a, x -> x = 'query'))  AS tf_query,
      |         len(list_filter(a, x -> x = 'join'))   AS tf_join,
      |         len(list_filter(a, x -> x = 'vector')) AS tf_vector
      |  FROM (SELECT doc_id,
      |          regexp_split_to_array(lower(trim(text)), '\s+') AS a
      |        FROM documents)),
      |st AS (
      |  SELECT count(*) AS n, avg(dl) AS avgdl,
      |         sum(CASE WHEN tf_query  > 0 THEN 1 ELSE 0 END) AS df_query,
      |         sum(CASE WHEN tf_join   > 0 THEN 1 ELSE 0 END) AS df_join,
      |         sum(CASE WHEN tf_vector > 0 THEN 1 ELSE 0 END) AS df_vector
      |  FROM per),
      |sc AS (
      |  SELECT doc_id,
      |    round(
      |      (CASE WHEN tf_query > 0 THEN
      |        ln(1.0 + (n - df_query + 0.5) / (df_query + 0.5))
      |          * tf_query * 2.2
      |          / (tf_query + 1.2 * (0.25 + 0.75 * dl / avgdl))
      |       ELSE 0.0 END) +
      |      (CASE WHEN tf_join > 0 THEN
      |        ln(1.0 + (n - df_join + 0.5) / (df_join + 0.5))
      |          * tf_join * 2.2
      |          / (tf_join + 1.2 * (0.25 + 0.75 * dl / avgdl))
      |       ELSE 0.0 END) +
      |      (CASE WHEN tf_vector > 0 THEN
      |        ln(1.0 + (n - df_vector + 0.5) / (df_vector + 0.5))
      |          * tf_vector * 2.2
      |          / (tf_vector + 1.2 * (0.25 + 0.75 * dl / avgdl))
      |       ELSE 0.0 END), 4) AS bm25,
      |    (CASE WHEN tf_query  > 0 THEN 1 ELSE 0 END +
      |     CASE WHEN tf_join   > 0 THEN 1 ELSE 0 END +
      |     CASE WHEN tf_vector > 0 THEN 1 ELSE 0 END) AS matched
      |  FROM per CROSS JOIN st)
      |SELECT doc_id, bm25, matched FROM sc
      |WHERE bm25 > 0
      |ORDER BY bm25 DESC, doc_id
      |LIMIT 20""".stripMargin

  // ------------------------------------------------- heavy hitters sketch

  /** Top-20 most frequent part keys via the Space-Saving sketch
    * ([[graft.operators.SpaceSavingTopK]], capacity 65,536).
    *
    * At the oracle scale factors the key space (2k–20k distinct) is far
    * below capacity, so no eviction fires and the sketch IS the exact
    * group-by — which is what the oracle checks (err = 0 everywhere).
    * The point at 100 TB is the memory contract the exact group-by can't
    * make: each task condenses its partition to ≤ capacity triples
    * map-side, only sketches cross the shuffle (partial → final merge of
    * a TypedImperativeAggregate), and the answer is bounded-memory with
    * error ≤ N/capacity however many distinct keys the corpus has.
    * The approximate regime's bounds are pinned by `SpaceSavingSpec`.
    */
  def heavyHitters(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .select(col("l_partkey").cast("string").as("k"))
      .agg(graft.operators.SpaceSavingTopK(col("k"), 65536).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.key").as("key"), col("e.count").as("cnt"),
        col("e.err").as("err"))
      .orderBy(col("cnt").desc, col("key"))
      .limit(20)

  val heavyHittersSql: String =
    """SELECT CAST(l_partkey AS VARCHAR) AS key, count(*) AS cnt,
      |       CAST(0 AS BIGINT) AS err
      |FROM lineitem
      |GROUP BY 1
      |ORDER BY cnt DESC, key
      |LIMIT 20""".stripMargin

  // ------------------------------------------------------ CDC / lakehouse

  /** Apply the events stream as a CDC changelog and emit latest state per
    * key — the lakehouse MERGE INTO / compaction kernel. Semantics:
    * events are upserts keyed by user_id ordered by (ts, event_id);
    * `signup` is an insert, `error` a delete, everything else an update.
    * A user whose LAST op is a delete has no current state.
    *
    * Scale shape: one shuffle on the merge key; the window row_number and
    * the filter share that single partitioning (no second exchange), and
    * at 100 TB this is exactly how periodic changelog compaction runs —
    * partition by key, keep max-(seq) per key, drop tombstones. */
  def cdcLatestState(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    events(s, d)
      .withColumn("op",
        when(col("event_type") === "signup", "I")
          .when(col("event_type") === "error", "D")
          .otherwise("U"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1 && col("op") =!= "D")
      .select(col("user_id"), col("event_id").as("last_event_id"), col("op"),
        round(col("value"), 2).as("value"),
        unix_micros(col("ts")).as("updated_us"))
      .orderBy("user_id")
  }

  val cdcLatestStateSql: String =
    """WITH log AS (
      |  SELECT user_id, event_id, ts, value,
      |    CASE event_type WHEN 'signup' THEN 'I'
      |                    WHEN 'error' THEN 'D' ELSE 'U' END AS op,
      |    row_number() OVER (PARTITION BY user_id
      |                       ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events)
      |SELECT user_id, event_id AS last_event_id, op,
      |       round(value, 2) AS value, epoch_us(ts) AS updated_us
      |FROM log
      |WHERE rn = 1 AND op <> 'D'
      |ORDER BY user_id""".stripMargin

  /** SCD Type-2 history build from the same changelog: every event opens
    * a version valid from its timestamp until the key's next event
    * (half-open interval); the newest version per key is current.
    *
    * Scale shape: a single shuffle on user_id; lead() runs inside that
    * partitioning. This is the standard dimension-history materialization
    * — the output is append-only and partition-prunable on valid_from. */
  def cdcScd2Intervals(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("valid_from_us"), col("event_id"))
    events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        round(col("value"), 2).as("value"),
        unix_micros(col("ts")).as("valid_from_us"))
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(w))
      .withColumn("is_current",
        when(col("valid_to_us").isNull, 1).otherwise(0))
      .orderBy("user_id", "valid_from_us", "event_id")
  }

  val cdcScd2IntervalsSql: String =
    """SELECT user_id, event_id, event_type, round(value, 2) AS value,
      |  epoch_us(ts) AS valid_from_us,
      |  lead(epoch_us(ts)) OVER (PARTITION BY user_id
      |                           ORDER BY epoch_us(ts), event_id) AS valid_to_us,
      |  CASE WHEN lead(epoch_us(ts)) OVER (PARTITION BY user_id
      |         ORDER BY epoch_us(ts), event_id) IS NULL
      |       THEN 1 ELSE 0 END AS is_current
      |FROM events
      |ORDER BY user_id, valid_from_us, event_id""".stripMargin

  // ------------------------------------------------------------ gap-fill

  /** Per-user daily activity series with gaps densified: zero-fill event
    * counts for missing days inside each user's [first, last] day span,
    * and forward-fill the last seen daily value across the gaps.
    *
    * Scale shape: the daily rollup is a map-side-combinable groupBy; the
    * day spine is `sequence(min_day, max_day)` exploded PER KEY — the
    * spine generation is distributed with the keys, never a driver loop
    * or a global calendar cross join. Spine and rollup then equi-join on
    * (user_id, day) — both sides derive from the same partitioning — and
    * the forward-fill window reuses it. Span per key is bounded by the
    * data's own date range, so spine size is |keys| × span, linear in
    * the rollup output, not in raw events. */
  def eventsGapfill(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("day_value"))
    val spine = daily.groupBy("user_id")
      .agg(min("day").as("d0"), max("day").as("d1"))
      .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
    val w = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("user_id", "day"), "left")
      .withColumn("ffill_value", last(col("day_value"), ignoreNulls = true).over(w))
      .select(col("user_id"), date_format(col("day"), "yyyy-MM-dd").as("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        round(coalesce(col("day_value"), lit(0.0)), 2).as("day_value"),
        col("ffill_value"))
      .orderBy("user_id", "day")
  }

  val eventsGapfillSql: String =
    """WITH daily AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n_events,
      |         round(sum(value), 2) AS day_value
      |  FROM events GROUP BY 1, 2),
      |span AS (
      |  SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1),
      |spine AS (
      |  SELECT user_id,
      |         CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
      |                                     CAST(d1 AS TIMESTAMP),
      |                                     INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM span)
      |SELECT s.user_id, strftime(s.day, '%Y-%m-%d') AS day,
      |  coalesce(a.n_events, 0) AS n_events,
      |  round(coalesce(a.day_value, 0.0), 2) AS day_value,
      |  last_value(a.day_value IGNORE NULLS) OVER (
      |    PARTITION BY s.user_id ORDER BY s.day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill_value
      |FROM spine s LEFT JOIN daily a
      |  ON a.user_id = s.user_id AND a.day = s.day
      |ORDER BY s.user_id, s.day""".stripMargin

  // ------------------------------------------------- KMV distinct sketch

  /** Distinct users per event type via the KMV sketch
    * ([[graft.operators.KmvDistinct]], k = 65,536).
    *
    * At the oracle scale factors the per-group user space (150–1,500) is
    * far below k, so the sketch holds every distinct hash and the
    * estimate IS the exact COUNT(DISTINCT) — what the oracle checks.
    * The point at 100 TB is the memory/shuffle contract exact distinct
    * cannot make: COUNT(DISTINCT user_id) shuffles every distinct key to
    * the aggregator, while the sketch condenses each task to ≤ k longs
    * map-side and only sketches cross the shuffle — and unlike HLL the
    * same sketch column is exact below capacity and storable/unionable
    * across partitions or days. The approximate regime's ~1/√k error is
    * pinned by `KmvSpec`. */
  def distinctKmv(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy("event_type")
      .agg(graft.operators.KmvDistinct(col("user_id"), 65536).as("s"))
      .select(col("event_type"), col("s.estimate").as("n_users"),
        col("s.is_exact").cast("int").as("is_exact"))
      .orderBy("event_type")

  val distinctKmvSql: String =
    """SELECT event_type, count(DISTINCT user_id) AS n_users,
      |       CAST(1 AS INT) AS is_exact
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** Sketch-COLUMN workflow: materialize one KMV sketch per event type
    * (`KmvSketchAgg`, an array<long> column you could store per
    * partition or day), then union the five sketches with `KmvMerge`
    * and estimate distinct users overall. Below capacity the union
    * estimate IS the exact global COUNT(DISTINCT) — the oracle pins
    * that the two-level sketch algebra loses nothing vs a single pass,
    * which is the property that makes incremental distinct maintenance
    * (daily sketches → monthly rollup, no raw-key reprocessing) sound
    * at 100 TB. */
  def distinctKmvUnion(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy("event_type")
      .agg(graft.operators.KmvSketchAgg(col("user_id"), 65536).as("sk"))
      .agg(graft.operators.KmvMerge(col("sk"), 65536).as("s"))
      .select(col("s.estimate").as("n_users"),
        col("s.is_exact").cast("int").as("is_exact"))

  val distinctKmvUnionSql: String =
    """SELECT count(DISTINCT user_id) AS n_users, CAST(1 AS INT) AS is_exact
      |FROM events""".stripMargin

  // ------------------------------------------------- rolling anomaly scan

  /** Rolling z-score anomaly detection: flag events whose value is ≥ 2.2
    * sample standard deviations from the mean of that user's previous 20
    * events (at least 10 priors required).
    *
    * Determinism across engines is the subtle part: windowed SUMs of
    * doubles are order-of-summation dependent (Spark's sliding
    * aggregation vs DuckDB's segment trees), so the moments are
    * accumulated in DECIMAL(18,6) — exact, order-independent (the DSIR
    * lesson) — and converted to double only for the final pointwise
    * arithmetic, which is IEEE-identical everywhere. Variance is the
    * exact-moment form ((E[x²] − μ²)·n/(n−1)) on those exact sums.
    *
    * Scale shape: ONE shuffle on user_id; both window frames and the
    * filters run inside that partitioning, state per row is the 21-row
    * frame. This is the streaming-friendly formulation (same moments
    * maintain incrementally in `mapGroupsWithState`). */
  def eventsAnomaly(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(-20, -1)
    events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("value").cast("decimal(18,6)").as("v"))
      .withColumn("s1", sum(col("v")).over(w))
      .withColumn("s2", sum(col("v") * col("v")).over(w))
      .withColumn("nprev", count(col("v")).over(w))
      .where(col("nprev") >= 10)
      .withColumn("mu", col("s1").cast("double") / col("nprev"))
      .withColumn("ex2", col("s2").cast("double") / col("nprev"))
      .withColumn("vr",
        (col("ex2") - col("mu") * col("mu")) * col("nprev") / (col("nprev") - 1))
      .where(col("vr") > 1e-9)
      .withColumn("z", (col("v").cast("double") - col("mu")) / sqrt(col("vr")))
      .where(abs(col("z")) >= 2.2)
      // display columns truncate via floor, not round: both engines hold
      // bit-identical doubles here, and floor of an identical double is
      // identical, while round() implementations legitimately disagree
      // when mu (a 2-decimal sum over n) lands exactly on a .00005
      // boundary — Spark rounds the double's exact binary expansion,
      // DuckDB the scaled value (observed: 1e-4 mu diffs at sf0.01)
      .select(col("user_id"), col("event_id"),
        round(col("v").cast("double"), 2).as("value"),
        (floor(col("mu") * 1e4) / 1e4).as("mu"),
        (floor(col("z") * 1e3) / 1e3).as("z"))
      .orderBy("user_id", "event_id")
  }

  val eventsAnomalySql: String =
    """WITH st AS (
      |  SELECT user_id, event_id,
      |    CAST(value AS DECIMAL(18,6)) AS v,
      |    sum(CAST(value AS DECIMAL(18,6))) OVER w AS s1,
      |    sum(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)))
      |      OVER w AS s2,
      |    count(value) OVER w AS nprev
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |               ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
      |m AS (
      |  SELECT user_id, event_id, v, nprev,
      |    CAST(s1 AS DOUBLE) / nprev AS mu,
      |    CAST(s2 AS DOUBLE) / nprev AS ex2
      |  FROM st WHERE nprev >= 10),
      |sc AS (
      |  SELECT user_id, event_id, v, mu,
      |    ((ex2 - mu * mu) * nprev) / (nprev - 1) AS vr
      |  FROM m)
      |SELECT user_id, event_id,
      |  round(CAST(v AS DOUBLE), 2) AS value,
      |  floor(mu * 1e4) / 1e4 AS mu,
      |  floor(((CAST(v AS DOUBLE) - mu) / sqrt(vr)) * 1e3) / 1e3 AS z
      |FROM sc
      |WHERE vr > 1e-9
      |  AND abs((CAST(v AS DOUBLE) - mu) / sqrt(vr)) >= 2.2
      |ORDER BY user_id, event_id""".stripMargin

  // --------------------------------------------- histogram quantile sketch

  /** Per-event-type p50/p90/p99 via a 1,000-bin equi-width histogram —
    * the scale path for quantiles. Exact percentiles (`q14_percentiles`)
    * need a global per-group sort; the histogram needs two
    * map-side-combinable aggregates (min/max, then bin counts) and a
    * window over at most 1,000 bins per group, so nothing corpus-sized
    * ever sorts or shuffles. The estimate is deterministic (lower edge of
    * the first bin whose cumulative count reaches ⌈q·n⌉), error bounded
    * by one bin width — and the ORACLE REPLAYS THE SAME HISTOGRAM, so
    * the check is an exact hash match on the deterministic estimator,
    * not a tolerance comparison. All bin math is pointwise IEEE double
    * arithmetic on exact inputs — identical in both engines. */
  def histQuantiles(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(col("event_type"), col("value"))
    val mm = ev.groupBy("event_type").agg(
      min("value").as("mn"), max("value").as("mx"), count(lit(1)).as("n"))
    // mx == mn (a constant-valued group) would make the bin ratio 0/0 —
    // a DIVIDE_BY_ZERO throw under Spark 4's default ANSI mode; pin the
    // degenerate group to bin 0, whose lower edge is mn = mx (exact)
    val binned = ev.join(broadcast(mm), "event_type")
      .withColumn("bin",
        when(col("mx") === col("mn"), lit(0L))
          .otherwise(least(
            floor((col("value") - col("mn")) / (col("mx") - col("mn")) * 1000),
            lit(999L))))
    val hist = binned.groupBy("event_type", "bin").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("event_type").orderBy("bin")
    val cum = hist.withColumn("cum", sum("c").over(w))
      .join(broadcast(mm), "event_type")
    def pick(p: Double): Column =
      min(when(col("cum") >= col("n") * p, col("bin")))
    def edge(bin: Column): Column =
      round(col("mn") + bin * (col("mx") - col("mn")) / 1000.0, 4)
    cum.groupBy("event_type")
      .agg(pick(0.5).as("b50"), pick(0.9).as("b90"), pick(0.99).as("b99"),
        first("mn").as("mn"), first("mx").as("mx"))
      .select(col("event_type"), edge(col("b50")).as("p50"),
        edge(col("b90")).as("p90"), edge(col("b99")).as("p99"))
      .orderBy("event_type")
  }

  val histQuantilesSql: String =
    """WITH mm AS (
      |  SELECT event_type, min(value) AS mn, max(value) AS mx,
      |         count(*) AS n
      |  FROM events GROUP BY 1),
      |b AS (
      |  SELECT e.event_type,
      |    CASE WHEN mx = mn THEN 0
      |         ELSE least(CAST(floor((value - mn) / (mx - mn) * 1000) AS BIGINT),
      |                    999) END AS bin
      |  FROM events e JOIN mm USING (event_type)),
      |h AS (SELECT event_type, bin, count(*) AS c FROM b GROUP BY 1, 2),
      |cum AS (
      |  SELECT event_type, bin,
      |    sum(c) OVER (PARTITION BY event_type ORDER BY bin) AS cum
      |  FROM h),
      |pick AS (
      |  SELECT c.event_type,
      |    min(CASE WHEN cum >= n * 0.5  THEN bin END) AS b50,
      |    min(CASE WHEN cum >= n * 0.9  THEN bin END) AS b90,
      |    min(CASE WHEN cum >= n * 0.99 THEN bin END) AS b99
      |  FROM cum c JOIN mm USING (event_type)
      |  GROUP BY 1)
      |SELECT p.event_type,
      |  round(mn + b50 * (mx - mn) / 1000.0, 4) AS p50,
      |  round(mn + b90 * (mx - mn) / 1000.0, 4) AS p90,
      |  round(mn + b99 * (mx - mn) / 1000.0, 4) AS p99
      |FROM pick p JOIN mm USING (event_type)
      |ORDER BY event_type""".stripMargin

  // --------------------------------------------------- interval overlap

  /** Incident-impact audit via the interval-overlap join
    * ([[graft.operators.IntervalJoin]]): per sampled error "incident"
    * (a 10-minute window around every ~101st error event), how many
    * user-day activity spans [first event, last event] overlap it.
    *
    * Scale shape: the overlap predicate is NOT an equi-join — raw Spark
    * plans it as a nested loop. IntervalJoin tiles both sides into
    * 1-hour buckets (a day-span explodes to ≤ 25 tiles, an incident to
    * ≤ 2), equi-joins on the tile, and keeps each pair only in the
    * bucket holding the overlap's start — exactly-once emission with NO
    * distinct pass, so the counts aggregate straight off the join. Every
    * timestamp is integer seconds (`unix_micros div 1000000`), keeping
    * the whole pipeline in exact integer arithmetic. */
  def intervalOverlap(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .withColumn("sec", expr("unix_micros(ts) div 1000000"))
    val spans = ev.groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(min("sec").as("a0"), max("sec").as("a1"))
    val incidents = ev
      .where(col("event_type") === "error" && col("event_id") % 101 === 0)
      .select(col("event_id").as("incident_id"), col("sec").as("b0"),
        (col("sec") + 600L).as("b1"))
    graft.operators.IntervalJoin
      .overlap(spans, incidents, "a0", "a1", "b0", "b1", 3600L)
      .groupBy("incident_id")
      .agg(count(lit(1)).as("n_spans"), countDistinct("user_id").as("n_users"))
      .orderBy("incident_id")
  }

  val intervalOverlapSql: String =
    """WITH ev AS (
      |  SELECT *, epoch_us(ts) // 1000000 AS sec FROM events),
      |spans AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day,
      |         min(sec) AS a0, max(sec) AS a1
      |  FROM ev GROUP BY 1, 2),
      |inc AS (
      |  SELECT event_id AS incident_id, sec AS b0, sec + 600 AS b1
      |  FROM ev WHERE event_type = 'error' AND event_id % 101 = 0)
      |SELECT incident_id, count(*) AS n_spans,
      |       count(DISTINCT user_id) AS n_users
      |FROM spans JOIN inc ON a0 <= b1 AND b0 <= a1
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------ triangles

  /** Top-100 parts by triangle count in the co-occurrence graph (parts
    * are linked when they appear in the same order) — the market-basket
    * community-density signal: a part in many triangles sits inside
    * tightly-bound product clusters, not just popular pairs.
    *
    * Scale shape: the per-order clique expansion is bounded by TPC-H's
    * ≤ 7 lineitems per order (C(7,2) pairs), and both self-join sides
    * reuse ONE l_orderkey exchange. Triangle enumeration is
    * [[graft.operators.Graph.triangles]] — edges oriented low-degree →
    * high-degree so wedge volume is O(m^{3/2}) no matter how skewed the
    * part popularity is, each triangle found exactly once (single
    * minimum vertex — no dedup shuffle). Per-node counts then explode 3
    * rows per triangle and TakeOrdered the top 100. */
  def graphTriangles(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d).select("l_orderkey", "l_partkey")
    // r14: per-order clique expansion via ONE orderkey aggregation +
    // array pair explosion instead of the lineitem self-join — the
    // same distinct edge set (collect_set sorts ascending, slice takes
    // strictly-later elements, so u < v exactly like the a < b join
    // condition), but one exchange of lineitem replaces the SMJ's
    // sort+merge of two scan branches: measured 1.44 s vs 2.01 s for
    // the edge build and 3.49 s vs 4.22 s for the full query at sf0.1.
    // The ≤7-lineitems-per-order bound keeps the per-group pair count
    // trivially small at any scale.
    val e = li.groupBy("l_orderkey")
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .select(explode(expr(
        "flatten(transform(ps, (x, i) -> transform(" +
          "slice(ps, i + 2, size(ps) - i - 1), y -> struct(x AS u, y AS v))))"))
        .as("e"))
      .select(col("e.u"), col("e.v"))
      .distinct()
    graft.operators.Graph.triangles(e, "u", "v")
      .select(explode(array(col("id_a"), col("id_b"), col("id_c"))).as("part"))
      .groupBy("part").agg(count(lit(1)).as("n_tri"))
      .orderBy(col("n_tri").desc, col("part"))
      .limit(100)
  }

  val graphTrianglesSql: String =
    """WITH e AS (
      |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      |tri AS (
      |  SELECT e1.u AS x, e1.v AS y, e2.v AS z
      |  FROM e e1 JOIN e e2 ON e2.u = e1.v
      |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
      |nodes AS (
      |  SELECT x AS part FROM tri
      |  UNION ALL SELECT y FROM tri
      |  UNION ALL SELECT z FROM tri)
      |SELECT part, count(*) AS n_tri
      |FROM nodes GROUP BY 1
      |ORDER BY n_tri DESC, part LIMIT 100""".stripMargin

  // ------------------------------------------------------------ z-order

  /** Z-order layout audit: Morton-code lineitem on (l_partkey,
    * l_suppkey) ([[graft.operators.ZOrder]]), split the curve into 64
    * equal z-range buckets, and report each bucket's row count and
    * per-key min/max — the numbers that show why `OPTIMIZE ZORDER BY`
    * works: every bucket covers a NARROW range of BOTH keys (≈ 1/8 of
    * each dimension at 64 buckets), so min/max file stats can skip on
    * predicates over either column. A plain sort gives this for its
    * leading key only; `ZOrderSpec` quantifies the difference.
    *
    * Scale shape: the z-value is a pure codegen'd bit-expression (no
    * UDF), bounds come from a broadcast 1-row min/max aggregate, and
    * the bucket rollup is map-side combinable — the full layout rewrite
    * would add only the range-partitioned sort every OPTIMIZE pays.
    * Exact integer arithmetic throughout (explicit floor: Spark's long
    * cast truncates, DuckDB's rounds). */
  def zorderLayout(s: SparkSession, d: String): DataFrame = {
    val z = graft.operators.ZOrder.withZval(
      lineitem(s, d).select("l_partkey", "l_suppkey"),
      "l_partkey", "l_suppkey")
    z.withColumn("zbucket", floor(col("zval") / 67108864.0))
      .groupBy("zbucket")
      .agg(count(lit(1)).as("n"),
        min("l_partkey").as("pk_min"), max("l_partkey").as("pk_max"),
        min("l_suppkey").as("sk_min"), max("l_suppkey").as("sk_max"))
      .orderBy("zbucket")
  }

  val zorderLayoutSql: String = {
    // joined on ONE line: a leading "|" on a continuation line would be
    // eaten by stripMargin as a margin delimiter, corrupting the OR
    val inter = (0 until 16).map(i =>
      s"((((na >> $i) & 1) << ${2 * i}) | (((nb >> $i) & 1) << ${2 * i + 1}))")
      .mkString(" | ")
    s"""WITH b AS (
       |  SELECT min(l_partkey) AS amn, max(l_partkey) AS amx,
       |         min(l_suppkey) AS bmn, max(l_suppkey) AS bmx
       |  FROM lineitem),
       |nrm AS (
       |  SELECT CAST(floor((l_partkey - amn) * 65535 / (amx - amn)) AS BIGINT) AS na,
       |         CAST(floor((l_suppkey - bmn) * 65535 / (bmx - bmn)) AS BIGINT) AS nb,
       |         l_partkey, l_suppkey
       |  FROM lineitem CROSS JOIN b),
       |z AS (
       |  SELECT ($inter) AS zval, l_partkey, l_suppkey FROM nrm)
       |SELECT CAST(floor(zval / 67108864.0) AS BIGINT) AS zbucket,
       |       count(*) AS n,
       |       min(l_partkey) AS pk_min, max(l_partkey) AS pk_max,
       |       min(l_suppkey) AS sk_min, max(l_suppkey) AS sk_max
       |FROM z GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // --------------------------------------------------------- DAU/WAU

  /** Daily and trailing-7-day active users with the DAU/WAU stickiness
    * ratio — the product-engagement rollup every event log grows.
    *
    * Scale shape: raw events collapse to the USER-DAY table first (one
    * map-side-combinable dedup — the bounded thing at 100 TB); each
    * user-day then contributes to exactly the 7 window days it can
    * affect via a `sequence` explode OF THAT TABLE (×7, never ×|events|),
    * and the per-day distinct count runs on (day, user) pairs. A sliding
    * COUNT(DISTINCT) window cannot express this (distinct doesn't
    * decompose over frames); the explode formulation is exact and
    * partially aggregates. At extreme user cardinality the same shape
    * carries [[graft.operators.KmvSketchAgg]] sketches per day and
    * merges 7 of them per window instead. */
  def dauWau(s: SparkSession, d: String): DataFrame = {
    val ud = events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
    val wau = ud
      .select(col("user_id"),
        explode(sequence(col("day"), date_add(col("day"), 6))).as("day"))
      .groupBy("day").agg(countDistinct("user_id").as("wau"))
    dau.join(wau, "day")
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("dau"), col("wau"),
        (floor(col("dau") / col("wau") * 1e4) / 1e4).as("stickiness"))
      .orderBy("day")
  }

  val dauWauSql: String =
    """WITH ud AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY 1),
      |contrib AS (
      |  SELECT user_id,
      |    CAST(unnest(generate_series(CAST(day AS TIMESTAMP),
      |      CAST(day AS TIMESTAMP) + INTERVAL 6 DAY, INTERVAL 1 DAY)) AS DATE)
      |      AS day
      |  FROM ud),
      |wau AS (SELECT day, count(DISTINCT user_id) AS wau FROM contrib GROUP BY 1)
      |SELECT strftime(d.day, '%Y-%m-%d') AS day, d.dau, w.wau,
      |       floor(d.dau / w.wau * 1e4) / 1e4 AS stickiness
      |FROM dau d JOIN wau w USING (day)
      |ORDER BY day""".stripMargin

  // ------------------------------------------------------ skew diagnostics

  /** Join-key skew diagnostics for the two natural fact keys: rows,
    * distinct keys, the hottest key's share, the top-10 keys' share,
    * and the Gini coefficient of the key-count distribution — the
    * numbers that decide between a plain shuffle join, AQE skew
    * handling, and [[graft.operators.SkewJoin]]'s key salting.
    *
    * Scale shape: the per-key count is a map-side-combinable aggregate;
    * everything after runs on the KEY TABLE (thousands to millions of
    * rows — the thing that still fits when the fact table doesn't).
    * The rank window sorts that key table, not the corpus; at extreme
    * key cardinality the same shares/Gini come off the histogram-ECDF
    * construction of `quality_percentile` instead. All stats are exact
    * integer arithmetic until the final pointwise divisions,
    * floor-truncated for display. */
  def skewStats(s: SparkSession, d: String): DataFrame = {
    def stats(df: DataFrame, key: String, source: String): DataFrame = {
      val cnt = df.groupBy(col(key).as("k")).agg(count(lit(1)).as("c"))
      val w = Window.orderBy(col("c"), col("k"))
      val ranked = cnt
        .withColumn("i", row_number().over(w))
        .withColumn("nk", count(lit(1)).over(
          Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      ranked
        .agg(count(lit(1)).as("n_keys"), sum("c").as("n_rows"),
          max("c").as("max_c"), sum(col("i") * col("c")).as("ic"),
          sum(when(col("i") > col("nk") - 10, col("c")).otherwise(0L)).as("top10"))
        .select(lit(source).as("source"), col("n_rows"), col("n_keys"),
          (floor(col("max_c") / col("n_rows") * 1e6) / 1e6).as("max_share"),
          (floor(col("top10") / col("n_rows") * 1e6) / 1e6).as("top10_share"),
          (floor((lit(2.0) * col("ic") / (col("n_keys") * col("n_rows"))
            - (col("n_keys") + lit(1.0)) / col("n_keys")) * 1e6) / 1e6).as("gini"))
    }
    stats(lineitem(s, d), "l_partkey", "lineitem.l_partkey")
      .unionAll(stats(events(s, d), "user_id", "events.user_id"))
      .orderBy("source")
  }

  val skewStatsSql: String = {
    def block(table: String, key: String, source: String): String =
      s"""SELECT '$source' AS source,
         |  CAST(sum(c) AS BIGINT) AS n_rows, count(*) AS n_keys,
         |  floor(max(c) / sum(c) * 1e6) / 1e6 AS max_share,
         |  floor(sum(CASE WHEN i > nk - 10 THEN c ELSE 0 END)
         |        / sum(c) * 1e6) / 1e6 AS top10_share,
         |  floor((2.0 * sum(i * c) / (count(*) * sum(c))
         |         - (count(*) + 1.0) / count(*)) * 1e6) / 1e6 AS gini
         |FROM (
         |  SELECT c, row_number() OVER (ORDER BY c, k) AS i,
         |         count(*) OVER () AS nk
         |  FROM (SELECT $key AS k, count(*) AS c FROM $table GROUP BY 1))""".stripMargin
    s"""${block("lineitem", "l_partkey", "lineitem.l_partkey")}
       |UNION ALL
       |${block("events", "user_id", "events.user_id")}
       |ORDER BY source""".stripMargin
  }

  // ------------------------------------------------------ sequence mining

  /** First-order Markov transition matrix over each user's event
    * sequence: P(next event type | current), the behavioral-model /
    * next-action-prediction baseline.
    *
    * Scale shape: ONE shuffle on user_id for the lead() window; the
    * (from, to) pair counts partially aggregate map-side (25 cells),
    * and the row-normalizing total reuses the pair aggregate (a 25-row
    * window, not a second pass over events). Probability is an
    * integer/integer division (identical doubles cross-engine),
    * floor-truncated for display — the same round()-mismatch
    * guard as [[eventsAnomaly]]. */
  def eventsMarkov(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val wf = Window.partitionBy("from_type")
    events(s, d)
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .where(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p",
        floor(col("n") / sum(col("n")).over(wf) * 1e4) / 1e4)
      .orderBy("from_type", "to_type")
  }

  val eventsMarkovSql: String =
    """WITH seq AS (
      |  SELECT event_type AS from_type,
      |    lead(event_type) OVER (PARTITION BY user_id
      |                           ORDER BY ts, event_id) AS to_type
      |  FROM events),
      |pairs AS (
      |  SELECT from_type, to_type, count(*) AS n
      |  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2)
      |SELECT from_type, to_type, n,
      |  floor(n / (sum(n) OVER (PARTITION BY from_type)) * 1e4) / 1e4 AS p
      |FROM pairs ORDER BY from_type, to_type""".stripMargin

  /** Top-20 most frequent 3-step event paths (consecutive triples per
    * user) — the funnel-discovery complement of `q18_funnel`, which
    * checks ONE known path; this mines which paths dominate.
    *
    * Scale shape: the same single user_id partitioning serves both
    * lead() columns; triples partially aggregate map-side (≤ 125
    * distinct cells regardless of corpus size) and the top-20 is a
    * TakeOrdered. Pure integer counts — no FP anywhere. */
  def eventPaths(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events(s, d)
      .withColumn("e2", lead(col("event_type"), 1).over(w))
      .withColumn("e3", lead(col("event_type"), 2).over(w))
      .where(col("e3").isNotNull)
      .groupBy(col("event_type").as("s1"), col("e2").as("s2"),
        col("e3").as("s3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("s1"), col("s2"), col("s3"))
      .limit(20)
  }

  val eventPathsSql: String =
    """WITH seq AS (
      |  SELECT event_type AS s1,
      |    lead(event_type, 1) OVER w AS s2,
      |    lead(event_type, 2) OVER w AS s3
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT s1, s2, s3, count(*) AS n
      |FROM seq WHERE s3 IS NOT NULL
      |GROUP BY 1, 2, 3
      |ORDER BY n DESC, s1, s2, s3 LIMIT 20""".stripMargin

  // ------------------------------------------------------- trend fitting

  /** Per-event-type least-squares trend of value over time (slope per
    * day, intercept at the corpus start, Pearson r) — drift detection
    * over the event log.
    *
    * Scale shape: ONE map-side-combinable aggregate per group over five
    * moment sums (n, Σx, Σy, Σxy, Σx², Σy²) — no sort, no window, no
    * second pass over events; the global time origin is a 1-row min
    * that broadcasts back via crossJoin (the bm25 stats shape).
    * Numerics: x is integer seconds FROM THE CORPUS START (raw epoch
    * seconds would make nΣx² − (Σx)² cancel catastrophically at 1e27
    * scale), y is DECIMAL(18,6); every sum is exact DECIMAL
    * (order-independent), and the closed-form slope/intercept/r are
    * pointwise IEEE on those exact sums — identical doubles in any
    * engine, floor-truncated for display. */
  def eventsTrend(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .select(col("event_type"),
        expr("unix_micros(ts) div 1000000").as("sec"),
        col("value").cast("decimal(18,6)").as("y"))
    val origin = ev.agg(min("sec").as("x0"))
    val m = ev.crossJoin(broadcast(origin))
      .withColumn("x", (col("sec") - col("x0")).cast("decimal(12,0)"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("event_type"), col("n"),
        col("sx").cast("double").as("sx"), col("sy").cast("double").as("sy"),
        col("sxy").cast("double").as("sxy"), col("sxx").cast("double").as("sxx"),
        col("syy").cast("double").as("syy"))
    val covN = col("n") * col("sxy") - col("sx") * col("sy")
    val varXN = col("n") * col("sxx") - col("sx") * col("sx")
    val varYN = col("n") * col("syy") - col("sy") * col("sy")
    val slope = covN / varXN
    m.select(col("event_type"), col("n"),
        (floor(slope * 86400 * 1e6) / 1e6).as("slope_per_day"),
        (floor((col("sy") - slope * col("sx")) / col("n") * 1e4) / 1e4)
          .as("intercept"),
        (floor(covN / sqrt(varXN * varYN) * 1e4) / 1e4).as("r"))
      .orderBy("event_type")
  }

  val eventsTrendSql: String =
    """WITH ev AS (
      |  SELECT event_type, epoch_us(ts) // 1000000 AS sec,
      |         CAST(value AS DECIMAL(18,6)) AS y
      |  FROM events),
      |o AS (SELECT min(sec) AS x0 FROM ev),
      |m AS (
      |  SELECT event_type, count(*) AS n,
      |    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
      |    CAST(sum(x * y) AS DOUBLE) AS sxy,
      |    CAST(sum(x * x) AS DOUBLE) AS sxx,
      |    CAST(sum(y * y) AS DOUBLE) AS syy
      |  FROM (SELECT event_type, CAST(sec - x0 AS DECIMAL(12,0)) AS x, y
      |        FROM ev CROSS JOIN o)
      |  GROUP BY 1)
      |SELECT event_type, n,
      |  floor((n * sxy - sx * sy) / (n * sxx - sx * sx) * 86400 * 1e6) / 1e6
      |    AS slope_per_day,
      |  floor((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n * 1e4)
      |    / 1e4 AS intercept,
      |  floor((n * sxy - sx * sy)
      |        / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) * 1e4) / 1e4 AS r
      |FROM m ORDER BY event_type""".stripMargin

  val all: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "events_trend" -> (eventsTrend _, eventsTrendSql),
    "events_dau_wau" -> (dauWau _, dauWauSql),
    "zorder_layout" -> (zorderLayout _, zorderLayoutSql),
    "skew_stats" -> (skewStats _, skewStatsSql),
    "events_markov" -> (eventsMarkov _, eventsMarkovSql),
    "events_paths" -> (eventPaths _, eventPathsSql),
    "graph_triangles" -> (graphTriangles _, graphTrianglesSql),
    "text_bm25_topk" -> (bm25Topk _, bm25TopkSql),
    "freq_heavy_hitters" -> (heavyHitters _, heavyHittersSql),
    "cdc_latest_state" -> (cdcLatestState _, cdcLatestStateSql),
    "cdc_scd2_intervals" -> (cdcScd2Intervals _, cdcScd2IntervalsSql),
    "events_gapfill" -> (eventsGapfill _, eventsGapfillSql),
    "distinct_kmv" -> (distinctKmv _, distinctKmvSql),
    "distinct_kmv_union" -> (distinctKmvUnion _, distinctKmvUnionSql),
    "events_anomaly" -> (eventsAnomaly _, eventsAnomalySql),
    "events_hist_quantiles" -> (histQuantiles _, histQuantilesSql),
    "interval_overlap_join" -> (intervalOverlap _, intervalOverlapSql),
  )
}
