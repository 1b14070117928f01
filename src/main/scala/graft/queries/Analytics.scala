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
      split(lower(trim(col("text"))), "\\s+").as("a"))
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

  val all: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "text_bm25_topk" -> (bm25Topk _, bm25TopkSql),
    "freq_heavy_hitters" -> (heavyHitters _, heavyHittersSql),
    "cdc_latest_state" -> (cdcLatestState _, cdcLatestStateSql),
    "cdc_scd2_intervals" -> (cdcScd2Intervals _, cdcScd2IntervalsSql),
    "events_gapfill" -> (eventsGapfill _, eventsGapfillSql),
  )
}
