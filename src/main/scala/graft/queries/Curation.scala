package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.TextCuration
import Tables._

/** Corpus-curation queries over the `documents` table: Gopher-style
  * quality filtering (Rae et al. 2021 §A1.1-style heuristics), PII
  * redaction, deterministic hash splits, and C4-style global line dedup.
  * Every query has an exact DuckDB oracle; constants are rendered into
  * both sides so the pair can never drift.
  */
object Curation {

  /** Gopher-style quality signals + keep/drop verdict per document. The
    * signals are the cheap corpus-wide pass a pipeline runs before any
    * model-based scoring: word count bounds, mean word length, fraction
    * of words with an alphabetic char, stopword presence, symbol ratios,
    * and repetition (duplicate-word fraction standing in for the
    * paper's duplicate-line rules, since this corpus is single-line).
    * One linear scan, no shuffle until the final order-by.
    */
  def gopherFilters(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), trim(col("text")).as("t"))
      .select(col("doc_id"), col("t"), split(col("t"), graft.queries.Tables.Ws).as("tk"))
      .select(
        col("doc_id"),
        size(col("tk")).as("n_words"),
        round(length(regexp_replace(col("t"), graft.queries.Tables.Ws, "")).cast("double")
          / size(col("tk")), 4).as("mean_word_len"),
        round(expr("size(filter(tk, x -> x rlike '[a-zA-Z]'))").cast("double")
          / size(col("tk")), 4).as("alpha_word_ratio"),
        expr("size(filter(tk, x -> lower(x) IN " +
          "('the','and','of','to','a','in','that','is','was','it')))")
          .as("n_stopwords"),
        round((length(col("t")) - length(expr("replace(t, '#', '')")))
          .cast("double") / size(col("tk")), 4).as("hash_ratio"),
        round(((length(col("t")) - length(expr("replace(t, '...', '')"))) / 3)
          .cast("double") / size(col("tk")), 4).as("ellipsis_ratio"),
        round(lit(1.0) - size(array_distinct(col("tk"))).cast("double")
          / size(col("tk")), 4).as("dup_word_ratio"))
      .withColumn("keep",
        (col("n_words") >= 10 && col("n_words") <= 5000 &&
          col("mean_word_len") >= 2 && col("mean_word_len") <= 12 &&
          col("alpha_word_ratio") >= 0.7 && col("n_stopwords") >= 1 &&
          col("hash_ratio") <= 0.1 && col("ellipsis_ratio") <= 0.1 &&
          col("dup_word_ratio") <= 0.6).cast("int"))
      .orderBy("doc_id")

  val gopherFiltersSql: String =
    """WITH sig AS (
      |  SELECT doc_id,
      |    len(arr) AS n_words,
      |    round(length(regexp_replace(t, '\s+', '', 'g')) / len(arr), 4) AS mean_word_len,
      |    round(len(list_filter(arr, x -> regexp_matches(x, '[a-zA-Z]'))) / len(arr), 4) AS alpha_word_ratio,
      |    len(list_filter(arr, x -> lower(x) IN
      |      ('the','and','of','to','a','in','that','is','was','it'))) AS n_stopwords,
      |    round((length(t) - length(replace(t, '#', ''))) / len(arr), 4) AS hash_ratio,
      |    round(((length(t) - length(replace(t, '...', ''))) / 3) / len(arr), 4) AS ellipsis_ratio,
      |    round(1.0 - len(list_distinct(arr)) / len(arr), 4) AS dup_word_ratio
      |  FROM (SELECT doc_id, trim(text) AS t,
      |          regexp_split_to_array(trim(text), '\s+') AS arr
      |        FROM documents))
      |SELECT doc_id, n_words, mean_word_len, alpha_word_ratio, n_stopwords,
      |  hash_ratio, ellipsis_ratio, dup_word_ratio,
      |  CAST(n_words >= 10 AND n_words <= 5000
      |   AND mean_word_len >= 2 AND mean_word_len <= 12
      |   AND alpha_word_ratio >= 0.7 AND n_stopwords >= 1
      |   AND hash_ratio <= 0.1 AND ellipsis_ratio <= 0.1
      |   AND dup_word_ratio <= 0.6 AS INT) AS keep
      |FROM sig ORDER BY doc_id""".stripMargin

  /** PII detection + redaction. The corpus itself is synthetic word
    * streams with no PII, so the query plants deterministic PII (email,
    * phone, IPv4 derived from doc_id) before scanning — both sides of
    * the oracle derive the same plant, so match counts and the redacted
    * text hash verify the actual regex machinery end to end. */
  def piiRedact(s: SparkSession, d: String): DataFrame = {
    val planted = concat(col("text"),
      lit(" contact user"), col("doc_id").cast("string"),
      lit("@example.com or call 555-"),
      lpad((col("doc_id") % 1000).cast("string"), 3, "0"),
      lit("-1234 from 10.0."), (col("doc_id") % 256).cast("string"),
      lit("."), ((col("doc_id") * 7) % 256).cast("string"))
    val (emails, phones, ips) = TextCuration.piiCounts(col("t"))
    documents(s, d)
      .select(col("doc_id"), planted.as("t"))
      .select(col("doc_id"),
        emails.as("n_emails"), phones.as("n_phones"), ips.as("n_ips"),
        md5(TextCuration.redactPii(col("t"))).as("redacted_md5"))
      .orderBy("doc_id")
  }

  val piiRedactSql: String =
    """WITH planted AS (
      |  SELECT doc_id,
      |    text || ' contact user' || CAST(doc_id AS VARCHAR)
      |      || '@example.com or call 555-'
      |      || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
      |      || '-1234 from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
      |      || '.' || CAST((doc_id * 7) % 256 AS VARCHAR) AS t
      |  FROM documents)
      |SELECT doc_id,
      |  len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
      |  len(regexp_extract_all(t, '\d{3}-\d{3}-\d{4}')) AS n_phones,
      |  len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ips,
      |  md5(regexp_replace(regexp_replace(regexp_replace(t,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |    '\d{3}-\d{3}-\d{4}', '<PHONE>', 'g'),
      |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')) AS redacted_md5
      |FROM planted ORDER BY doc_id""".stripMargin

  /** Deterministic hash-based train/val/test split (80/10/10): stable
    * under repartitioning and corpus growth, unlike rand() or row-order
    * splits. Emits the per-doc assignment so the oracle verifies every
    * single routing decision, not just the split sizes. */
  def hashSplit(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"),
        TextCuration.hashBucket(col("doc_id")).as("bucket"),
        TextCuration.hashSplit(col("doc_id")).as("split"))
      .orderBy("doc_id")

  val hashSplitSql: String =
    """WITH b AS (
      |  SELECT doc_id,
      |    ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
      |   + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
      |   + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
      |   + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1)) % 100 AS bucket
      |  FROM documents)
      |SELECT doc_id, bucket,
      |  CASE WHEN bucket < 80 THEN 'train'
      |       WHEN bucket < 90 THEN 'val'
      |       ELSE 'test' END AS split
      |FROM b ORDER BY doc_id""".stripMargin

  /** C4-style global line dedup exercised at word granularity: this
    * corpus is single-line, so each whitespace token plays the role of a
    * line — the heaviest duplication stress the operator can see (every
    * common word is a corpus-wide duplicate). A doc keeps a "line" only
    * at its globally-first (doc_id, pos) occurrence; the rebuilt-text
    * hash pins the rebuild ordering exactly. */
  def dedupLines(s: SparkSession, d: String): DataFrame =
    TextCuration.dedupLines(
      documents(s, d).select(col("doc_id"), col("text")),
      "doc_id", "text", sepRegex = graft.queries.Tables.Ws, joinSep = "\n")
      .select(col("doc_id"), col("n_lines"), col("n_kept"),
        md5(col("rebuilt")).as("rebuilt_md5"))
      .orderBy("doc_id")

  val dedupLinesSql: String =
    """WITH lines AS (
      |  SELECT doc_id, i - 1 AS pos, arr[i] AS line
      |  FROM (SELECT doc_id, regexp_split_to_array(text, '\s+') AS arr
      |        FROM documents),
      |       LATERAL (SELECT unnest(generate_series(1, len(arr))) AS i)),
      |ranked AS (
      |  SELECT doc_id, pos, line,
      |    row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
      |  FROM lines WHERE trim(line) <> ''),
      |kept AS (
      |  SELECT doc_id, pos, line FROM ranked WHERE rn = 1
      |  UNION ALL
      |  SELECT doc_id, pos, line FROM lines WHERE trim(line) = ''),
      |reb AS (
      |  SELECT doc_id, count(*) AS n_kept,
      |         string_agg(line, chr(10) ORDER BY pos) AS rebuilt
      |  FROM kept GROUP BY doc_id),
      |tot AS (SELECT doc_id, count(*) AS n_lines FROM lines GROUP BY doc_id)
      |SELECT d.doc_id, coalesce(t.n_lines, 0) AS n_lines,
      |       coalesce(r.n_kept, 0) AS n_kept,
      |       md5(coalesce(r.rebuilt, '')) AS rebuilt_md5
      |FROM documents d
      |LEFT JOIN tot t ON t.doc_id = d.doc_id
      |LEFT JOIN reb r ON r.doc_id = d.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** Gopher repetition signals (the duplicate-n-gram family the flat
    * [[gopherFilters]] scan can't see): per doc, the occurrence share of
    * the most frequent word 2-gram and the duplicate-occurrence fraction
    * of 2-grams and 5-grams. Explode + two-level aggregation keyed on
    * (doc, gram) — partial aggregation collapses repeats map-side, so
    * the shuffle carries near-distinct grams, not raw occurrences. */
  def repetitionStats(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
      .select(col("doc_id"), split(trim(col("text")), graft.queries.Tables.Ws).as("tk"))
    def gramStats(n: Int, top: Boolean): DataFrame = {
      val grams = docs.select(col("doc_id"),
        explode(expr(
          s"CASE WHEN size(tk) >= $n THEN transform(sequence(1, size(tk) - ${n - 1}), " +
            s"i -> concat_ws(' ', slice(tk, i, $n))) " +
            "ELSE array() END")).as("g"))
      val counts = grams.groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      val aggs =
        Seq(sum("c").as(s"n_${n}grams"),
          round(lit(1.0) - count(lit(1)).cast("double") / sum("c"), 4)
            .as(s"dup${n}_frac")) ++
          (if (top) Seq(round(max("c").cast("double") / sum("c"), 4)
            .as(s"top${n}_frac"))
          else Nil)
      counts.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
    }
    docs.select("doc_id")
      .join(gramStats(2, top = true), Seq("doc_id"), "left")
      .join(gramStats(5, top = false), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_2grams"), lit(0L)).as("n_2grams"),
        coalesce(col("top2_frac"), lit(0.0)).as("top2_frac"),
        coalesce(col("dup2_frac"), lit(0.0)).as("dup2_frac"),
        coalesce(col("n_5grams"), lit(0L)).as("n_5grams"),
        coalesce(col("dup5_frac"), lit(0.0)).as("dup5_frac"))
      .orderBy("doc_id")
  }

  val repetitionStatsSql: String =
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS arr
      |  FROM documents),
      |g2 AS (
      |  SELECT doc_id, arr[i] || ' ' || arr[i+1] AS g
      |  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(arr) - 1)) AS i)),
      |c2 AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY doc_id, g),
      |s2 AS (
      |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_2grams,
      |    round(max(c) / sum(c), 4) AS top2_frac,
      |    round(1.0 - count(*) / sum(c), 4) AS dup2_frac
      |  FROM c2 GROUP BY doc_id),
      |g5 AS (
      |  SELECT doc_id,
      |    arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] || ' ' || arr[i+3] || ' ' || arr[i+4] AS g
      |  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(arr) - 4)) AS i)),
      |c5 AS (SELECT doc_id, g, count(*) AS c FROM g5 GROUP BY doc_id, g),
      |s5 AS (
      |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_5grams,
      |    round(1.0 - count(*) / sum(c), 4) AS dup5_frac
      |  FROM c5 GROUP BY doc_id)
      |SELECT t.doc_id,
      |  coalesce(s2.n_2grams, 0) AS n_2grams,
      |  coalesce(s2.top2_frac, 0.0) AS top2_frac,
      |  coalesce(s2.dup2_frac, 0.0) AS dup2_frac,
      |  coalesce(s5.n_5grams, 0) AS n_5grams,
      |  coalesce(s5.dup5_frac, 0.0) AS dup5_frac
      |FROM toks t
      |LEFT JOIN s2 ON s2.doc_id = t.doc_id
      |LEFT JOIN s5 ON s5.doc_id = t.doc_id
      |ORDER BY t.doc_id""".stripMargin

  /** Stratified deterministic sampling: within each language stratum,
    * keep the docs whose hash bucket falls under 20% — same stable-
    * under-everything property as [[hashSplit]], but rate-controlled per
    * group. The md5 over the kept-id list verifies every sampling
    * decision, not just the rates. */
  def stratifiedSample(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("lang"), col("doc_id"),
        graft.operators.TextCuration.hashBucket(col("doc_id")).as("bucket"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("bucket") < 20, 1L).otherwise(0L)).as("n_kept"),
        md5(coalesce(array_join(
          transform(array_sort(collect_list(when(col("bucket") < 20, col("doc_id")))),
            x => x.cast("string")),
          ","), lit(""))).as("kept_md5"))
      .withColumn("kept_frac",
        round(col("n_kept").cast("double") / col("n_docs"), 4))
      .orderBy("lang")

  val stratifiedSampleSql: String =
    """WITH b AS (
      |  SELECT lang, doc_id,
      |    ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
      |   + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
      |   + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
      |   + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1)) % 100 AS bucket
      |  FROM documents)
      |SELECT lang, count(*) AS n_docs,
      |  CAST(sum(CASE WHEN bucket < 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  md5(coalesce(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
      |        FILTER (WHERE bucket < 20), '')) AS kept_md5,
      |  round(sum(CASE WHEN bucket < 20 THEN 1 ELSE 0 END) / count(*), 4) AS kept_frac
      |FROM b GROUP BY lang ORDER BY lang""".stripMargin

  /** Per-group top-k selection (the "best documents per language"
    * pattern every curated-corpus recipe ends with): rank by content
    * length within each language, keep the top 3. Window + filter —
    * Catalyst runs it as one shuffle on the group key with a partial
    * top-k below (TakeOrdered-style) at real scale. */
  def topkPerGroup(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("lang")
      .orderBy(col("n_chars").desc, col("doc_id"))
    documents(s, d)
      .select(col("lang"), col("doc_id"), col("n_chars"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .orderBy("lang", "rank")
  }

  val topkPerGroupSql: String =
    """SELECT lang, doc_id, n_chars, rank FROM (
      |  SELECT lang, doc_id, n_chars,
      |    row_number() OVER (PARTITION BY lang
      |                       ORDER BY n_chars DESC, doc_id) AS rank
      |  FROM documents)
      |WHERE rank <= 3 ORDER BY lang, rank""".stripMargin

  /** Unigram language-model scoring (the CCNet-style perplexity filter
    * with the corpus itself as the LM): train token frequencies in one
    * aggregation, score each doc by its mean token negative log
    * probability — high = rare/garbled vocabulary, the standard cheap
    * proxy for "would a real LM find this document surprising".
    *
    * Scale shape: one explode + one (token) groupBy for the LM (vocab-
    * sized result), a broadcast-friendly join back (vocab ≪ corpus),
    * and a per-doc aggregation. The 1-row total crosses as a broadcast
    * cross join, never a collect. */
  def unigramLogprob(s: SparkSession, d: String): DataFrame = {
    val tok = documents(s, d)
      .select(col("doc_id"),
        explode(split(trim(col("text")), graft.queries.Tables.Ws)).as("w0"))
      .select(col("doc_id"), lower(col("w0")).as("w"))
    val freq = tok.groupBy("w").agg(count(lit(1)).as("c"))
    val tot = freq.agg(sum("c").cast("double").as("t"))
    tok.join(freq, "w")
      .crossJoin(broadcast(tot))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"),
        round(avg(-log(col("c") / col("t"))), 4).as("avg_neglogp"))
      .orderBy("doc_id")
  }

  val unigramLogprobSql: String =
    """WITH tok AS (
      |  SELECT doc_id, lower(arr[i]) AS w
      |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS arr
      |        FROM documents),
      |       LATERAL (SELECT unnest(generate_series(1, len(arr))) AS i)),
      |freq AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
      |tot AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM freq)
      |SELECT doc_id, count(*) AS n_tok,
      |  round(avg(-ln(c / t)), 4) AS avg_neglogp
      |FROM tok JOIN freq USING (w) CROSS JOIN tot
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Corpus-trained BIGRAM language-model scoring — the next signal up
    * from [[unigramLogprob]] (CCNet uses a 5-gram KenLM; the Laplace-
    * smoothed conditional here is the same shape at n=2):
    * mean ln P(w2|w1) with P = (c(w1,w2) + 0.5) / (c(w1·) + 0.5·V),
    * c(w1·) the bigram-prefix count and V the corpus vocabulary. Low
    * scores flag word-salad/boilerplate docs whose unigram stats look
    * normal. Shuffle profile: one bigram explode, two vocab-sized
    * partial-agg group-bys, broadcast V — same scale shape as the
    * unigram pass. Docs with < 2 tokens have no bigrams and drop. */
  def bigramLogprob(s: SparkSession, d: String): DataFrame = {
    val bg = documents(s, d)
      .select(col("doc_id"),
        split(lower(trim(col("text"))), graft.queries.Tables.Ws).as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(tk) - 1), i -> struct(tk[i-1] AS w1, tk[i] AS w2))"))
        .as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val cBg = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c"))
    val cPre = bg.groupBy("w1").agg(count(lit(1)).as("cw"))
    val vocab = documents(s, d)
      .select(explode(split(lower(trim(col("text"))), graft.queries.Tables.Ws)).as("w"))
      .agg(countDistinct(col("w")).cast("double").as("v"))
    bg.join(cBg, Seq("w1", "w2"))
      .join(cPre, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(log((col("c") + lit(0.5)) / (col("cw") + lit(0.5) * col("v")))), 4)
          .as("mean_logprob"))
      .orderBy("doc_id")
  }

  val bigramLogprobSql: String =
    """WITH tk AS (
      |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS arr
      |  FROM documents),
      |bg AS (
      |  SELECT doc_id, arr[i] AS w1, arr[i+1] AS w2
      |  FROM tk, LATERAL (SELECT unnest(generate_series(1, len(arr) - 1)) AS i)
      |  WHERE len(arr) >= 2),
      |cbg AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY 1, 2),
      |cpre AS (SELECT w1, count(*) AS cw FROM bg GROUP BY 1),
      |v AS (SELECT CAST(count(DISTINCT w) AS DOUBLE) AS v
      |      FROM (SELECT unnest(arr) AS w FROM tk))
      |SELECT doc_id, count(*) AS n_bigrams,
      |  round(avg(ln((c + 0.5) / (cw + 0.5 * v))), 4) AS mean_logprob
      |FROM bg JOIN cbg USING (w1, w2) JOIN cpre USING (w1) CROSS JOIN v
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Per-document top-3 terms by tf·idf (idf = ln N/df) — the classic
    * keyword-extraction pass. tf and df are exact integers, so the
    * score is a deterministic function both engines compute identically;
    * ties break on the term itself. One token explode, two partial-agg
    * group-bys (term stats are vocab-sized), a window top-k. */
  def tfidfTopk(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = documents(s, d)
      .select(col("doc_id"),
        explode(split(trim(col("text")), graft.queries.Tables.Ws)).as("w0"))
      .select(col("doc_id"), lower(col("w0")).as("term"))
    val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = documents(s, d).groupBy().agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tfidf").desc, col("term"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf", col("tf") * log(col("n").cast("double") / col("df")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        round(col("tfidf"), 4).as("tfidf"), col("rank"))
      .orderBy("doc_id", "rank")
  }

  val tfidfTopkSql: String =
    """WITH tok AS (
      |  SELECT doc_id, lower(arr[i]) AS term
      |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS arr
      |        FROM documents),
      |       LATERAL (SELECT unnest(generate_series(1, len(arr))) AS i)),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
      |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      |n AS (SELECT count(*) AS n FROM documents),
      |scored AS (
      |  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
      |    tf.tf * ln(CAST(n.n AS DOUBLE) / dfreq.df) AS tfidf
      |  FROM tf JOIN dfreq USING (term) CROSS JOIN n),
      |ranked AS (
      |  SELECT doc_id, term, tf, df, tfidf,
      |    row_number() OVER (PARTITION BY doc_id
      |                       ORDER BY tfidf DESC, term) AS rank
      |  FROM scored)
      |SELECT doc_id, term, tf, df, round(tfidf, 4) AS tfidf, rank
      |FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin

  /** C4-style boilerplate/blocklist screening: flag documents containing
    * web-boilerplate markers or code/markup debris. Pure per-row
    * predicate work — pushes into any scan, no shuffle before the
    * order-by. The term list is rendered into both engines so the rule
    * set can never drift from its oracle. */
  def boilerplateFlags(s: SparkSession, d: String): DataFrame = {
    val markers = Seq("lorem ipsum", "cookie policy", "javascript",
      "terms of service", "all rights reserved")
    val t = lower(col("text"))
    val hasMarker = markers.map(m => t.contains(m)).reduce(_ || _)
    documents(s, d)
      .select(col("doc_id"),
        hasMarker.cast("int").as("has_boilerplate"),
        (t.contains("{") || t.contains("}")).cast("int").as("has_braces"),
        t.rlike("https?://").cast("int").as("has_url"))
      .withColumn("drop_flag",
        (col("has_boilerplate") === 1 || col("has_braces") === 1).cast("int"))
      .orderBy("doc_id")
  }

  val boilerplateFlagsSql: String =
    """SELECT doc_id,
      |  CAST(lower(text) LIKE '%lorem ipsum%'
      |    OR lower(text) LIKE '%cookie policy%'
      |    OR lower(text) LIKE '%javascript%'
      |    OR lower(text) LIKE '%terms of service%'
      |    OR lower(text) LIKE '%all rights reserved%' AS INT) AS has_boilerplate,
      |  CAST(lower(text) LIKE '%{%' OR lower(text) LIKE '%}%' AS INT) AS has_braces,
      |  CAST(regexp_matches(lower(text), 'https?://') AS INT) AS has_url,
      |  CAST(lower(text) LIKE '%lorem ipsum%'
      |    OR lower(text) LIKE '%cookie policy%'
      |    OR lower(text) LIKE '%javascript%'
      |    OR lower(text) LIKE '%terms of service%'
      |    OR lower(text) LIKE '%all rights reserved%'
      |    OR lower(text) LIKE '%{%' OR lower(text) LIKE '%}%' AS INT) AS drop_flag
      |FROM documents ORDER BY doc_id""".stripMargin

  /** The operational output of exact dedup: which doc survives each
    * content-fingerprint group (the lowest id), and how many copies it
    * speaks for. Only 16-byte hashes + ids cross the shuffle; the
    * min-id pick is a partial-aggregatable min, skew-immune like
    * [[TextCuration.dedupLines]]. */
  def dedupExactKeep(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"),
        md5(lower(regexp_replace(trim(col("text")), graft.queries.Tables.Ws, " "))).as("fp"))
      .groupBy("fp")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"), col("fp"))
      .orderBy("keep_id")

  val dedupExactKeepSql: String =
    """SELECT min(doc_id) AS keep_id, count(*) AS n_copies, fp
      |FROM (SELECT doc_id,
      |        md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
      |      FROM documents)
      |GROUP BY fp ORDER BY keep_id""".stripMargin

  /** Benchmark decontamination (the GPT-3 appendix-C recipe): hold out
    * an eval split via the same auditable md5 routing as [[hashSplit]]
    * (bucket < 20), collect its distinct word 8-grams, and flag every
    * training document that shares at least one — those documents would
    * leak eval answers into training.
    *
    * Scale shape: per-doc DISTINCT collapses gram repeats map-side, the
    * eval-gram set is corpus-scaled so the overlap check is a plain
    * shuffle hash join on the gram string (never a broadcast), and the
    * per-doc counts partial-aggregate. Nothing here is quadratic. */
  def decontaminate(s: SparkSession, d: String): DataFrame = {
    val n = 8
    // r15 restructure (results pinned identical by the oracle): the old
    // shape tokenized the corpus TWICE — the eval/train bucket filters
    // push below the shared `.distinct()`, so the two branches' gram
    // subtrees stop canonicalizing equal and each re-runs the full
    // tokenize+explode — and then paid a gram join plus a separate
    // totals aggregate + doc_id join (three consumptions in all).
    // Now: per-doc `array_distinct` BEFORE the explode replaces the
    // global distinct outright (doc_id is unique, bucket is a function
    // of doc_id, so (doc_id, bucket, g) rows are distinct by
    // construction), one hash exchange on g clusters eval and train
    // occurrences of a gram together, a window-max flags every gram
    // that any eval doc carries, and ONE doc_id aggregation computes
    // n_grams and n_shared both. One tokenize pass instead of two,
    // two exchanges instead of five, zero joins (guide §2.4).
    val grams = documents(s, d)
      .select(col("doc_id"),
        TextCuration.hashBucket(col("doc_id")).as("bucket"),
        split(lower(trim(col("text"))), graft.queries.Tables.Ws).as("tk"))
      .select(col("doc_id"), col("bucket"),
        explode(array_distinct(expr(
          s"CASE WHEN size(tk) >= $n THEN transform(sequence(1, size(tk) - ${n - 1}), " +
            s"i -> concat_ws(' ', slice(tk, i, $n))) ELSE array() END"))).as("g"))
      .repartition(col("g"))
    // max over the g-partition needs no second exchange (the window's
    // required clustering is satisfied by the repartition), only a sort
    val w = org.apache.spark.sql.expressions.Window.partitionBy("g")
    grams
      .withColumn("has_eval",
        max(when(col("bucket") < 20, 1).otherwise(0)).over(w))
      .filter(col("bucket") >= 20)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"), sum(col("has_eval")).as("n_shared"))
      .filter(col("n_shared") > 0)
      .select(col("doc_id"), col("n_grams"), col("n_shared"),
        round(col("n_shared").cast("double") / col("n_grams"), 4)
          .as("overlap_frac"))
      .orderBy("doc_id")
  }

  val decontaminateSql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
      |   + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
      |   + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
      |   + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1)) % 100 AS bucket,
      |    regexp_split_to_array(lower(trim(text)), '\s+') AS arr
      |  FROM documents),
      |grams AS (
      |  SELECT DISTINCT doc_id, bucket,
      |    arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] || ' ' || arr[i+3] || ' ' ||
      |    arr[i+4] || ' ' || arr[i+5] || ' ' || arr[i+6] || ' ' || arr[i+7] AS g
      |  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(arr) - 7)) AS i)
      |  WHERE len(arr) >= 8),
      |eval_g AS (SELECT DISTINCT g FROM grams WHERE bucket < 20),
      |train AS (SELECT doc_id, g FROM grams WHERE bucket >= 20),
      |tot AS (SELECT doc_id, count(*) AS n_grams FROM train GROUP BY doc_id),
      |sh AS (SELECT t.doc_id, count(*) AS n_shared
      |       FROM train t JOIN eval_g USING (g) GROUP BY t.doc_id)
      |SELECT sh.doc_id, tot.n_grams, sh.n_shared,
      |  round(sh.n_shared / tot.n_grams, 4) AS overlap_frac
      |FROM sh JOIN tot USING (doc_id)
      |ORDER BY sh.doc_id""".stripMargin

  /** Temperature-based language rebalancing (the multilingual-corpus
    * recipe from mBERT/XLM-R: sample language l with probability
    * ∝ p_l^α, α = 0.5): per-language keep rate sqrt(n_min / n_l), so
    * the rarest language keeps everything and dominant languages are
    * square-root-downsampled. Every keep decision is the same
    * deterministic 16-bit md5 bucket as [[hashSplit]] — stable under
    * repartitioning and corpus growth — and the kept-id md5 verifies
    * each one.
    *
    * Scale shape: the rate table is one row per language (bounded, tiny)
    * so it broadcasts; the corpus is touched by exactly one groupBy on
    * lang. */
  def temperatureSample(s: SparkSession, d: String): DataFrame = {
    val b = documents(s, d).select(col("lang"), col("doc_id"),
      conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("int").as("bkt"))
    val counts = b.groupBy("lang").agg(count(lit(1)).as("n_docs"))
    val nmin = counts.agg(min("n_docs").as("n_min"))
    val rates = counts.crossJoin(broadcast(nmin))
      .withColumn("rate", sqrt(col("n_min").cast("double") / col("n_docs")))
      .withColumn("thr", floor(col("rate") * 65536).cast("int"))
      .select("lang", "n_docs", "rate", "thr")
    b.join(broadcast(rates), "lang")
      .groupBy("lang")
      .agg(first("n_docs").as("n_docs"),
        round(first("rate"), 4).as("rate"),
        sum(when(col("bkt") < col("thr"), 1L).otherwise(0L)).as("n_kept"),
        md5(coalesce(array_join(
          transform(array_sort(collect_list(when(col("bkt") < col("thr"), col("doc_id")))),
            x => x.cast("string")), ","), lit(""))).as("kept_md5"))
      .orderBy("lang")
  }

  val temperatureSampleSql: String =
    """WITH b AS (
      |  SELECT lang, doc_id,
      |    ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
      |   + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
      |   + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
      |   + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1)) AS bkt
      |  FROM documents),
      |cnt AS (SELECT lang, count(*) AS n_docs FROM b GROUP BY lang),
      |mn AS (SELECT min(n_docs) AS n_min FROM cnt),
      |r AS (SELECT lang, n_docs, sqrt(n_min / n_docs) AS rate,
      |        CAST(floor(sqrt(n_min / n_docs) * 65536) AS INT) AS thr
      |      FROM cnt CROSS JOIN mn)
      |SELECT b.lang, max(r.n_docs) AS n_docs, round(max(r.rate), 4) AS rate,
      |  CAST(sum(CASE WHEN b.bkt < r.thr THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  md5(coalesce(string_agg(CAST(b.doc_id AS VARCHAR), ',' ORDER BY b.doc_id)
      |        FILTER (WHERE b.bkt < r.thr), '')) AS kept_md5
      |FROM b JOIN r USING (lang)
      |GROUP BY b.lang ORDER BY b.lang""".stripMargin

  /** Incremental ingest dedup: an "existing corpus" (doc_id % 10 <> 0)
    * and a "new batch" (the % 10 == 0 docs, plus exact copies of some
    * corpus docs under shifted ids — the planted duplicates an ingest
    * run must catch). The operator Bloom-sketches the batch fingerprints
    * and probes them during the corpus scan (codegen'd expression), so
    * only ~|batch| candidate rows leave the corpus scan; an exact join
    * then strips Bloom false positives. The oracle replays the same
    * split with a plain semi-join — results must agree exactly for any
    * fpp. */
  def incrementalDedup(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val planted = docs.filter(col("doc_id") % 100 === 1)
      .select((col("doc_id") + lit(1000000)).as("doc_id"), col("text"))
    val batch = docs.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), col("text"))
      .unionAll(planted)
    TextCuration.incrementalDupFlags(corpus, batch, "doc_id", "text")
      .orderBy("doc_id")
  }

  val incrementalDedupSql: String =
    """WITH fps AS (
      |  SELECT doc_id, md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
      |  FROM documents),
      |corpus AS (SELECT DISTINCT fp FROM fps WHERE doc_id % 10 <> 0),
      |batch AS (
      |  SELECT doc_id, fp FROM fps WHERE doc_id % 10 = 0
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, fp FROM fps WHERE doc_id % 100 = 1)
      |SELECT b.doc_id, CAST(c.fp IS NOT NULL AS INT) AS is_dup
      |FROM batch b LEFT JOIN corpus c ON b.fp = c.fp
      |ORDER BY b.doc_id""".stripMargin

  /** DSIR-style importance weights (data selection with importance
    * resampling, hashed-n-gram variant): score every raw document by how
    * target-like its hashed-bigram distribution is. Features are word
    * bigrams hashed into 256 md5 buckets; the target set is the English
    * slice; bucket probabilities are Laplace-smoothed; a doc's weight is
    * the sum of per-bigram log p_target/p_raw. keep = (logw > 0) — "more
    * target-like than raw" — a local, shuffle-free rule (a global top-k%
    * would need a corpus-wide sort).
    *
    * Determinism: per-bigram log-ratios are rounded then summed as
    * DECIMAL, which is exact and summation-order-independent — a double
    * sum would diverge from the oracle in the last bits under Spark's
    * partition-order-dependent aggregation.
    *
    * Scale shape: one explode (linear in corpus tokens), one 256-row
    * bucket-stat aggregate (broadcasts), one groupBy(doc). */
  def dsirWeights(s: SparkSession, d: String): DataFrame =
    TextCuration.dsirWeights(documents(s, d), "doc_id", "text",
      isTarget = col("lang") === "en")
      .orderBy("doc_id")

  val dsirWeightsSql: String =
    """WITH toks AS (
      |  SELECT doc_id, lang, regexp_split_to_array(trim(text), '\s+') AS arr
      |  FROM documents),
      |bg AS (
      |  SELECT doc_id, lang, arr[i] || ' ' || arr[i+1] AS bg,
      |    (strpos('0123456789abcdef', substr(md5(arr[i] || ' ' || arr[i+1]), 1, 1)) - 1) * 16
      |  + (strpos('0123456789abcdef', substr(md5(arr[i] || ' ' || arr[i+1]), 2, 1)) - 1) AS b
      |  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(arr) - 1)) AS i) g
      |  WHERE len(arr) >= 2),
      |tot AS (SELECT count(*) AS n_r,
      |               sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS n_t FROM bg),
      |stats AS (
      |  SELECT b, count(*) AS n_r,
      |         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS n_t
      |  FROM bg GROUP BY b),
      |ratios AS (
      |  SELECT b, CAST(round(
      |      ln((stats.n_t + 1) / (tot.n_t + 256.0)) -
      |      ln((stats.n_r + 1) / (tot.n_r + 256.0)), 6) AS DECIMAL(18,6)) AS lr
      |  FROM stats, tot)
      |SELECT doc_id, count(*) AS n_bigrams,
      |       CAST(round(sum(lr), 4) AS DOUBLE) AS logw,
      |       CAST(sum(lr) > 0 AS INT) AS keep
      |FROM bg JOIN ratios USING (b)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** GPT-style sequence packing over the corpus's whitespace token
    * counts ([[TextCuration.packSequences]]): 8 hash shards, 512-token
    * sequences — where every document lands in the training stream
    * (first/last sequence, offset, span). The same running-sum layout a
    * pretraining loader derives when it concatenates shard text and
    * chunks every 512 tokens. */
  def packSequences(s: SparkSession, d: String): DataFrame = {
    val withTok = documents(s, d)
      .select(col("doc_id"),
        when(length(trim(col("text"))) === 0, 0)
          .otherwise(size(split(trim(col("text")), graft.queries.Tables.Ws))).as("n_tok"))
    TextCuration.packSequences(withTok, "doc_id", "n_tok",
        seqLen = 512, nShards = 8)
      .orderBy("doc_id")
  }

  val packSequencesSql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    CASE WHEN length(trim(text)) = 0 THEN 0
      |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tok,
      |   ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
      |  + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
      |  + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
      |  + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1)) % 8 AS shard
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, shard, CAST(n_tok AS BIGINT) AS n_tok,
      |    CAST(sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |  FROM t WHERE n_tok > 0)
      |SELECT doc_id, shard, n_tok,
      |  (cum - n_tok) // 512 AS seq_first,
      |  (cum - 1) // 512 AS seq_last,
      |  (cum - n_tok) % 512 AS "offset",
      |  (cum - 1) // 512 - (cum - n_tok) // 512 + 1 AS n_seqs
      |FROM c ORDER BY doc_id""".stripMargin

  /** Mixture rebalancing over `source` ([[TextCuration.mixtureEpochs]]):
    * src0 upsampled to 2.5 epochs, src3 downsampled to 0.25, src7
    * dropped, everything else 1 epoch. Constants rendered into both
    * engines so the deterministic fractional-epoch selection can never
    * drift. */
  def mixtureEpochs(s: SparkSession, d: String): DataFrame =
    TextCuration.mixtureEpochs(documents(s, d), "doc_id", "source",
        Map("src0" -> 2.5, "src3" -> 0.25, "src7" -> 0.0))
      .orderBy("doc_id")

  val mixtureEpochsSql: String =
    """WITH e AS (
      |  SELECT doc_id, source,
      |    CASE source WHEN 'src0' THEN 2.5 WHEN 'src3' THEN 0.25
      |                WHEN 'src7' THEN 0.0 ELSE 1.0 END AS epochs,
      |   ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
      |  + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
      |  + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
      |  + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1)) AS b
      |  FROM documents)
      |SELECT doc_id, source, epochs,
      |  CAST(floor(epochs) +
      |       CASE WHEN b < round((epochs - floor(epochs)) * 65536)
      |            THEN 1 ELSE 0 END AS BIGINT) AS n_repeats
      |FROM e ORDER BY doc_id""".stripMargin

  /** Deterministic shuffle + 64-row shard assignment
    * ([[TextCuration.shardAssign]]): the training-order serialization
    * step. The DuckDB oracle replays the same md5 permutation with a
    * window; the Spark side deliberately does NOT use a global window
    * (range-sort + partition-offset indexing instead — see the operator
    * scaladoc for the 100 TB reasoning). */
  def shardAssign(s: SparkSession, d: String): DataFrame =
    TextCuration.shardAssign(documents(s, d), "doc_id", 64L)
      .orderBy("doc_id")

  val shardAssignSql: String =
    """WITH r AS (
      |  SELECT doc_id,
      |    row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1 AS pos
      |  FROM documents)
      |SELECT doc_id, pos // 64 AS shard, pos % 64 AS pos_in_shard
      |FROM r ORDER BY doc_id""".stripMargin

  /** Vocabulary-coverage evaluation: train a top-1000 frequency vocab
    * on the corpus (ties break lexicographically), then score every
    * document by its out-of-vocabulary token fraction — the standard
    * "will my tokenizer/vocab cover this data" audit, and a cheap
    * domain-shift detector between corpus snapshots.
    *
    * Scale shape: the word-count aggregate is map-side combinable and
    * vocab-sized; the top-1000 is a TakeOrdered (never a global sort);
    * the 1000-row vocab BROADCASTS back onto the exploded tokens (the
    * corpus side never shuffles for the join), and the per-doc re-agg
    * partially combines before its shuffle since a doc's tokens stay
    * in the partition that exploded them. */
  def oovRate(s: SparkSession, d: String): DataFrame = {
    val tok = documents(s, d)
      .select(col("doc_id"),
        explode(split(trim(col("text")), graft.queries.Tables.Ws)).as("w0"))
      .select(col("doc_id"), lower(col("w0")).as("w"))
    val vocab = tok.groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(1000)
      .select(col("w"), lit(1).as("in_vocab"))
    tok.join(broadcast(vocab), Seq("w"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("doc_id"), col("n_tok"), col("n_oov"),
        round(col("n_oov").cast("double") / col("n_tok"), 4).as("oov_ratio"))
      .orderBy("doc_id")
  }

  val oovRateSql: String =
    """WITH tok AS (
      |  SELECT doc_id, lower(arr[i]) AS w
      |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS arr
      |        FROM documents),
      |       LATERAL (SELECT unnest(generate_series(1, len(arr))) AS i)),
      |vocab AS (
      |  SELECT w FROM (SELECT w, count(*) AS c FROM tok GROUP BY w)
      |  ORDER BY c DESC, w LIMIT 1000)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
      |  CAST(sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
      |  round(sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) / count(*), 4) AS oov_ratio
      |FROM tok t LEFT JOIN vocab v USING (w)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Exact-N deterministic uniform sample: rank every document by the
    * md5 of its id and keep the first 100 — the "give me exactly N
    * random-but-reproducible docs from the corpus" primitive
    * ([[hashSplit]] gives a fraction, [[stratifiedSample]] a per-group
    * rate; neither an exact count).
    *
    * Scale shape: a TakeOrdered top-N (per-partition heaps + driver
    * merge of N·partitions candidates) — the corpus is never globally
    * sorted and nothing but the winners leaves an executor. */
  def fixedNSample(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"),
        md5(concat(lit("fixn:"), col("doc_id"))).as("samp_key"))
      .orderBy("samp_key")
      .limit(100)

  val fixedNSampleSql: String =
    """SELECT doc_id, md5('fixn:' || doc_id) AS samp_key
      |FROM documents ORDER BY samp_key LIMIT 100""".stripMargin

  /** Exact-N WEIGHTED sample without replacement (Efraimidis–Spirakis,
    * IPL 2006): doc i gets key ln(uᵢ)/wᵢ with uᵢ ∈ (0,1) uniform and
    * wᵢ = its length in chars; the N largest keys are a weighted sample
    * without replacement (longer docs proportionally likelier, every doc
    * still possible). Completes the sampling suite: [[fixedNSample]] is
    * the unweighted exact-N, [[temperatureSample]] reweights sources,
    * this one reweights individual rows.
    *
    * Determinism: uᵢ is the first 48 bits of md5("wt:"+doc_id) — no RNG,
    * stable under repartition/re-run, replayable in the oracle (DuckDB
    * casts the same hex prefix via '0x…'). The key is ONE ln() per row
    * on identical doubles; engines could in principle differ by an ulp
    * in ln, but a selection flip needs two keys within that ulp —
    * vanishing, and the rounded output column never shows it.
    *
    * Scale shape: a pure projection then TakeOrdered top-N — per-
    * partition heaps, only N·partitions candidate rows reach the driver,
    * the corpus is never sorted or shuffled. */
  def weightedSample(s: SparkSession, d: String): DataFrame = {
    val h = conv(substring(md5(concat(lit("wt:"), col("doc_id"))), 1, 12),
      16, 10).cast("double")
    val u = (h + lit(0.5)) / lit(281474976710656.0)
    val w = greatest(col("n_chars"), lit(1L)).cast("double")
    documents(s, d)
      .select(col("doc_id"), col("n_chars"), (log(u) / w).as("k"))
      .orderBy(col("k").desc, col("doc_id"))
      .limit(100)
      .select(col("doc_id"), col("n_chars"), round(col("k") * 1e6, 4).as("key_ppm"))
  }

  val weightedSampleSql: String =
    """WITH k AS (
      |  SELECT doc_id, n_chars,
      |    ln((CAST(concat('0x', substr(md5('wt:' || doc_id), 1, 12)) AS BIGINT)
      |          + 0.5) / 281474976710656.0)
      |      / CAST(greatest(n_chars, 1) AS DOUBLE) AS k
      |  FROM documents)
      |SELECT doc_id, n_chars, round(k * 1e6, 4) AS key_ppm
      |FROM k ORDER BY k DESC, doc_id LIMIT 100""".stripMargin

  /** Percentile-rank normalization of the per-doc quality score (alpha
    * ratio) via a broadcast ECDF: every document gets "what fraction of
    * the corpus is at or below my quality bin" — the curriculum/
    * filtering signal usually computed with `cume_dist()`.
    *
    * Scale shape: `cume_dist` needs a GLOBAL sort of the corpus; here
    * quality lives in [0,1] so a fixed 1,000-bin histogram (one
    * map-side-combinable aggregate) plus a cumulative window over the
    * ≤ 1,000-row BIN TABLE — bin-table-sized, not corpus-sized —
    * yields an ECDF that broadcasts back onto the scan. Resolution is
    * one bin (1e-3 of quality), the estimator is deterministic, and the
    * oracle replays the identical histogram, so the gate is an exact
    * hash match. Docs with empty text (null quality) pass through with
    * null percentile, like the window formulation would emit. */
  def qualityPercentile(s: SparkSession, d: String): DataFrame = {
    // empty text → null q, NOT 0/0: Spark 4 defaults ANSI on, so an
    // unguarded divide throws DIVIDE_BY_ZERO on the first empty document;
    // the guard also makes the docstring's null-quality passthrough real
    val docs = documents(s, d)
      .select(col("doc_id"),
        when(length(col("text")) > 0,
          length(regexp_replace(col("text"), "[^a-zA-Z]", ""))
            .cast("double") / length(col("text"))).as("q"))
      .withColumn("bin",
        when(col("q").isNotNull, least(floor(col("q") * 1000), lit(999L))))
    val hist = docs.where(col("bin").isNotNull)
      .groupBy("bin").agg(count(lit(1)).as("c"))
    val w = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ecdf = hist
      .withColumn("cum", sum("c").over(w))
      .crossJoin(broadcast(hist.agg(sum("c").as("n"))))
      .select(col("bin"), (col("cum") / col("n")).as("pct"))
    docs.join(broadcast(ecdf), Seq("bin"), "left")
      .select(col("doc_id"), (floor(col("q") * 1e4) / 1e4).as("q"),
        (floor(col("pct") * 1e4) / 1e4).as("pct"))
      .orderBy("doc_id")
  }

  val qualityPercentileSql: String =
    """WITH docs AS (
      |  SELECT doc_id,
      |    CASE WHEN length(text) > 0
      |         THEN length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
      |              / length(text) END AS q
      |  FROM documents),
      |b AS (
      |  SELECT doc_id, q,
      |    CASE WHEN q IS NOT NULL
      |         THEN least(CAST(floor(q * 1000) AS BIGINT), 999) END AS bin
      |  FROM docs),
      |hist AS (
      |  SELECT bin, count(*) AS c FROM b WHERE bin IS NOT NULL GROUP BY 1),
      |ecdf AS (
      |  SELECT bin,
      |    CAST(sum(c) OVER (ORDER BY bin
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |      / (SELECT CAST(sum(c) AS DOUBLE) FROM hist) AS pct
      |  FROM hist)
      |SELECT doc_id, floor(q * 1e4) / 1e4 AS q,
      |       floor(pct * 1e4) / 1e4 AS pct
      |FROM b LEFT JOIN ecdf USING (bin)
      |ORDER BY doc_id""".stripMargin

  val all: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "quality_percentile" -> (qualityPercentile _, qualityPercentileSql),
    "sample_weighted" -> (weightedSample _, weightedSampleSql),
    "text_oov_rate" -> (oovRate _, oovRateSql),
    "sample_fixed_n" -> (fixedNSample _, fixedNSampleSql),
    "sample_shard_assign" -> (shardAssign _, shardAssignSql),
    "sample_mixture_epochs" -> (mixtureEpochs _, mixtureEpochsSql),
    "sample_pack_sequences" -> (packSequences _, packSequencesSql),
    "text_gopher_filters" -> (gopherFilters _, gopherFiltersSql),
    "text_pii_redact" -> (piiRedact _, piiRedactSql),
    "sample_hash_split" -> (hashSplit _, hashSplitSql),
    "dedup_lines" -> (dedupLines _, dedupLinesSql),
    "text_repetition_stats" -> (repetitionStats _, repetitionStatsSql),
    "sample_stratified" -> (stratifiedSample _, stratifiedSampleSql),
    "sample_topk_per_group" -> (topkPerGroup _, topkPerGroupSql),
    "text_unigram_logprob" -> (unigramLogprob _, unigramLogprobSql),
    "text_bigram_logprob" -> (bigramLogprob _, bigramLogprobSql),
    "text_tfidf_topk" -> (tfidfTopk _, tfidfTopkSql),
    "text_boilerplate_flags" -> (boilerplateFlags _, boilerplateFlagsSql),
    "dedup_exact_keep" -> (dedupExactKeep _, dedupExactKeepSql),
    "text_decontaminate" -> (decontaminate _, decontaminateSql),
    "sample_temperature" -> (temperatureSample _, temperatureSampleSql),
    "dedup_incremental" -> (incrementalDedup _, incrementalDedupSql),
    "sample_dsir" -> (dsirWeights _, dsirWeightsSql),
  )
}
