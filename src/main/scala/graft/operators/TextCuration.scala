package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a training-data pipeline runs between raw
  * ingest and tokenization: global line-level deduplication (the C4
  * preprocessing step), deterministic hash-based split assignment, and
  * PII redaction. All are expressed with codegen'd built-ins — the only
  * shuffles are the ones the semantics force (the global line window and
  * the per-doc rebuild), and nothing ever collects to the driver, so each
  * operator scales to corpora far beyond one machine.
  */
object TextCuration {

  /** Pairwise cross-source content overlap: for every pair of values of
    * `srcCol`, how many distinct normalized-content fingerprints both
    * contain, and the exact Jaccard of the two fingerprint sets — the
    * corpus-merge question ("how much of source B is already in A?")
    * answered before committing to a full dedup of the union.
    *
    * Scale shape: only (source, 16-byte fp) rows ever shuffle. The
    * distinct lands behind an explicit fp-hash repartition so all
    * consumers below (the per-source counts and both self-join sides)
    * share one scan+distinct via ReuseExchange, and the join sides
    * arrive already partitioned by the join key. Per-source totals
    * (|sources| rows) broadcast onto pair counts bounded by the true
    * overlap; the source-pair space is |sources|² driver-trivial rows.
    *
    * The self-join renames each side through `toDF` BEFORE joining:
    * joining two aliases of the same plan with `col("a.fp")` resolves
    * both to one attribute, the condition folds to a constant, and
    * empty-relation propagation silently deletes the whole join — the
    * renamed projections give the sides distinct attribute ids.
    */
  def sourceOverlap(df: DataFrame, srcCol: String, textCol: String): DataFrame = {
    val h = df
      .select(col(srcCol).as("src"),
        md5(lower(regexp_replace(trim(col(textCol)), graft.queries.Tables.Ws, " "))).as("fp"))
      .distinct()
      .repartition(col("fp"))
    val counts = h.groupBy("src").agg(count(lit(1)).as("n"))
    val inter = h.toDF("src_a", "fp").join(h.toDF("src_b", "fp"), Seq("fp"))
      .where(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("n_shared"))
    counts.toDF("src_a", "n_a")
      .join(counts.toDF("src_b", "n_b"), col("src_a") < col("src_b"))
      .join(inter, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        round(coalesce(col("n_shared"), lit(0L)) /
          (col("n_a") + col("n_b") - coalesce(col("n_shared"), lit(0L))), 6)
          .as("jaccard"))
      .orderBy("src_a", "src_b")
  }

  /** Global line-level dedup (the C4 rule: a line that appears more than
    * once in the corpus is kept only at its first occurrence). "First" is
    * the minimal (id, position) pair, a deterministic total order; blank
    * lines carry no content and are always kept.
    *
    * Scale shape: one explode (linear), one shuffle on the line text for
    * the first-occurrence window, one shuffle on id for the rebuild.
    * Only (id, pos, line) rows cross the wire — never whole documents —
    * and the skew magnet (the empty line, duplicated corpus-wide) is
    * exempted from the window by the always-keep rule.
    *
    * @param sepRegex regex that splits `textCol` into lines
    * @param joinSep  literal separator used to rebuild the kept text
    * @return one row per input row: (idCol, n_lines, n_kept, rebuilt)
    */
  def dedupLines(df: DataFrame, idCol: String, textCol: String,
      sepRegex: String = "\n", joinSep: String = "\n"): DataFrame = {
    val lines = df.select(col(idCol).as("__id"),
      posexplode(split(col(textCol), sepRegex)).as(Seq("__pos", "__line")))
    val blank = trim(col("__line")) === ""
    // first occurrence via groupBy-min, NOT a row_number window: the agg
    // gets map-side partial aggregation, so a line duplicated a billion
    // times reduces to one row per map task before the shuffle — a
    // window would ship every copy of a hot line to a single task. The
    // join back is a 1:1 enrich AQE can skew-split. Blank lines carry no
    // content and skip the machinery entirely (always kept).
    val nonBlank = lines.filter(!blank)
    val firsts = nonBlank.groupBy("__line")
      .agg(min(struct(col("__id"), col("__pos"))).as("__first"))
    val kept = nonBlank.join(firsts, "__line")
      .filter(struct(col("__id"), col("__pos")) === col("__first"))
      .select("__id", "__pos", "__line")
      .unionByName(lines.filter(blank))
    val rebuilt = kept.groupBy("__id").agg(
      count(lit(1)).as("n_kept"),
      array_join(
        transform(array_sort(collect_list(struct(col("__pos"), col("__line")))),
          x => x.getField("__line")),
        joinSep).as("rebuilt"))
    val totals = lines.groupBy("__id").agg(count(lit(1)).as("n_lines"))
    df.select(col(idCol))
      .join(totals, col(idCol) === totals("__id"), "left").drop("__id")
      .join(rebuilt, col(idCol) === rebuilt("__id"), "left").drop("__id")
      .select(col(idCol), coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("rebuilt"), lit("")).as("rebuilt"))
  }

  /** Deterministic train/val/test assignment from a hash of the id —
    * stable under repartitioning, shuffling, and incremental corpus
    * growth, unlike anything based on row order or rand(). The bucket
    * decodes the first 4 md5 hex digits to a uniform 16-bit value, mod
    * 100 — replayable by any engine with md5 + string ops, which is what
    * makes the routing auditable. (Two ascii() chars would be biased:
    * 256 non-uniform combos over 100 buckets skews splits by several
    * percent; 65536 uniform values keep every bucket within 0.1%.)
    */
  /** Incremental exact dedup: flag which documents of a NEW ingest batch
    * already exist (by normalized-content fingerprint) in an existing
    * corpus, without shuffling the corpus.
    *
    * Scale shape: the batch is the small side by definition, so its
    * fingerprints are sketched into a Bloom filter on the driver and
    * probed while SCANNING the corpus ([[graft.functions.BloomMightContain]],
    * codegen'd) — the corpus contributes only ~|batch|·(1+fpp) candidate
    * rows to the one small shuffle. The exact join on the survivors
    * removes Bloom false positives, so the output is exact for any fpp.
    * This is the membership analog of Spark's runtime bloom-filter join
    * rewrite, available to arbitrary plan shapes.
    *
    * @return one row per batch document: (idCol, is_dup 0/1)
    */
  def incrementalDupFlags(corpus: DataFrame, batch: DataFrame,
      idCol: String, textCol: String, fpp: Double = 0.01): DataFrame = {
    def fp(c: Column) = md5(lower(regexp_replace(trim(c), graft.queries.Tables.Ws, " ")))
    val batchFp = batch.select(col(idCol), fp(col(textCol)).as("__fp"))
    val n = math.max(batchFp.count(), 1L)
    val bloom = batchFp.stat.bloomFilter("__fp", n, fpp)
    val candidates = corpus
      .select(fp(col(textCol)).as("__fp"))
      .filter(graft.functions.BloomMightContain(col("__fp"), bloom))
      .distinct()
      .withColumn("__hit", lit(1))
    batchFp.join(candidates, Seq("__fp"), "left")
      .select(col(idCol), col("__hit").isNotNull.cast("int").as("is_dup"))
  }

  /** DSIR-style importance weights (hashed-bigram variant): score each
    * document by how target-like its hashed-bigram distribution is —
    * sum over bigrams of log p_target(bucket)/p_raw(bucket), Laplace-
    * smoothed over `buckets` md5 buckets. Per-bigram ratios are rounded
    * then summed as DECIMAL (exact, summation-order-independent).
    *
    * Scale shape: the bigram features never become rows — the one-pass
    * [[graft.functions.HashedBigramHistogram]] expression folds each doc
    * into a `buckets`-long histogram inside the scan, so the only
    * corpus-sized work is two scans (bucket totals, then scoring) with
    * nothing gram-sized shuffled, cached, or retained. Bucket totals
    * (≤ 256 rows) are collected; the per-bucket log-ratios are computed
    * with the SAME Spark expressions on a driver-local frame (bit-exact
    * vs the exploded formulation) and scoring is an exact DECIMAL dot
    * product of histogram × ratios.
    *
    * @param isTarget boolean column marking the target-distribution docs
    * @return (idCol, n_bigrams, logw, keep) — keep = logw > 0
    */
  def dsirWeights(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 256): DataFrame = {
    require(buckets >= 2 && buckets <= 256, "dsirWeights: 2..256 buckets")
    val spark = df.sparkSession
    val docs = df.select(col(idCol), isTarget.cast("long").as("__t"),
      graft.functions.HashedBigramHistogram(
        split(trim(col(textCol)), graft.queries.Tables.Ws), buckets).as("__h"))
    // bucket totals: posexplode the histograms (`buckets` short rows per
    // doc, no text) and collect — n_r/n_t per bucket, totals derived
    val statRows = docs
      .select(col("__t"), posexplode(col("__h")).as(Seq("__b", "__c")))
      .groupBy("__b")
      .agg(sum("__c").as("n_r"), sum(col("__c") * col("__t")).as("n_t"))
      .collect()
    val totR = statRows.map(_.getLong(1)).sum
    val totT = statRows.map(_.getLong(2)).sum
    val stats = spark.createDataFrame(
      java.util.Arrays.asList(statRows: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__b",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("n_r",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("n_t",
          org.apache.spark.sql.types.LongType))))
    val lrByBucket: Array[java.math.BigDecimal] = {
      val rows = stats.select(col("__b"),
        round(
          log((col("n_t") + 1).cast("double") / (totT + buckets).toDouble) -
            log((col("n_r") + 1).cast("double") / (totR + buckets).toDouble), 6)
          .cast("decimal(18,6)").as("lr"))
        .collect()
      val arr = new Array[java.math.BigDecimal](buckets)
      rows.foreach(r => arr(r.getInt(0)) = r.getDecimal(1))
      arr
    }
    val lrArr = array(lrByBucket.toIndexedSeq.map(bd =>
      lit(bd).cast("decimal(18,6)")): _*)
    docs
      .withColumn("n_bigrams",
        aggregate(col("__h"), lit(0L), (a, x) => a + x))
      .filter(col("n_bigrams") > 0)
      .withColumn("__lw",
        aggregate(zip_with(col("__h"), lrArr, (c, l) => c * l),
          lit(java.math.BigDecimal.ZERO).cast("decimal(38,6)"),
          (a, x) => a + x))
      .select(col(idCol), col("n_bigrams"),
        round(col("__lw"), 4).cast("double").as("logw"),
        (col("__lw") > 0).cast("int").as("keep"))
  }

  def hashSplit(idCol: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    val bucket = hashBucket(idCol)
    when(bucket < trainPct, "train")
      .when(bucket < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Uniform hash bucket (0..99) backing [[hashSplit]], exposed for
    * stratified reporting. */
  def hashBucket(idCol: Column): Column =
    conv(substring(md5(idCol.cast("string")), 1, 4), 16, 10).cast("int") % 100

  /** Mixture rebalancing by explicit per-group epoch targets — the
    * "2.5 epochs of wiki, 0.3 of crawl" knob of a pretraining data mix.
    * Every document gets a deterministic repeat count: `floor(e)` full
    * epochs plus one more for the md5-selected `frac(e)` fraction of its
    * group (16-bit bucket, so the realized mixture converges to the
    * target at corpus scale and is exactly reproducible under
    * repartitioning and corpus growth). `e = 0` drops the group,
    * `0 < e < 1` downsamples, `e > 1` upsamples. Pure per-row
    * expressions: no shuffle, pushes into any scan; materialize repeats
    * with `explode(sequence(1, n_repeats))` when the loader needs
    * physical rows.
    */
  def mixtureEpochs(df: DataFrame, idCol: String, groupCol: String,
      epochs: Map[String, Double], defaultEpochs: Double = 1.0): DataFrame = {
    require(epochs.values.forall(_ >= 0) && defaultEpochs >= 0,
      "mixtureEpochs: epoch targets must be >= 0")
    val e = epochs.foldLeft(lit(defaultEpochs)) { case (acc, (g, v)) =>
      when(col(groupCol) === g, lit(v)).otherwise(acc)
    }
    val bucket16 = conv(substring(md5(col(idCol).cast("string")), 1, 4), 16, 10)
      .cast("int")
    df.select(col(idCol), col(groupCol), e.as("epochs"),
        bucket16.as("__b"))
      .withColumn("n_repeats",
        (floor(col("epochs")) +
          when(col("__b") < round((col("epochs") - floor(col("epochs"))) * 65536),
            1).otherwise(0)).cast("long"))
      .drop("__b")
  }

  /** GPT-style sequence packing (concatenate-then-chunk): every document
    * is laid into fixed-`seqLen`-token training sequences in deterministic
    * order, documents splitting across sequence boundaries exactly as a
    * pretraining data loader would split them. Returns, per document, the
    * shard it packs into, its first/last sequence index within the shard,
    * its token offset inside the first sequence, and how many sequences
    * it spans.
    *
    * Scale shape: one shuffle on the hash shard, then a per-shard running
    * sum (window). Shard count bounds both the sort size and the
    * parallelism — at corpus scale pick shards ≈ a few × cores so each
    * shard's (id-ordered) prefix sum stays partition-local; packing is
    * embarrassingly parallel ACROSS shards by construction, and the
    * md5 shard assignment is stable under corpus growth, so incremental
    * batches repack only their own tokens.
    *
    * @param nTokCol token count per document (must be >= 1; zero-token
    *                docs have nothing to pack and are dropped)
    */
  def packSequences(df: DataFrame, idCol: String, nTokCol: String,
      seqLen: Int, nShards: Int): DataFrame = {
    require(seqLen >= 1 && nShards >= 1, "packSequences: seqLen/nShards >= 1")
    val shard = (conv(substring(md5(col(idCol).cast("string")), 1, 4), 16, 10)
      .cast("int") % nShards).as("shard")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(idCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.select(col(idCol), shard, col(nTokCol).cast("long").as("n_tok"))
      .filter(col("n_tok") > 0)
      .withColumn("cum", sum("n_tok").over(w))
      .select(col(idCol), col("shard"), col("n_tok"),
        expr(s"(cum - n_tok) div $seqLen").as("seq_first"),
        expr(s"(cum - 1) div $seqLen").as("seq_last"),
        expr(s"(cum - n_tok) % $seqLen").as("offset"))
      .withColumn("n_seqs", col("seq_last") - col("seq_first") + 1)
  }

  /** Deterministic global shuffle + fixed-size shard assignment — the
    * "shuffle and shard" step that serializes a curated corpus into
    * training order. The permutation is md5(id) (tiebreak: id), so it is
    * seedable-by-convention and replayable by any engine; positions are
    * global, shards are exactly `shardSize` rows (last shard ragged).
    *
    * Scale shape: the sort is a range-partitioned exchange (Spark
    * samples boundaries; no single-partition window — `row_number()
    * OVER (ORDER BY …)` would funnel the corpus through one task), and
    * the global index comes from `zipWithIndex`'s per-partition offsets
    * (one extra count-only job). Assignment stays fully parallel at any
    * corpus size.
    *
    * @return (idCol, shard, pos_in_shard)
    */
  def shardAssign(df: DataFrame, idCol: String, shardSize: Long): DataFrame = {
    require(shardSize >= 1, "shardAssign: shardSize >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val sorted = df
      .select(col(idCol).cast("long").as("id"),
        md5(col(idCol).cast("string")).as("h"))
      .orderBy("h", "id")
    sorted.select("id").as[Long].rdd
      .zipWithIndex()
      .map { case (id, pos) => (id, pos / shardSize, pos % shardSize) }
      .toDF(idCol, "shard", "pos_in_shard")
  }

  // PII patterns restricted to syntax both java.util.regex and RE2
  // accept (no backrefs, no lookaround), so the redaction a pipeline
  // applies is exactly replayable by RE2-based engines for audit.
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\d{3}-\\d{3}-\\d{4}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Counts of PII matches per category for `textCol`. */
  def piiCounts(textCol: Column): (Column, Column, Column) = (
    size(regexp_extract_all(textCol, lit(EmailRe), lit(0))),
    size(regexp_extract_all(textCol, lit(PhoneRe), lit(0))),
    size(regexp_extract_all(textCol, lit(Ipv4Re), lit(0))))

  /** Redact emails, then phones, then IPv4 literals (application order
    * matters: an email can contain digits a later pattern would split). */
  def redactPii(textCol: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(textCol, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      Ipv4Re, "<IP>")
}
