package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer: merge-table training over the corpus
  * and a codegen'd encoder applying the learned merges — the real
  * version of the BPE-ish token-count estimate in `text_token_counts`
  * (reference scope: the reference ships no tokenizer; this is part of
  * the training-data-pipeline layer).
  *
  * Training is the classic Sennrich algorithm over the word-frequency
  * table, which is corpus-DISTINCT-sized, not corpus-sized: one linear
  * scan builds (word, freq), and every merge round after that touches
  * only distinct words. Scale shape per round: adjacent symbol pairs
  * are generated inside the projection (transform over the split symbol
  * string — nothing gram-sized is materialized), summed with map-side
  * partial aggregation, and only the single argmax pair is collected.
  * The merge itself is a pure `regexp_replace` on the separator-joined
  * symbol string — whole-stage codegen, no custom expression, and the
  * sentinel-separator pattern with a lookahead reproduces BPE's
  * left-to-right non-overlapping merge order exactly.
  *
  * Cost-based dispatch mirrors [[Kmeans.fit]]: a driver-sized
  * vocabulary (≤ `localVocabLimit` distinct words) trains in-memory in
  * one collect; larger vocabularies run the distributed rounds with
  * per-round cache/unpersist (the [[Graph]] iteration pattern) so
  * lineage stays shallow and nothing leaks. Both paths implement the
  * same deterministic tie-break (max count, then lexicographically
  * smallest pair) and are pinned equal by BpeSpec.
  *
  * Determinism caveat: symbols are code points of the word text as-is
  * (no case folding); words containing the U+0001 separator sentinel
  * are dropped from TRAINING (they cannot be represented) but encode
  * fine.
  */
object Bpe {

  private val SEP = "\u0001"

  /** One learned merge: rank r merges (left, right) into left+right. */
  final case class Merge(rank: Int, left: String, right: String)

  /** Learn up to `numMerges` merges from `textCol` of `docs`.
    *
    * @param minPairFreq stop when no pair reaches this weighted count
    * @param localVocabLimit distinct-word count at or below which the
    *        driver-local path runs (the vocabulary is then at most a few
    *        MB — same trade as Kmeans.fit's local fit)
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
      minPairFreq: Long = 2L, localVocabLimit: Long = 200000L): Seq[Merge] = {
    val spark = docs.sparkSession
    val words = docs
      .select(explode(split(trim(col(textCol)), graft.queries.Tables.Ws)).as("w"))
      .where(col("w") =!= "" && !col("w").contains(SEP))
      .groupBy("w").agg(count(lit(1)).as("freq"))
    val vocabSize = words.count()
    if (vocabSize == 0) return Seq.empty
    if (vocabSize <= localVocabLimit) {
      val local = words.collect().map(r => (r.getString(0), r.getLong(1)))
      trainLocal(local, numMerges, minPairFreq)
    } else trainDistributed(spark, words, numMerges, minPairFreq)
  }

  /** Driver-local training for driver-sized vocabularies. */
  private[operators] def trainLocal(vocab: Array[(String, Long)],
      numMerges: Int, minPairFreq: Long): Seq[Merge] = {
    // split by CODE POINT (not char) to match the distributed path's
    // regex `.`, which matches a full code point
    var syms: Array[(Array[String], Long)] = vocab.map { case (w, f) =>
      val b = Array.newBuilder[String]
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        b += new String(Character.toChars(cp)); i += Character.charCount(cp)
      }
      (b.result(), f)
    }
    val merges = Seq.newBuilder[Merge]
    var r = 0
    var continue = true
    while (r < numMerges && continue) {
      val counts = new java.util.HashMap[(String, String), Long]()
      syms.foreach { case (s, f) =>
        var i = 0
        while (i < s.length - 1) {
          val k = (s(i), s(i + 1))
          counts.put(k, counts.getOrDefault(k, 0L) + f)
          i += 1
        }
      }
      var best: (String, String) = null
      var bestN = minPairFreq - 1
      counts.forEach { (k, n) =>
        if (n > bestN || (n == bestN && best != null &&
            (k._1 < best._1 || (k._1 == best._1 && k._2 < best._2)))) {
          best = k; bestN = n
        }
      }
      if (best == null) continue = false
      else {
        merges += Merge(r, best._1, best._2)
        val joined = best._1 + best._2
        syms = syms.map { case (s, f) =>
          if (s.length < 2) (s, f)
          else {
            val out = Array.newBuilder[String]
            var i = 0
            while (i < s.length) {
              if (i < s.length - 1 && s(i) == best._1 && s(i + 1) == best._2) {
                out += joined; i += 2
              } else { out += s(i); i += 1 }
            }
            (out.result(), f)
          }
        }
        r += 1
      }
    }
    merges.result()
  }

  /** Distributed training rounds over the word-frequency frame.
    *
    * Cost model / intended regime: ONE Spark job per merge round (the
    * argmax collect doubles as the materialization of that round's
    * cached frame — there is no separate count). At local-scheduler
    * latencies that is ~0.1 s of fixed cost per merge, so a 32k-merge
    * production vocabulary costs ~1 h of driver round-trips regardless
    * of cluster size — acceptable as a one-off tokenizer-training job,
    * but the local path (vocabularies ≤ `localVocabLimit` distinct
    * words, the common case even for multi-TB corpora after the word
    * de-dup) is the intended fast path: it collects the word table once
    * and runs every round in driver memory. Use the distributed path
    * only when the distinct-word table itself exceeds driver memory
    * (web-scale corpora with unbounded token diversity).
    *
    * Iteration plumbing (all three are load-bearing; DevBpeScale is the
    * repro that found each limit):
    *  - every round's frame is re-rooted on its execution RDD
    *    ([[org.apache.spark.sql.GraftColumnBridge.rerootOnRdd]]):
    *    chained round frames embed the previous round's
    *    InMemoryRelation in every plan, and IMR tree printing
    *    (duplicated per level under AQE) grows explain strings
    *    geometrically — the driver OOMs near 300 chained rounds.
    *    Leaf-plan frames keep per-round planning O(1).
    *  - every 24 rounds the frame is reliably checkpointed: task
    *    serialization walks the RDD graph recursively, and an unbounded
    *    round-over-round RDD chain StackOverflows the scheduler near
    *    ~200 rounds. Checkpointing truncates the graph (GraphX-style
    *    periodic checkpoint). A checkpoint dir is defaulted under
    *    java.io.tmpdir when the session has none — set a durable one
    *    (HDFS/S3) on a real cluster.
    *  - each round's frame is persisted and the parent released one
    *    round later, so a lost block recomputes at most one frame back
    *    (to the previous cache or checkpoint).
    */
  private def trainDistributed(spark: SparkSession, words: DataFrame,
      numMerges: Int, minPairFreq: Long): Seq[Merge] = {
    import org.apache.spark.storage.StorageLevel
    // sentinel-wrapped separator-joined symbols: |c|a|t|
    var cur = words.select(
      concat(lit(SEP), regexp_replace(col("w"), "(?s)(.)", "$1" + SEP)).as("syms"),
      col("freq"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // parent frame of `cur`, kept cached until `cur` itself materializes
    // (inside the next argmax job) so each round's merge projection
    // reads the parent's cache, never replayed lineage
    var prev: DataFrame = null
    val merges = Seq.newBuilder[Merge]
    var r = 0
    var continue = true
    while (r < numMerges && continue) {
      // adjacent pairs from the split symbol string, generated in the
      // projection; map-side combine reduces the pair stream before the
      // shuffle. The split of |c|a|t| yields ["","c","a","t",""], so
      // symbols sit at 0-based indices 1..size-2 and pairs need
      // size >= 4 (>= 2 symbols) — the where-guard matters because
      // sequence(2, 1) would DESCEND and index out of bounds
      val best = cur.select(col("freq"), split(col("syms"), SEP).as("a"))
        .where(size(col("a")) >= 4)
        .select(col("freq"), explode(expr(
          "transform(sequence(2, size(a) - 2), i -> struct(a[i-1] AS l, a[i] AS r))"))
          .as("p"))
        .groupBy(col("p.l"), col("p.r")).agg(sum("freq").as("n"))
        .where(col("n") >= minPairFreq)
        .orderBy(col("n").desc, col("l"), col("r"))
        .limit(1).collect()
      // this collect was the round's one job: it materialized `cur`'s
      // cache on first touch, so the parent frame can go now
      if (prev != null) { prev.unpersist(blocking = false); prev = null }
      if (best.isEmpty) continue = false
      else {
        val (l, rt) = (best(0).getString(0), best(0).getString(1))
        merges += Merge(r, l, rt)
        // left-to-right non-overlapping merge: consume |l|r and require
        // (not consume) the trailing separator, so runs like |a|a|a|
        // merge the first pair only — exactly BPE's order
        val pat = java.util.regex.Pattern.quote(SEP + l + SEP + rt) + "(?=" + SEP + ")"
        // the .toRdd capture happens while `cur` is still registered, so
        // the captured physical plan reads cur's cache; the re-rooted
        // frame's LOGICAL plan is a leaf (see rerootOnRdd scaladoc).
        // copyRows=false is safe on both branches below: the persist
        // branch's columnar cache build copies values, and
        // Dataset.checkpoint copies rows internally.
        val projected = org.apache.spark.sql.GraftColumnBridge.rerootOnRdd(
          cur.select(
            regexp_replace(col("syms"), pat, SEP + l + rt).as("syms"),
            col("freq")),
          copyRows = false)
        r += 1
        if (r % 24 == 0) {
          if (spark.sparkContext.getCheckpointDir.isEmpty) {
            // a driver-local temp dir only works when executors share
            // the driver's filesystem — on a real cluster each executor
            // would write its partitions to its OWN disk and later reads
            // from other executors fail. Fail fast with the remedy
            // rather than dying cryptically mid-train at round 24.
            require(spark.sparkContext.isLocal,
              "distributed BPE training needs a cluster-visible checkpoint " +
                "dir (HDFS/S3): call sparkContext.setCheckpointDir first")
            spark.sparkContext.setCheckpointDir(java.nio.file.Files
              .createTempDirectory("graft-bpe-ckpt").toString)
          }
          // checkpoint the UNPERSISTED projection: the eager checkpoint
          // job reads `cur`'s cache and writes the files directly —
          // persisting first would build a full columnar cache of a
          // corpus-distinct-sized table only to discard it right after.
          // Once the files exist the old cache can go; the checkpointed
          // frame takes the cache slot (rebuilt lazily from files).
          val ck = projected.checkpoint(eager = true)
          cur.unpersist(blocking = false)
          cur = ck.persist(StorageLevel.MEMORY_AND_DISK)
        } else {
          prev = cur
          cur = projected.persist(StorageLevel.MEMORY_AND_DISK)
        }
      }
    }
    cur.unpersist(blocking = false)
    if (prev != null) prev.unpersist(blocking = false)
    merges.result()
  }

  /** Encode a text column into BPE tokens with a learned merge table
    * (codegen expression; merge ranks ride along as a plan reference).
    */
  def encodeTokens(c: org.apache.spark.sql.Column, merges: Seq[Merge]): org.apache.spark.sql.Column =
    graft.functions.BpeEncode(c, merges.map(m => (m.left, m.right, m.rank)))
}
