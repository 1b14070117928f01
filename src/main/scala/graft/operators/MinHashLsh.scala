package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + banded LSH near-duplicate detection over a text column.
  *
  * Scale shape (100 TB): the only wide operations are groupBys on
  * (doc, band) keys and the bucket self-join; no cartesian product ever
  * forms. Signatures are k longs per doc (k=48 → 384 bytes/doc crossing
  * the shuffle, independent of document size). Candidate pairs are
  * verified with exact shingle Jaccard — also via inverted-index join,
  * restricted to the candidate set.
  *
  * Everything is built from codegen'd functions (xxhash64 + arithmetic);
  * no UDFs. Hash family: h_i(x) = (a_i * xxhash64(x) + b_i) with fixed
  * odd multipliers — the standard multiply-shift universal family.
  */
object MinHashLsh {

  /** Word n-gram shingles, one row per (id, shingle), deduped per doc.
    * Shuffle-free narrow map in typed JVM code — higher-order SQL lambdas
    * (`transform`/`aggregate`) are interpreted per element and cost ~3x
    * more than this flatMap at realistic document sizes. */
  def shingles(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        if (text == null) Iterator.empty
        else {
          val toks = text.trim.split(graft.queries.Tables.Ws)
          if (toks.length < n) Iterator.empty
          else {
            val seen = new java.util.HashSet[String]()
            val sb = new java.lang.StringBuilder(64)
            Iterator.range(0, toks.length - n + 1).flatMap { i =>
              sb.setLength(0)
              var j = 0
              while (j < n) {
                if (j > 0) sb.append(' ')
                sb.append(toks(i + j)); j += 1
              }
              val s = sb.toString
              if (seen.add(s)) Some((id, s)) else None
            }
          }
        }
      }
      .toDF(idCol, "shingle")
  }

  /** k-minhash signature per id as ONE array column, via the custom
    * Catalyst aggregate [[graft.functions.MinHashSignature]] (single
    * buffer, map-side combinable, O(1) codegen instead of O(k)). */
  def signatures(sh: DataFrame, idCol: String, k: Int = 48): DataFrame =
    sh.groupBy(col(idCol))
      .agg(graft.functions.MinHashSignature(col("shingle"), k).as("sig"))

  /** Banded LSH candidate pairs: ids sharing ≥1 band bucket. With r = k/bands
    * rows per band, a pair of similarity j collides with probability
    * 1-(1-j^r)^bands — r=8/b=6 targets the j ≥ 0.7 near-dup regime while
    * keeping the candidate set tiny on corpora with high baseline overlap.
    * Buckets key on the raw (band, minhash-slice) pair — not a rehash —
    * so the candidate set is reproducible by the DuckDB oracle. */
  def candidatePairs(sig: DataFrame, idCol: String, k: Int = 48,
      bands: Int = 6): DataFrame = {
    val rowsPerBand = k / bands
    // no cache: the self-join's two sides are identical subtrees, so the
    // Exchange(hash(bucket)) each side plans is deduped by ReuseExchange —
    // the minhash aggregation runs once per execution and both join sides
    // read the same shuffle map outputs, with no persistent RDD left in
    // the session afterwards
    val buckets = sig.select(col(idCol),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          slice(col("sig"), b * rowsPerBand + 1, rowsPerBand).as("v"))): _*))
        .as("bucket"))
    val a = buckets.as("a"); val b2 = buckets.as("b")
    a.join(b2, col("a.bucket") === col("b.bucket") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
  }

  /** End-to-end near-dup pairs: LSH candidates verified with exact
    * shingle Jaccard ≥ threshold. */
  def nearDupPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, k: Int = 48, bands: Int = 6): DataFrame = {
    // repartition(id), no cache: signatures/sizes groupBys and the id_a
    // probe all consume this one reused exchange (the shingling flatMap
    // runs once per execution); the (id_b, shingle) probe re-shuffles on
    // top of it. Alias-aware output partitioning carries hash(id) through
    // the renames.
    // explicit null filter aligns each consumer branch's inferred
    // constraints so the exchange canonicalizes equal across branches
    val sh = shingles(df, idCol, textCol)
      .filter(col(idCol).isNotNull && col("shingle").isNotNull)
      .repartition(col(idCol))
    val sig = signatures(sh, idCol, k)
    val cand = candidatePairs(sig, idCol, k, bands)
    // count(shingle) not count(1): keeps this branch referencing both
    // columns so its subtree canonicalizes equal with sig's and the
    // exchange is reused rather than recomputed (values identical —
    // shingle is non-null by the filter in `sh`)
    val sizes = sh.groupBy(idCol).agg(count(col("shingle")).as("n_sh"))
    // exact intersection counts for CANDIDATE pairs only: expand each
    // candidate pair with id_a's shingles, then probe id_b's shingle set.
    // This keeps the verify cost proportional to |candidates| × doc size,
    // not to the full inverted-index self-join.
    val a = sh.withColumnRenamed(idCol, "id_a")
    val b = sh.withColumnRenamed(idCol, "id_b")
    val inter2 = cand.join(a, "id_a")
      .join(b, Seq("id_b", "shingle"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_int"))
    inter2
      .join(sizes.withColumnRenamed(idCol, "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
      .join(sizes.withColumnRenamed(idCol, "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
      .withColumn("jaccard",
        round(col("n_int").cast("double") / (col("n_a") + col("n_b") - col("n_int")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }
}
