package graft.queries

import graft.readstat.SparkTestBase

/** Non-vacuousness gate for registry queries whose oracle check would
  * stay green on an EMPTY result (a hash of zero rows matches a hash of
  * zero rows). The round-8 `text_inverted_index` band matched zero terms
  * at every gate SF and its oracle entry was vacuously green for a full
  * round — this spec pins nonzero output at the two smallest SFs so
  * that regression class fails a test instead of passing an oracle.
  * (sf0.1 row counts are recorded in COVERAGE.md next to the query —
  * too slow for a unit spec, checked per-round from the bench record.)
  */
class NonVacuousSpec extends SparkTestBase {

  private val sfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  test("text_inverted_index emits rows at every gate SF") {
    sfs.foreach { d =>
      val n = Text.invertedIndex(spark, d).count()
      assert(n > 0, s"inverted index vacuous at $d")
    }
  }

  test("leakage split: no near-dup pair straddles a split boundary") {
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.01"
    val split = Text.leakageSplit(spark, d).select("doc_id", "split", "split_key")
    val pairs = Text.ngramJaccardPairs(spark, d).select("id_a", "id_b")
    val crossing = pairs
      .join(split.select(col("doc_id").as("id_a"), col("split").as("s_a")), "id_a")
      .join(split.select(col("doc_id").as("id_b"), col("split").as("s_b")), "id_b")
      .filter(col("s_a") =!= col("s_b")).count()
    assert(crossing == 0L, s"$crossing near-dup pairs straddle splits")
    // non-vacuous: clusters exist (some split_key != doc_id) and all
    // three splits are populated at the oracle SF
    assert(split.filter(col("split_key") =!= col("doc_id")).count() > 0)
    val splits = split.select("split").distinct().collect().map(_.getString(0)).toSet
    assert(splits == Set("train", "val", "test"), splits.toString)
    // singleton docs agree with the plain hash split (same bucket rule)
    val plain = graft.queries.Curation.hashSplit(spark, d)
      .select(col("doc_id"), col("split").as("p_split"))
    val disagree = split.filter(col("split_key") === col("doc_id"))
      .join(plain, "doc_id").filter(col("split") =!= col("p_split")).count()
    assert(disagree == 0L)
  }

  test("the pair-emitting dedup queries emit pairs at the oracle SF") {
    // same failure class: a similarity threshold or df band that filters
    // everything makes the oracle compare two empty frames
    val d = "/root/testdata/sf0.01"
    val pairQueries = Seq("dedup_ngram_jaccard", "dedup_containment",
      "sim_sparse_cosine", "dedup_winnow_pairs")
    pairQueries.foreach { q =>
      val n = graft.SparkEntry.queries(q)(spark, d).count()
      assert(n > 0, s"$q returned zero rows at $d — vacuous oracle entry")
    }
  }
}
