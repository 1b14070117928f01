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
