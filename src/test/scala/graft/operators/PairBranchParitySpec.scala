package graft.operators

import graft.queries.Text
import graft.readstat.SparkTestBase

/** Pins the cost-based pair-join dispatches: the skew branches (PPJoin
  * prefix filtering for Jaccard, asymmetric smaller-side prefix
  * filtering for containment) must produce EXACTLY the rows of the
  * direct inverted-index branches on the same corpus — prefix filtering
  * is a candidate superset + exact verification, never an
  * approximation. The production threshold (sum(df²) > 2e8) only ever
  * trips on skewed corpora, so without this spec the skew branches
  * would run untested.
  */
class PairBranchParitySpec extends SparkTestBase {

  private val d = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toIndexedSeq).toIndexedSeq

  test("jaccard: PPJoin prefix branch == direct index-join branch") {
    val direct = rows(Text.ngramJaccardPairsImpl(spark, d, Some(false)))
    val prefix = rows(Text.ngramJaccardPairsImpl(spark, d, Some(true)))
    assert(direct.nonEmpty)
    assert(direct == prefix)
  }

  test("containment: smaller-side prefix branch == direct index-join branch") {
    val direct = rows(Text.containmentPairsImpl(spark, d, Some(false)))
    val prefix = rows(Text.containmentPairsImpl(spark, d, Some(true)))
    assert(direct.nonEmpty)
    assert(direct == prefix)
  }

  test("keepBest: shuffle-join dispatch == broadcast dispatch") {
    val bc = rows(Text.keepBestImpl(spark, d, Some(true)))
    val sj = rows(Text.keepBestImpl(spark, d, Some(false)))
    assert(bc.nonEmpty)
    assert(bc == sj)
  }

  test("q22 pair-set collect fails loudly over its driver bound") {
    val e = intercept[IllegalStateException] {
      graft.queries.Relational.q22RecursiveClustersImpl(spark, d,
        maxLocalPairs = 1).collect()
    }
    assert(e.getMessage.contains("dedup_clusters"),
      "the error must point at the production clustering path")
  }
}
