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

  test("q22 pair set stays distributed ABOVE the local threshold") {
    // rounds 9-12 landed the pair set as a driver LocalRelation behind
    // a 5M-row hard bound; r13 replaced the collect with a distributed
    // parquet spill; r15 added a cost-gated LOCAL recursion below a
    // 2M-pair threshold (the Graph.connectedComponents dispatch). Pin
    // that the distributed arm is still the over-threshold plan: with
    // the local path disabled, no non-empty LocalRelation feeds the
    // recursion — the pair view stays file-backed at any scale.
    val df = graft.queries.Relational
      .q22RecursiveClustersImpl(spark, d, localPairThreshold = 0L)
    val locals = df.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation
        if l.data.nonEmpty => l
    }
    assert(locals.isEmpty,
      s"q22 must not materialize pairs on the driver; found: $locals")
  }

  test("q22 local min-propagation == distributed recursive CTE") {
    // the r15 local fast path must be row-identical to the distributed
    // recursion it short-circuits
    val local = rows(graft.queries.Relational
      .q22RecursiveClustersImpl(spark, d, localPairThreshold = 2000000L))
    val dist = rows(graft.queries.Relational
      .q22RecursiveClustersImpl(spark, d, localPairThreshold = 0L))
    assert(local.nonEmpty)
    assert(local == dist)
  }

  test("q22 bounded-hop recursion == hash-min connected components") {
    // hop <= 4 is >= any near-dup cluster diameter on this corpus, so
    // the recursive-CTE min-reach label must equal the true component
    // minimum from the production clustering path on the same pairs.
    val q22 = rows(graft.queries.Relational.q22RecursiveClusters(spark, d))
    assert(q22.nonEmpty)
    val pairs = Text.ngramJaccardPairs(spark, d).select("id_a", "id_b")
    val cc = rows(Graph.connectedComponents(pairs, "id_a", "id_b")
      .toDF("doc_id", "cluster_id").orderBy("doc_id"))
    assert(q22 == cc)
  }
}
