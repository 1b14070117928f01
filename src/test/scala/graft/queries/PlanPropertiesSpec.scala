package graft.queries

import graft.SparkEntry
import graft.readstat.SparkTestBase

/** Registry-wide physical-plan properties: the scale guarantees the
  * scaladocs claim, pinned the way oracles pin values. String-based on
  * purpose — node `collect` cannot see through AdaptiveSparkPlanExec
  * (its children are fields, not tree children), while `toString`
  * prints the full current tree.
  */
class PlanPropertiesSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  /** Queries whose plan intentionally contains a broadcast nested-loop
    * join: a non-equi condition against a BROADCAST, driver-tiny side
    * (a bounded query set or constant-size frame), where the loop is
    * |corpus| × |tiny| by design. A cartesian between two corpus-sized
    * sides is never allowed. */
  private val bnljAllowed: Map[String, String] = Map(
    "ann_brute_force" -> "10 broadcast query vectors x corpus, qid<>nid non-equi",
    "ann_recall_eval" -> "composes ann_brute_force",
    "embed_knn_classify" -> "20 broadcast held-out queries x corpus",
    "dedup_embedding_cosine" -> "block-pair frame joined non-equi; both sides df-capped",
    "dedup_semantic" -> "same block-pair shape",
    "text_decontaminate" -> "8 broadcast benchmark docs x corpus n-gram sets",
    "asof_join" -> "bucket-neighbor non-equi against broadcast bucketed right side",
    "sample_temperature" -> "per-source rates (5 rows) broadcast onto the corpus",
    "text_inverted_index" -> "1-row corpus-count stats frame broadcast onto the df table",
    "text_langid" -> "constant 2-row language-profile frame",
    "text_lang_stats" -> "constant language-profile frame x per-lang aggregates",
    "ann_ivf_topk" -> "10 query vectors x 16 broadcast centroids (probe ranking)",
    "ann_ivf_trained" -> "same probe shape with trained centroids",
    "corpus_overlap" -> "per-source totals (|sources| rows) broadcast onto pair counts",
    "sample_cluster_balance" -> "1-row mean-cell-size scalar broadcast",
    "text_unigram_logprob" -> "1-row corpus-total scalar broadcast",
    "text_bigram_logprob" -> "1-row corpus-total scalar broadcast",
    "text_tfidf_topk" -> "1-row corpus-size scalar broadcast",
    "text_bm25_topk" -> "1-row corpus-stats (N, avgdl, df) scalar broadcast",
    "profile_lineitem" -> "cross-join of five 1-row aggregate results",
    "events_trend" -> "1-row time-origin (min sec) scalar broadcast",
    "quality_percentile" -> "1-row histogram-total scalar broadcast",
    "zorder_layout" -> "1-row key-bounds (min/max) scalar broadcast")

  test("no registry query plans a cartesian product; BNLJ only where declared") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      val cartesian = plan.contains("CartesianProduct")
      val strayBnlj =
        plan.contains("BroadcastNestedLoopJoin") && !bnljAllowed.contains(name)
      if (cartesian) Some(s"$name: CartesianProduct")
      else if (strayBnlj) Some(s"$name: undeclared BroadcastNestedLoopJoin")
      else None
    }
    assert(offenders.isEmpty,
      s"product joins outside the allowlist:\n${offenders.mkString("\n")}")
  }

  test("filters and projections reach the parquet scans of pruned queries") {
    // q6: classic filter+2-col agg — predicate must be pushed, schema pruned
    val q6 = Relational.q6Revenue(spark, sf).queryExecution.executedPlan.toString
    assert(q6.contains("PushedFilters: [") && !q6.matches("(?s).*PushedFilters: \\[\\].*"),
      s"q6 scan lost its pushed filters:\n$q6")
    // funnel stages: event_type pushdown + two-column read schema
    val f = Relational.q18Funnel(spark, sf).queryExecution.executedPlan.toString
    assert(f.contains("event_type"), "funnel lost its event_type predicate")
    assert(!f.contains("props"),
      s"funnel reads the wide props column it never uses:\n$f")
  }

  test("top-k queries use TakeOrdered, not a global sort") {
    val q2 = Relational.q2TopCustomers(spark, sf).queryExecution.executedPlan.toString
    assert(q2.contains("TakeOrderedAndProject"), s"q2 sorts globally:\n$q2")
    val ng = Text.ngramTopk(spark, sf).queryExecution.executedPlan.toString
    assert(ng.contains("TakeOrderedAndProject"), s"ngram topk sorts globally:\n$ng")
  }
}
