package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives for dedup pipelines.
  *
  * The one that matters at 100 TB: collapsing near-duplicate PAIRS
  * (from MinHash-LSH or exact jaccard) into dedup GROUPS so a pipeline
  * can keep one canonical document per cluster. That is connected
  * components; the reference has no graph operators, so this is
  * pipeline-extension surface, built Spark-first.
  */
object Graph {

  /** Connected components by hash-min label propagation: every node
    * repeatedly adopts the smallest label among itself and its
    * neighbors, converging in O(max component diameter) rounds — near-dup
    * clusters are dense and shallow, so this is 2–4 rounds in practice.
    *
    * Scale shape: each round is one shuffle join + one shuffle
    * aggregation, both keyed on node id, so AQE coalesces and co-locates
    * them; labels are cached per round and the previous round is
    * unpersisted. Convergence is detected with a count of changed
    * labels (a scalar per round, not a collect of the frame). For
    * graphs with continent-sized diameters the classic fix is
    * large-star/small-star (Kiveris et al., SoCC'14) — not needed for
    * dedup clusters.
    *
    * @return (id, component) — component is the minimum node id
    *         reachable from `id`; only nodes that appear in `edges` are
    *         returned (isolated docs are their own trivial cluster).
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 25): DataFrame = {
    val sym = edges.select(col(srcCol).as("x"), col(dstCol).as("y"))
      .unionAll(edges.select(col(dstCol).as("x"), col(srcCol).as("y")))
      .cache()
    var labels = sym.select(col("x").as("id")).distinct()
      .withColumn("comp", col("id"))
      .cache()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val nbrMin = sym.join(labels, sym("y") === labels("id"))
        .groupBy(col("x")).agg(min("comp").as("nbr_comp"))
      val next = labels.join(nbrMin, labels("id") === nbrMin("x"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("nbr_comp"), col("comp"))).as("comp"),
          col("comp").as("prev"))
        .cache()
      val changed = next.filter(col("comp") < col("prev")).count()
      val old = labels
      labels = next.select("id", "comp").cache()
      labels.count() // materialize before dropping parents
      next.unpersist()
      old.unpersist()
      converged = changed == 0
      iter += 1
    }
    sym.unpersist()
    labels
  }
}
