package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed key distributions: the standard remedy
  * when one join key holds a disproportionate share of the left side
  * (hot users, empty-string fingerprints, null-ish sentinel keys) and a
  * plain shuffle join lands that key's entire volume on one reducer.
  *
  * The left side scatters uniformly across `salt` sub-keys; the right
  * side replicates each row `salt` times (one per sub-key) so every
  * left row still meets every matching right row exactly once. The hot
  * key's work then spreads over `salt` reducers, at the cost of
  * shuffling the right side `salt` times — the right trade whenever
  * `right` is small relative to the hot key's volume but too large (or
  * too join-reused) to broadcast outright.
  *
  * Result-identical to `left.join(right, keys, joinType)` for the
  * supported join types (pinned by SkewJoinSpec and the
  * `skewjoin_events_hot` oracle). AQE's skew-join handles sort-merge
  * skew at runtime, but only splits oversized PARTITIONS — a single
  * hot KEY is indivisible to it; salting splits the key itself.
  */
object SkewJoin {

  /** Supported types: every left row carries exactly one salt value, so
    * join types that emit unmatched LEFT rows (or matched pairs) stay
    * exact. Right/full outer would emit each unmatched right row once
    * per replica — rejected. */
  private val supported = Set("inner", "left", "leftouter", "leftsemi", "leftanti")

  def salted(left: DataFrame, right: DataFrame, keys: Seq[String],
      salt: Int, joinType: String = "inner"): DataFrame = {
    require(salt > 1, "salt must be > 1")
    require(supported.contains(joinType.toLowerCase.replace("_", "")),
      s"join type '$joinType' not supported by salted join (right rows replicate)")
    require(!left.columns.contains("__salt") && !right.columns.contains("__salt"),
      "inputs must not already have a __salt column")
    // scatter value must be DETERMINISTIC PER ROW CONTENT, not per
    // physical position: monotonically_increasing_id/rand change across
    // task recomputes, and a fetch-failure retry would re-salt rows onto
    // different reducers — some reducers see a row twice, others never
    // (the SPARK-23207 round-robin hazard). hash(all left columns) is
    // recompute-stable; ANY value in [0, salt) is correct, so the only
    // cost is that fully-identical hot-key rows share a salt (they
    // carry no distinguishing bits to scatter by — callers with such
    // data should add a stable id column first).
    val l = left.withColumn("__salt",
      pmod(hash(left.columns.map(col).toIndexedSeq: _*), lit(salt)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    l.join(r, keys :+ "__salt", joinType).drop("__salt")
  }
}
