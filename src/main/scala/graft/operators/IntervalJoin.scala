package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-overlap join: pair left rows `[lStart, lEnd]` with right rows
  * `[rStart, rEnd]` that overlap (`lStart <= rEnd && rStart <= lEnd`,
  * closed intervals) — the generalization of [[RangeJoin]]'s
  * point-within-tolerance to interval × interval.
  *
  * A raw overlap predicate is not an equi-join, so Spark plans it as a
  * nested loop. This implementation tiles the time axis into fixed-width
  * buckets: each interval explodes into every bucket its span touches and
  * the sides equi-join on the bucket id, which bounds per-row work by
  * bucket occupancy instead of corpus size.
  *
  * The usual cost of the tiling is that a pair overlapping in several
  * buckets matches several times and needs a `distinct` — a full extra
  * shuffle of the candidate set. We avoid it with the canonical-bucket
  * rule (the "reference point" method from the interval-join literature,
  * e.g. Dittrich et al.'s partitioned spatial joins): a candidate pair is
  * KEPT only in the bucket containing `max(lStart, rStart)` — the start
  * of the overlap region — which is unique per pair, so every qualifying
  * pair is emitted exactly once with no dedup pass.
  *
  * Bucket width trades explode fan-out (width ≪ span → many tiles per
  * row) against bucket occupancy (width ≫ span → many candidates per
  * bucket); pick it near the typical LONGER side's span. Both sides
  * shuffle once on (bucket), the overlap filter is codegen'd, and no
  * state beyond a hash-join bucket is held — the shape survives 1000
  * executors as long as no single bucket is pathological (a hot bucket
  * is the same skew problem as any hot join key: salt it or widen the
  * bucket).
  */
object IntervalJoin {

  /** Inner overlap join. Start/end columns must be Long (e.g. epoch
    * seconds or micros); both endpoints are inclusive. Column name
    * collisions between the two sides are the caller's to avoid. */
  def overlap(left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")

    def tiles(s: Column, e: Column): Column =
      sequence(floor(s / bucketWidth), floor(e / bucketWidth))

    val l = left
      .withColumn("__bucket", explode(tiles(col(lStart), col(lEnd))))
    val r = right
      .withColumn("__bucket", explode(tiles(col(rStart), col(rEnd))))

    l.join(r, Seq("__bucket"))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      // canonical bucket: the one holding the overlap's start — emit once
      .filter(col("__bucket") ===
        floor(greatest(col(lStart), col(rStart)) / bucketWidth))
      .drop("__bucket")
  }
}
