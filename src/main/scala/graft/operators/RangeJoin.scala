package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-range join: pair left and right rows in the same key group whose
  * timestamps are within `tolerance` of each other.
  *
  * A raw `|l.t - r.t| <= tol` join condition degenerates to a per-key
  * nested loop in Spark (BroadcastNestedLoopJoin). This implementation
  * buckets both sides by `floor(t / tolerance)` and joins each left row
  * to its own and its two neighboring buckets — every qualifying pair
  * shares at least one of those buckets, so the equi-join is exact while
  * the work per row is bounded by bucket occupancy, not corpus size.
  */
object RangeJoin {

  /** Inner time-range join on `keys` with `|leftTime - rightTime| <=
    * toleranceMicros`. Output: keys + both time columns + payloads. */
  def withinTolerance(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, toleranceMicros: Long): DataFrame = {
    require(toleranceMicros > 0, "tolerance must be positive")
    val lb = unix_micros(col(leftTime))
    val rb = unix_micros(col(rightTime))

    // left rows explode into {bucket-1, bucket, bucket+1}
    val l = left.withColumn("__lb", lb)
      .withColumn("__bucket",
        explode(array(floor(lb / toleranceMicros) - 1,
          floor(lb / toleranceMicros), floor(lb / toleranceMicros) + 1)))
    val r = right.withColumn("__rb", rb)
      .withColumn("__bucket", floor(rb / toleranceMicros))

    l.join(r, keys :+ "__bucket")
      .filter(abs(col("__lb") - col("__rb")) <= toleranceMicros)
      .drop("__bucket", "__lb", "__rb")
  }
}
