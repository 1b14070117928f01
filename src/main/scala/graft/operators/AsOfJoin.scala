package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (backward) join: for each left row, the latest right row with
  * `rightTime <= leftTime` within the same key group.
  *
  * Spark has no native ASOF JOIN; a naive range join explodes into an
  * O(n·m) cartesian per key. This composition stays built-in (preference
  * order (a) in the build guide) and scales: union both sides, one sort
  * per key partition, and a running `last(_, ignoreNulls)` carry-forward
  * window — O((n+m) log(n+m)) per key, a single shuffle on the key
  * columns, no join blow-up. Matches DuckDB's `ASOF JOIN` semantics
  * (oracle-checked in the driver gate).
  */
object AsOfJoin {

  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String): DataFrame = {
    val leftCols = left.columns.filterNot(c => keys.contains(c) || c == leftTime)
    val rightCols = right.columns.filterNot(c => keys.contains(c) || c == rightTime)

    val lTagged = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("__t"), lit(1).as("__is_left")) ++
        leftCols.map(col) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")) :+
        lit(null).cast(right.schema(rightTime).dataType).as("__r_time"): _*)
    val rTagged = right.select(
      keys.map(col) ++
        Seq(col(rightTime).as("__t"), lit(0).as("__is_left")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightCols.map(c => col(c).as(s"__r_$c")) :+
        col(rightTime).as("__r_time"): _*)

    // right rows sort before left rows at equal timestamps so a match at
    // exactly leftTime is visible (ASOF >= semantics)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = (rightCols.map(c => s"__r_$c") :+ "__r_time").foldLeft(
      lTagged.unionByName(rTagged)) { (d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }

    carried.filter(col("__is_left") === 1)
      .select(
        keys.map(col) ++ Seq(col("__t").as(leftTime)) ++ leftCols.map(col) ++
          rightCols.map(c => col(s"__r_$c").as(c)) :+
          col("__r_time").as(rightTime): _*)
  }
}
