package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve values for multi-column data clustering — the
  * lakehouse layout trick behind Delta/Iceberg `OPTIMIZE ZORDER BY`:
  * sorting by the bit-interleaving of two keys gives files whose min/max
  * ranges are narrow in BOTH columns at once, so predicates on EITHER
  * key skip most files. A plain sort clusters only its leading column.
  *
  * The value is built from pure codegen'd integer expressions (shifts,
  * masks, ors — no UDF): each key is affinely mapped onto [0, 65535]
  * with exact integer arithmetic (`(x−min)·65535 div (max−min)`), and
  * the 16+16 bits interleave into a 32-bit Morton code. Everything is
  * deterministic and engine-replayable — the oracle rebuilds the same
  * 32-term expression.
  *
  * At 100 TB the min/max normalization constants come from a 1-row
  * aggregate broadcast (or static catalog stats); the sort itself is the
  * range-partitioned exchange any layout rewrite pays, and the payoff is
  * measured in [[ZOrderSpec]]: per-chunk key ranges after a z-sort are a
  * small fraction of the global range in both dimensions.
  */
object ZOrder {

  /** Morton interleave of two already-normalized 16-bit columns:
    * bit i of `a` lands at position 2i, bit i of `b` at 2i+1. */
  def interleave16(a: Column, b: Column): Column =
    (0 until 16).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))

  /** Normalization of x in [mn, mx] onto [0, 65535]. The scaled
    * numerator stays under 2⁵³ and the denominator under 2²⁰, so the
    * double quotient is never within an ulp of a wrong integer —
    * `floor` of it is the exact integer result in any IEEE engine
    * (explicit floor, because Spark's long cast truncates while
    * DuckDB's BIGINT cast rounds). */
  def norm16(x: Column, mn: Column, mx: Column): Column =
    when(mx === mn, lit(0L))
      .otherwise(floor((x - mn) * 65535L / (mx - mn)))

  /** Z-value column for (a, b) given their min/max bounds. */
  def zval(a: Column, aMn: Column, aMx: Column,
      b: Column, bMn: Column, bMx: Column): Column =
    interleave16(norm16(a, aMn, aMx), norm16(b, bMn, bMx))

  /** Annotate `df` with a `zval` column over two numeric key columns,
    * bounds taken from a broadcast 1-row min/max aggregate. */
  def withZval(df: DataFrame, keyA: String, keyB: String): DataFrame = {
    val bounds = df.agg(
      min(col(keyA)).as("__amn"), max(col(keyA)).as("__amx"),
      min(col(keyB)).as("__bmn"), max(col(keyB)).as("__bmx"))
    df.crossJoin(broadcast(bounds))
      .withColumn("zval", zval(
        col(keyA), col("__amn"), col("__amx"),
        col(keyB), col("__bmn"), col("__bmx")))
      .drop("__amn", "__amx", "__bmn", "__bmx")
  }
}
