package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** 64-bit SimHash document fingerprints + Hamming-distance near-dup pairs.
  *
  * The per-bit vote is expressed as 64 conditional-sum aggregations over
  * exploded tokens — fully codegen'd, map-side combinable, no UDFs. At
  * scale the shuffle carries (doc, 64 ints); the near-dup join buckets on
  * 4 × 16-bit bands (any pair within Hamming distance ≤ 3·k must share a
  * band — standard pigeonhole blocking), never a cartesian product.
  */
object SimHash {

  /** Token hash: first 8 digest bytes of md5, big-endian, as a signed
    * long. md5 (unlike xxhash64's Spark-specific seeding) is computable
    * bit-identically in DuckDB, which makes the whole fingerprint
    * oracle-checkable rather than rows-only. */
  private def tokenHash(tok: Column): Column = {
    val hex = md5(tok)
    shiftleft(conv(substring(hex, 1, 8), 16, 10).cast("long"), 32)
      .bitwiseOR(conv(substring(hex, 9, 8), 16, 10).cast("long"))
  }

  /** (id, simhash: long) per document. */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol),
      explode(split(trim(col(textCol)), graft.queries.Tables.Ws)).as("tok"))
      .withColumn("h", tokenHash(col("tok")))
    val votes = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1))
        .as(s"v$b")
    }
    val agg = toks.groupBy(col(idCol)).agg(votes.head, votes.tail: _*)
    val sigExpr = (0 until 64).map { b =>
      when(col(s"v$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }.reduce[Column]((x, y) => x.bitwiseOR(y))
    agg.select(col(idCol), sigExpr.as("simhash"))
  }

  private def popcount64(c: Column): Column = {
    // bit_count is available as a SQL function in Spark 3.2+
    expr(s"bit_count(${c.toString})")
  }

  /** Pairs within the given Hamming distance, blocked by 16-bit bands. */
  def nearDupPairs(sig: DataFrame, idCol: String, maxDistance: Int = 3): DataFrame = {
    val banded = sig.select(col(idCol), col("simhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("simhash"), b * 16).bitwiseAND(0xFFFFL).as("v"))): _*))
        .as("bucket"))
    val a = banded.as("a"); val b = banded.as("b")
    a.join(b, col("a.bucket") === col("b.bucket") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        col("a.simhash").as("h_a"), col("b.simhash").as("h_b"))
      .distinct()
      .withColumn("hamming",
        expr("bit_count(h_a ^ h_b)"))
      .filter(col("hamming") <= maxDistance)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}
