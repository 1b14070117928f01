package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding compression for 100 TB-scale vector stores: scalar (int8)
  * quantization with per-dimension global ranges. 4 bytes/dim float32 →
  * 1 byte/dim code cuts the shuffle/storage footprint of every
  * downstream ANN pass by 4×; the per-dim range table is as big as the
  * dimensionality (tiny), so it broadcasts to every executor for both
  * encode and decode.
  */
object Quantize {

  /** Per-dimension (min, max) over the corpus — the codebook for scalar
    * quantization. One explode + one partial-aggregatable groupBy; the
    * result has `dim` rows (e.g. 64), independent of corpus size. */
  def dimRanges(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(posexplode(col(vecCol)).as(Seq("dim", "x")))
      .groupBy("dim")
      .agg(min(col("x").cast("double")).as("lo"),
        max(col("x").cast("double")).as("hi"))

  /** Quantize each vector to int8 codes (0..255 per dimension) against
    * [[dimRanges]]. All arithmetic is double (bit-identical across
    * engines); a constant dimension (hi == lo) codes to 0. Returns one
    * row per (id, dim): (id, dim, code, err) where err is the absolute
    * reconstruction error. */
  def encode(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val ranges = dimRanges(emb, idCol, vecCol)
    val dims = emb.select(col(idCol).as("__id"),
      posexplode(col(vecCol)).as(Seq("dim", "x")))
      .withColumn("x", col("x").cast("double"))
    // ranges has one row per dimension — broadcast is safe at ANY corpus
    // size (it scales with vector width, not row count)
    dims.join(broadcast(ranges), "dim")
      .withColumn("code",
        when(col("hi") > col("lo"),
          round((col("x") - col("lo")) / (col("hi") - col("lo")) * 255, 0)
            .cast("int"))
          .otherwise(lit(0)))
      .withColumn("recon",
        when(col("hi") > col("lo"),
          col("lo") + col("code").cast("double") / 255.0 * (col("hi") - col("lo")))
          .otherwise(col("lo")))
      .select(col("__id").as(idCol), col("dim"), col("code"),
        abs(col("x") - col("recon")).as("err"))
  }
}
