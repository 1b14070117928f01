package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition in bounded
  * batches. The Spark-side mechanics — schema, partitioning, batch
  * shape, feature output — are real; the codec itself is a clearly
  * marked deterministic stub (this container has no image/audio
  * libraries), so swapping in a real decoder is a one-function change.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", IntegerType),
      StructField("declared_format", StringType))))))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType),
    StructField("n_bytes", IntegerType),
    StructField("fingerprint", StringType),
    StructField("feature", ArrayType(FloatType))))

  /** STUB decode: a real implementation would hand `payload` to an image
    * or audio codec here. The deterministic fake derives an 8-dim
    * "feature" from the payload bytes so downstream plumbing (schemas,
    * similarity joins, aggregations) is exercised with stable values.
    */
  def stubDecode(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](8)
    var i = 0
    while (i < payload.length) {
      out(i % 8) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** Batch feature extraction over the media frame: mapPartitions keeps
    * each task's working set to one partition of payloads (the Scala
    * analog of `mapInPandas` batch processing). */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    media.select("media_id", "media_type", "payload")
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val mtype = r.getString(1)
          val payload = r.getAs[Array[Byte]](2)
          val feat = stubDecode(payload)
          val md5 = java.security.MessageDigest.getInstance("MD5")
            .digest(payload).map("%02x".format(_)).mkString
          Row(id, mtype, payload.length, md5, feat.toSeq)
        }
      }(enc)
  }

  /** Build a media frame from the documents table (text bytes standing in
    * for opaque payloads — same plumbing, available test data). */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit("text/plain").as("media_type"),
      col("text").cast(BinaryType).as("payload"),
      struct(octet_length(col("text")).as("n_bytes"),
        lit("utf-8").as("declared_format")).as("meta"))
}
