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

  /** Real image resize using the JDK's built-in codecs (javax.imageio +
    * java.awt, headless-safe): decode PNG/JPEG/GIF/BMP, bilinear-scale to
    * (w, h), re-encode as PNG. Returns None when ImageIO has no decoder
    * for the payload (audio/video containers, raw bytes). */
  def resizeImage(payload: Array[Byte], w: Int, h: Int): Option[Array[Byte]] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    if (img == null) None
    else {
      val scaled = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = scaled.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
      } finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(scaled, "png", bos)
      Some(bos.toByteArray)
    }
  }

  /** STUB resize for non-image media: a real implementation would hand
    * audio/video payloads to their codecs (not in the JDK). The
    * deterministic fake strides the payload so the output length tracks
    * the pixel budget — downstream size accounting stays real. */
  def resizeStub(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val target = math.max(1, math.min(payload.length, w * h / 8))
    val out = new Array[Byte](target)
    val stride = math.max(1, payload.length / target)
    var i = 0
    while (i < target) { out(i) = payload(math.min(i * stride, payload.length - 1)); i += 1 }
    out
  }

  /** Resize the payload column in bounded per-partition batches; meta is
    * rewritten to the new byte count + target dims. Decodable images go
    * through the real ImageIO path (declared_format "png"); payloads no
    * JDK codec accepts fall back to the declared stub ("raw"). */
  def resizeImages(media: DataFrame, w: Int, h: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("media_type", StringType),
      StructField("payload", BinaryType),
      StructField("meta", StructType(Seq(
        StructField("n_bytes", IntegerType),
        StructField("declared_format", StringType),
        StructField("width", IntegerType),
        StructField("height", IntegerType))))))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select("media_id", "media_type", "payload")
      .mapPartitions { it =>
        it.map { r =>
          val payload = r.getAs[Array[Byte]](2)
          val (resized, fmt) = resizeImage(payload, w, h) match {
            case Some(png) => (png, "png")
            case None => (resizeStub(payload, w, h), "raw")
          }
          Row(r.getLong(0), r.getString(1), resized,
            Row(resized.length, fmt, w, h))
        }
      }(enc)
  }

  /** STUB frame sampling: a real implementation would demux the container
    * and decode every k-th frame. The fake treats the payload as fixed-
    * size frame slots and emits every k-th slice — one output row per
    * sampled frame, which is the real explode shape a video pipeline
    * needs (frame count scales with payload size, not row count). */
  def sampleFrames(media: DataFrame, everyK: Int, frameSize: Int = 256): DataFrame = {
    require(everyK >= 1 && frameSize >= 1)
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select("media_id", "payload")
      .mapPartitions { it =>
        it.flatMap { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          val nFrames = math.max(1, payload.length / frameSize)
          Iterator.range(0, nFrames, everyK).map { f =>
            val from = f * frameSize
            val until = math.min(payload.length, from + frameSize)
            Row(id, f, java.util.Arrays.copyOfRange(payload, from, until))
          }
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
