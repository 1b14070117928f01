package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import graft.readstat.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** DCT perceptual hash: encoding-invariance, robustness to small edits,
  * separation of different images, banded pair recall. */
class PhashSpec extends SparkTestBase {

  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  private def gradient(shift: Int = 0, blotch: Boolean = false): BufferedImage = {
    val img = new BufferedImage(64, 64, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 64; x <- 0 until 64) {
      val v = math.min(255, math.max(0, (x * 2 + y) + shift))
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    if (blotch) // small local edit: a 6x6 dark square
      for (y <- 10 until 16; x <- 40 until 46) img.setRGB(x, y, 0)
    img
  }

  private def checker(): BufferedImage = {
    val img = new BufferedImage(64, 64, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 64; x <- 0 until 64) {
      val v = if (((x / 8) + (y / 8)) % 2 == 0) 255 else 0
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  private def dist(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("same pixels hash identically across encodings (png vs bmp)") {
    val img = gradient()
    val hp = Multimodal.imagePhash(encode(img, "png")).get
    val hb = Multimodal.imagePhash(encode(img, "bmp")).get
    assert(hp == hb)
  }

  test("small edits move few bits; different structure moves many") {
    val base = Multimodal.imagePhash(encode(gradient(), "png")).get
    val bright = Multimodal.imagePhash(encode(gradient(shift = 8), "png")).get
    val blotched = Multimodal.imagePhash(encode(gradient(blotch = true), "png")).get
    val other = Multimodal.imagePhash(encode(checker(), "png")).get
    assert(dist(base, bright) <= 6, s"brightness shift moved ${dist(base, bright)} bits")
    assert(dist(base, blotched) <= 6, s"blotch moved ${dist(base, blotched)} bits")
    assert(dist(base, other) >= 16, s"different image only ${dist(base, other)} bits apart")
  }

  test("resize robustness: downscaled image stays within threshold") {
    val full = encode(gradient(), "png")
    val half = Multimodal.resizeImage(full, 32, 32).get
    val d = dist(Multimodal.imagePhash(full).get, Multimodal.imagePhash(half).get)
    assert(d <= 6, s"resize moved $d bits")
  }

  test("phashPairs finds planted near-dups, skips undecodable payloads") {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val rows = Seq(
      Row(1L, encode(gradient(), "png")),
      Row(2L, encode(gradient(shift = 8), "bmp")), // near-dup of 1
      Row(3L, encode(checker(), "png")),           // different image
      Row(4L, "not an image at all".getBytes("UTF-8"))) // skipped
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val pairs = Multimodal.phashPairs(media, maxDist = 6)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((1L, 2L)), s"got ${pairs.toSeq}")
  }
}
