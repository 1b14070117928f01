package graft.operators

import javax.imageio.ImageIO

import graft.readstat.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Keyframe selection: scene cuts are kept, static runs collapse to one
  * frame, undecodable payloads land on the declared stub path. */
class KeyframeSpec extends SparkTestBase {

  private def jpeg(shade: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(16, 12,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(shade, shade, shade)); g.fillRect(0, 0, 16, 12)
    g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  private def chunk(fourcc: String, body: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(fourcc.getBytes("US-ASCII"))
    val n = body.length
    bos.write(Array[Byte]((n & 0xff).toByte, ((n >> 8) & 0xff).toByte,
      ((n >> 16) & 0xff).toByte, ((n >> 24) & 0xff).toByte))
    bos.write(body)
    if ((n & 1) == 1) bos.write(0)
    bos.toByteArray
  }

  /** MJPEG AVI of the given frame shades, via the same RIFF layout the
    * demux test uses. */
  private def avi(shades: Seq[Int]): Array[Byte] = {
    val movi = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write("movi".getBytes("US-ASCII"))
      shades.foreach(sh => bos.write(chunk("00dc", jpeg(sh))))
      bos.toByteArray
    }
    val inner = chunk("LIST", movi)
    val bos = new java.io.ByteArrayOutputStream()
    bos.write("RIFF".getBytes("US-ASCII"))
    val n = inner.length + 4
    bos.write(Array[Byte]((n & 0xff).toByte, ((n >> 8) & 0xff).toByte,
      ((n >> 16) & 0xff).toByte, ((n >> 24) & 0xff).toByte))
    bos.write("AVI ".getBytes("US-ASCII"))
    bos.write(inner)
    bos.toByteArray
  }

  test("scene cuts are kept; static runs collapse to their first frame") {
    // three scenes: dark x3, bright x2, mid x2
    val shades = Seq(20, 20, 20, 220, 220, 110, 110)
    val kept = Multimodal.keyframes(avi(shades), threshold = 0.25).get
    assert(kept.map(_._1) == Seq(0, 3, 5), s"kept ${kept.map(_._1)}")
  }

  test("a fully static clip yields exactly one keyframe") {
    val kept = Multimodal.keyframes(avi(Seq.fill(6)(128)), 0.25).get
    assert(kept.map(_._1) == Seq(0))
  }

  test("selectKeyframes: scene indices per media, stub for opaque bytes") {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val rows = Seq(
      Row(1L, avi(Seq(10, 10, 200, 200, 80))),
      Row(2L, Array.fill[Byte](700)(5)))
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val out = Multimodal.selectKeyframes(media).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(out.filter(_._1 == 1L).toSeq.sorted ==
      Seq((1L, 0, 0), (1L, 2, 1), (1L, 4, 2)))
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0, 0))) // declared stub
  }
}
