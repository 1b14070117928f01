package graft.spark.readstat.writers

import org.scalatest.funsuite.AnyFunSuite

import graft.core.sas.SasCore

/** The SASYZCRL encoder must be an exact inverse of the reader's
  * decompressor for EVERY row it claims to compress — byte-level fuzz
  * plus the chunk-boundary edges of each command family, and the
  * signature-safety invariant on the first stored byte.
  */
class RleEncoderSpec extends AnyFunSuite {

  private def roundtrip(row: Array[Byte], ctx: String): Unit = {
    val enc = SasBinaryWriter.rleEncode(row, 0, row.length)
    if (enc != null) {
      assert(enc.length < row.length, s"$ctx: not smaller")
      val dec = SasCore.Rle.decompress(enc, row.length)
      assert(java.util.Arrays.equals(dec, row), s"$ctx: decode mismatch")
      val f = enc(0) & 0xff
      assert(f != 0x00 && f < 0xF6,
        f"$ctx: first control byte 0x$f%02x aliases a signature head")
    }
  }

  test("random mixed rows decode back exactly (5000 trials)") {
    val rnd = new java.util.Random(0xBADC0DE)
    for (trial <- 0 until 5000) {
      val len = 1 + rnd.nextInt(900)
      val row = new Array[Byte](len)
      var i = 0
      while (i < len) {
        rnd.nextInt(4) match {
          case 0 =>
            row(i) = rnd.nextInt(256).toByte; i += 1
          case 1 =>
            val b = rnd.nextInt(256).toByte
            var j = 1 + rnd.nextInt(40)
            while (j > 0 && i < len) { row(i) = b; i += 1; j -= 1 }
          case 2 =>
            val b = Seq(0x20, 0x00, 0x40)(rnd.nextInt(3)).toByte
            var j = 1 + rnd.nextInt(700)
            while (j > 0 && i < len) { row(i) = b; i += 1; j -= 1 }
          case _ =>
            // signature-ish prefixes land mid-row too
            val sig = Seq(0xF7, 0xF6, 0xFD, 0xFF, 0xFC, 0xFE)(rnd.nextInt(6)).toByte
            var j = 1 + rnd.nextInt(8)
            while (j > 0 && i < len) { row(i) = sig; i += 1; j -= 1 }
        }
      }
      roundtrip(row, s"trial $trial")
    }
  }

  test("fill-command chunk boundaries for every fill family") {
    for (b <- Seq(0x20.toByte, 0x00.toByte, 0x40.toByte, 0x41.toByte, 0xF7.toByte);
         n <- Seq(2, 3, 4, 16, 17, 18, 19, 4111, 4112, 4113, 4114, 4129,
           4130, 8224, 8226, 12000)) {
      roundtrip(Array.fill[Byte](n)(b), s"fill b=$b n=$n")
    }
  }

  test("literal chunk boundaries survive (incompressible head + long tail run)") {
    val rnd = new java.util.Random(7)
    for (lit <- Seq(1, 15, 16, 17, 32, 33, 48, 49, 64, 65, 100, 4158, 4159, 4160, 5000)) {
      val head = new Array[Byte](lit)
      rnd.nextBytes(head)
      // tail run makes the whole row compressible so enc != null
      val row = head ++ Array.fill[Byte](lit + 64)(0x20)
      roundtrip(row, s"lit=$lit")
    }
  }

  test("signature-headed compressible rows re-encode with a safe first byte") {
    // rows BEGINNING with runs of signature bytes force the re-encode
    // path: a leading 1-byte literal keeps the head out of the
    // signature space while still decoding exactly
    for (sig <- Seq(0xF7, 0xF6, 0xFD, 0xFF, 0xFC, 0xFE, 0x00)) {
      val row = Array.fill[Byte](64)(sig.toByte) ++
        Array.fill[Byte](64)(0x20.toByte)
      val enc = SasBinaryWriter.rleEncode(row, 0, row.length)
      assert(enc != null, f"sig 0x$sig%02x should compress")
      roundtrip(row, f"sig 0x$sig%02x")
    }
  }

  test("rle page geometry reserves the raw-row subheader pointer slot") {
    // rowLen in (pageLen-64, pageLen-40]: plain pages fit the fixed row
    // but an rle raw-stored row also needs its 3*8-byte pointer — the
    // rle geometry must bump the page rather than fail at addRow
    for (rowLen <- Seq(65473, 65480, 65496)) {
      val (plainLen, rpp) = SasBinaryWriter.pageGeometry(rowLen)
      assert(plainLen == 65536 && rpp == 1, s"plain rowLen=$rowLen")
      val (rleLen, _) = SasBinaryWriter.pageGeometry(rowLen, rle = true)
      assert(rleLen - rowLen >= 32 + 8 + 3 * 8, s"rle rowLen=$rowLen")
    }
    // below the window both modes agree
    assert(SasBinaryWriter.pageGeometry(65472, rle = true)._1 == 65536)
    assert(SasBinaryWriter.pageGeometry(1000) ==
      SasBinaryWriter.pageGeometry(1000, rle = true))
  }
}
