package graft.core.sas

import java.io.RandomAccessFile

/** SAS .sas7bcat format-catalog reader: `format_name → {code → label}`.
  * Algorithm follows ReadStat's readstat_sas7bcat_read.c (public; also the
  * behavioral reference at src/sas/catalog.rs): XLSR index entries point
  * at chain-linked blocks, each block holds one format's value labels.
  */
object SasCatalog {

  final case class Catalog(
      numeric: Map[String, Map[Double, String]],
      string: Map[String, Map[String, String]])

  private val CatalogMagic: Array[Byte] = Array(
    0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00,
    0x00, 0x00, 0x00, 0x00, 0xc2, 0xea, 0x81, 0x63,
    0xb3, 0x14, 0x11, 0xcf, 0xbd, 0x92, 0x08, 0x00,
    0x09, 0xc7, 0x31, 0x8c, 0x18, 0x1f, 0x10, 0x11).map(_.toByte)

  def read(path: String): Catalog = {
    val raf = new RandomAccessFile(path, "r")
    try readWith(raf) finally raf.close()
  }

  private def readWith(raf: RandomAccessFile): Catalog = {
    import graft.core.Bin
    val hdr0 = new Array[Byte](288)
    raf.readFully(hdr0)
    val magic = hdr0.slice(0, 32)
    require(magic.sameElements(CatalogMagic) || magic.sameElements(SasCore.Magic),
      "not a sas7bcat file")
    val u64 = hdr0(32) == '3'
    val little = hdr0(37) == 0x01
    val pad1 = if (hdr0(35) == '3') 4 else 0
    val encodingByte = hdr0(70) & 0xff
    val cs = SasCore.charsetFor(encodingByte)
    val headerSize = Bin.i32(hdr0, 196 + pad1, little).toLong
    // in-file lengths size the allocations below — corrupt values must
    // throw, not allocate gigabytes
    require(headerSize >= 288 && headerSize <= raf.length(),
      s"corrupt sas7bcat: header size $headerSize outside [288, ${raf.length()}]")
    val hdr = new Array[Byte](math.max(288, headerSize.toInt))
    System.arraycopy(hdr0, 0, hdr, 0, 288)
    if (headerSize > 288) raf.readFully(hdr, 288, headerSize.toInt - 288)
    val pageSize = Bin.i32(hdr, 200 + pad1, little).toLong
    require(pageSize > 0 && pageSize <= raf.length(),
      s"corrupt sas7bcat: page size $pageSize outside (0, ${raf.length()}]")
    val pageCount = Bin.i32(hdr, 204 + pad1, little).toLong

    val xlsrSize = 212 + pad1 + (if (u64) 72 else 0)
    val xlsrOffset = 856 + 2 * pad1 + (if (u64) 144 else 0)
    val xlsrOOffset = 50 + pad1 + (if (u64) 24 else 0)

    def decode(b: Array[Byte], off: Int, len: Int): String = {
      var e = off + len
      while (e > off && (b(e - 1) == 0 || b(e - 1) == ' ')) e -= 1
      new String(b, off, e - off, cs).trim
    }

    val pointers = scala.collection.mutable.SortedSet[Long]()
    val page = new Array[Byte](pageSize.toInt)

    def augment(start0: Int): Unit = {
      var off = start0
      var done = false
      while (!done && off + xlsrSize <= page.length) {
        if (off + 4 > page.length ||
            !(page(off) == 'X' && page(off + 1) == 'L' && page(off + 2) == 'S' && page(off + 3) == 'R')) {
          off += 8
          if (off + 4 > page.length ||
              !(page(off) == 'X' && page(off + 1) == 'L' && page(off + 2) == 'S' && page(off + 3) == 'R')) {
            done = true
          }
        }
        if (!done) {
          if (off + xlsrOOffset >= page.length) done = true
          else {
            if (page(off + xlsrOOffset) == 'O') {
              val (pageNum, pos) =
                if (u64) (Bin.i64(page, off + 8, little), Bin.u16(page, off + 16, little).toLong)
                else (Bin.u32(page, off + 4, little), Bin.u16(page, off + 8, little).toLong)
              if (pageNum > 0 && pos > 0) pointers += (pageNum << 32) | pos
            }
            off += xlsrSize
          }
        }
      }
    }

    // pass 1a: index page 1
    raf.seek(headerSize + 1 * pageSize)
    raf.readFully(page)
    if (xlsrOffset < page.length) augment(xlsrOffset)
    // pass 1b: pages ≥3 that start with XLSR at byte 16
    var i = 3L
    while (i < pageCount) {
      raf.seek(headerSize + i * pageSize)
      raf.readFully(page)
      if (page.length >= 20 && page(16) == 'X' && page(17) == 'L' &&
          page(18) == 'S' && page(19) == 'R') augment(16)
      i += 1
    }

    def readBlock(startPage: Long, startPos: Int): Array[Byte] = {
      val chainHdrLen = if (u64) 32 else 16
      var nextPage = startPage
      var nextPos = startPos.toLong
      val out = new java.io.ByteArrayOutputStream()
      var links = 0L
      // bound chain length by the pages the FILE can hold, not the
      // header's pageCount: a corrupt count plus a cyclic chain would
      // otherwise accumulate 64 KiB per lap until OOM
      val maxLinks = math.min(pageCount, raf.length() / pageSize + 1)
      val chainHdr = new Array[Byte](chainHdrLen)
      while (nextPage > 0 && nextPos > 0 && nextPage <= pageCount && links < maxLinks) {
        raf.seek(headerSize + (nextPage - 1) * pageSize + nextPos)
        raf.readFully(chainHdr)
        val (np, npp, ll) =
          if (u64) (Bin.u32(chainHdr, 0, little), Bin.u16(chainHdr, 8, little).toLong,
            Bin.u16(chainHdr, 10, little))
          else (Bin.u32(chainHdr, 0, little), Bin.u16(chainHdr, 4, little).toLong,
            Bin.u16(chainHdr, 6, little))
        if (ll > 0) {
          val b = new Array[Byte](ll)
          raf.readFully(b)
          out.write(b)
        }
        nextPage = np; nextPos = npp; links += 1
      }
      out.toByteArray
    }

    val numeric = scala.collection.mutable.Map[String, Map[Double, String]]()
    val string = scala.collection.mutable.Map[String, Map[String, String]]()

    pointers.foreach { bp =>
      val startPage = bp >>> 32
      val startPos = (bp & 0xFFFF).toInt
      try {
        val data = readBlock(startPage, startPos)
        if (data.length >= 106) {
          val flags = Bin.u16(data, 2, little)
          val localPadBase = if ((flags & 0x08) != 0) 4 else 0
          val (cap, used) =
            if (u64) (Bin.i64(data, 42 + localPadBase, little), Bin.i64(data, 50 + localPadBase, little))
            else (Bin.u32(data, 38 + localPadBase, little), Bin.u32(data, 42 + localPadBase, little))
          var name = decode(data, 8, math.min(8, data.length - 8))
          val payloadOff = 106 + (if (u64) 32 else 0)
          var effPad = if (localPadBase > 0) localPadBase + 16 else 0
          val hasLong = if (u64) (flags & 0x20) != 0 else (flags & 0x80) != 0
          if (hasLong && payloadOff + effPad + 32 <= data.length) {
            name = decode(data, payloadOff + effPad, 32)
            effPad += 32
          }
          if (used > 0 && payloadOff + effPad < data.length) {
            val isString = name.startsWith("$")
            val payload = java.util.Arrays.copyOfRange(data, payloadOff + effPad, data.length)
            val labels = parseValueLabels(payload, used.toInt, cap.toInt,
              isString, little, pad1, cs)
            if (labels.nonEmpty) {
              val norm = name.reverse.dropWhile(_ == '.').reverse.toUpperCase
              if (isString)
                string(norm) = string.getOrElse(norm, Map.empty) ++
                  labels.collect { case (Left(s), l) => s -> l }
              else
                numeric(norm) = numeric.getOrElse(norm, Map.empty) ++
                  labels.collect { case (Right(d), l) => d -> l }
            }
          }
        }
      } catch { case _: Exception => } // skip malformed blocks
    }

    Catalog(numeric.toMap, string.toMap)
  }

  private def parseValueLabels(payload: Array[Byte], used: Int, cap: Int,
      isString: Boolean, little: Boolean, pad1: Int,
      cs: java.nio.charset.Charset): Seq[(Either[String, Double], String)] = {
    import graft.core.Bin
    if (payload.isEmpty || cap == 0 || used == 0) return Nil
    val valueOffsets = new Array[Int](used)
    var vpos = 0
    var i = 0
    var stop = false
    while (i < cap && !stop) {
      if (vpos + 4 > payload.length) stop = true
      else {
        val entryLen = 6 + Bin.u16(payload, vpos + 2, little)
        if (i < used) {
          val lpOff = vpos + 10 + pad1
          if (lpOff + 4 <= payload.length) {
            val labelPos = Bin.i32(payload, lpOff, little)
            if (labelPos >= 0 && labelPos < used) valueOffsets(labelPos) = vpos
          }
        }
        vpos += entryLen
        if (vpos > payload.length) stop = true
      }
      i += 1
    }
    var lpos = vpos
    val out = Seq.newBuilder[(Either[String, Double], String)]
    var j = 0
    while (j < used && lpos + 10 <= payload.length) {
      val voff = valueOffsets(j)
      var skip = false
      var key: Either[String, Double] = null
      if (isString) {
        if (voff + 4 > payload.length) return out.result()
        val entryLen = 6 + Bin.u16(payload, voff + 2, little)
        if (entryLen < 16 || voff + entryLen > payload.length) return out.result()
        key = Left(new String(payload, voff + entryLen - 16, 16, cs).trim)
      } else {
        if (voff + 30 > payload.length) return out.result()
        // the stored double is big-endian and negated
        val bits = Bin.i64(payload, voff + 22, little = false)
        if ((bits | 0xFF0000000000L) == 0xFFFFFFFFFFFFL) skip = true
        else key = Right(java.lang.Double.longBitsToDouble(bits) * -1.0)
      }
      val lblLen = Bin.u16(payload, lpos + 8, little)
      if (lpos + 10 + lblLen > payload.length) return out.result()
      if (!skip) {
        val lbl = {
          var e = lpos + 10 + lblLen
          while (e > lpos + 10 && (payload(e - 1) == 0 || payload(e - 1) == ' ')) e -= 1
          new String(payload, lpos + 10, e - (lpos + 10), cs)
        }
        out += key -> lbl
      }
      lpos += 10 + lblLen + 1
      j += 1
    }
    out.result()
  }
}
