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

  /** STUB decode for payloads no JDK codec accepts (video containers,
    * raw text bytes): a real implementation would hand them to an
    * external codec. The deterministic fake derives an 8-dim "feature"
    * from the payload bytes so downstream plumbing (schemas, similarity
    * joins, aggregations) is exercised with stable values.
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

  private def magic(p: Array[Byte], at: Int, m: Int*): Boolean =
    p.length >= at + m.length && m.indices.forall(i => (p(at + i) & 0xff) == m(i))

  /** Cheap container sniff so the 100TB hot path never pays codec-probe
    * or exception cost on payloads that obviously aren't that medium. */
  def looksLikeImage(p: Array[Byte]): Boolean =
    magic(p, 0, 0x89, 'P', 'N', 'G') || magic(p, 0, 0xff, 0xd8) ||
      magic(p, 0, 'G', 'I', 'F', '8') || magic(p, 0, 'B', 'M')
  def looksLikeAudio(p: Array[Byte]): Boolean =
    magic(p, 0, 'R', 'I', 'F', 'F') || magic(p, 0, 'F', 'O', 'R', 'M') ||
      magic(p, 0, '.', 's', 'n', 'd')

  /** Real image features via javax.imageio: decode, then an 8-dim summary
    * (mean R/G/B, luma mean, luma stddev, width, height, aspect). */
  def imageFeatures(payload: Array[Byte]): Option[Array[Float]] = {
    if (!looksLikeImage(payload)) return None
    // a payload can pass the magic-byte sniff and still be truncated or
    // corrupt; one bad image must not fail the whole task, so decode
    // errors fall through to the stub like any other undecodable payload
    val img = try {
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    } catch { case _: Exception => return None }
    if (img == null) return None
    val w = img.getWidth; val h = img.getHeight
    var sr, sg, sb, sl, sl2 = 0.0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
        val luma = 0.299 * r + 0.587 * g + 0.114 * b
        sr += r; sg += g; sb += b; sl += luma; sl2 += luma * luma
        x += 1
      }
      y += 1
    }
    val n = (w.toLong * h).toDouble
    val lMean = sl / n
    Some(Array((sr / n).toFloat, (sg / n).toFloat, (sb / n).toFloat,
      lMean.toFloat, math.sqrt(math.max(0, sl2 / n - lMean * lMean)).toFloat,
      w.toFloat, h.toFloat, w.toFloat / h))
  }

  /** Real audio features via javax.sound.sampled (WAV/AIFF/AU): decode to
    * 16-bit PCM mono, then an 8-dim summary (rms, peak, zero-crossing
    * rate, mean, duration seconds, sample rate/1k, channels, frames/1M). */
  def audioFeatures(payload: Array[Byte]): Option[Array[Float]] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    if (!looksLikeAudio(payload)) return None
    val in = try {
      AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(payload))
    } catch { case _: Exception => return None }
    try {
      val src = in.getFormat
      val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        src.getSampleRate, 16, src.getChannels,
        2 * src.getChannels, src.getSampleRate, false)
      val pcm = AudioSystem.getAudioInputStream(fmt, in)
      val bytes = pcm.readAllBytes()
      val nCh = fmt.getChannels
      val nFrames = bytes.length / (2 * nCh)
      if (nFrames == 0) return None
      var sum, sum2, peak = 0.0
      var crossings = 0
      var prev = 0.0
      var f = 0
      while (f < nFrames) {
        // average channels to mono
        var acc = 0.0
        var c = 0
        while (c < nCh) {
          val i = (f * nCh + c) * 2
          acc += ((bytes(i) & 0xff) | (bytes(i + 1) << 8)).toShort / 32768.0
          c += 1
        }
        val s = acc / nCh
        sum += s; sum2 += s * s
        if (math.abs(s) > peak) peak = math.abs(s)
        if (f > 0 && (s > 0) != (prev > 0)) crossings += 1
        prev = s
        f += 1
      }
      Some(Array(math.sqrt(sum2 / nFrames).toFloat, peak.toFloat,
        crossings.toFloat / nFrames, (sum / nFrames).toFloat,
        (nFrames / fmt.getSampleRate), fmt.getSampleRate / 1000f,
        nCh.toFloat, nFrames / 1e6f))
    } catch { case _: Exception => None } finally in.close()
  }

  /** Decode any javax.sound-supported container (WAV/AIFF/AU) to mono
    * [-1, 1) samples + sample rate. Channel-averaged 16-bit PCM —
    * the same normalization [[audioFeatures]] applies. */
  private[operators] def decodeMono(payload: Array[Byte]): Option[(Array[Double], Float)] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    if (!looksLikeAudio(payload)) return None
    val in = try {
      AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(payload))
    } catch { case _: Exception => return None }
    try {
      val src = in.getFormat
      val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        src.getSampleRate, 16, src.getChannels,
        2 * src.getChannels, src.getSampleRate, false)
      val pcm = AudioSystem.getAudioInputStream(fmt, in)
      val bytes = pcm.readAllBytes()
      val nCh = fmt.getChannels
      val nFrames = bytes.length / (2 * nCh)
      if (nFrames == 0) return None
      val mono = new Array[Double](nFrames)
      var f = 0
      while (f < nFrames) {
        var acc = 0.0
        var c = 0
        while (c < nCh) {
          val i = (f * nCh + c) * 2
          acc += ((bytes(i) & 0xff) | (bytes(i + 1) << 8)).toShort / 32768.0
          c += 1
        }
        mono(f) = acc / nCh
        f += 1
      }
      Some((mono, fmt.getSampleRate))
    } catch { case _: Exception => None } finally in.close()
  }

  /** In-place iterative radix-2 Cooley–Tukey FFT (re/im parallel
    * arrays, length a power of two). Pure JVM — no codec or native
    * dependency — so spectral features stay inside the executor task. */
  private[operators] def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require((n & (n - 1)) == 0, s"fft length must be a power of two, got $n")
    // bit-reversal permutation
    var i = 1
    var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang)
      val wi = math.sin(ang)
      var blk = 0
      while (blk < n) {
        var cr = 1.0
        var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val ur = re(blk + k); val ui = im(blk + k)
          val vr0 = re(blk + k + len / 2); val vi0 = im(blk + k + len / 2)
          val vr = vr0 * cr - vi0 * ci
          val vi = vr0 * ci + vi0 * cr
          re(blk + k) = ur + vr; im(blk + k) = ui + vi
          re(blk + k + len / 2) = ur - vr; im(blk + k + len / 2) = ui - vi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr
          cr = ncr
          k += 1
        }
        blk += len
      }
      len <<= 1
    }
  }

  private def hzToMel(f: Double): Double = 2595.0 * math.log10(1.0 + f / 700.0)
  private def melToHz(m: Double): Double = 700.0 * (math.pow(10.0, m / 2595.0) - 1.0)

  /** Triangular mel filterbank (HTK scale): `nMels` filters over FFT
    * bins 0..nFft/2 at the given sample rate. Returned as per-filter
    * (startBin, weights) so application is a tight dot product. */
  private[operators] def melFilters(nFft: Int, sr: Double, nMels: Int): Array[(Int, Array[Double])] = {
    val nBins = nFft / 2 + 1
    val melPts = {
      val lo = hzToMel(0.0); val hi = hzToMel(sr / 2.0)
      Array.tabulate(nMels + 2)(i => lo + (hi - lo) * i / (nMels + 1))
    }
    val binOf = melPts.map(m => melToHz(m) * nFft / sr)
    Array.tabulate(nMels) { m =>
      val (l, c, r) = (binOf(m), binOf(m + 1), binOf(m + 2))
      val from = math.max(0, math.ceil(l).toInt)
      val until = math.min(nBins - 1, math.floor(r).toInt)
      val w = (from to until).map { b =>
        if (b <= c) (b - l) / math.max(c - l, 1e-12)
        else (r - b) / math.max(r - c, 1e-12)
      }.map(math.max(_, 0.0)).toArray
      (from, w)
    }
  }

  /** Clip-level log-mel features: Hann-windowed `nFft` frames at `hop`,
    * power spectrum via [[fft]], `nMels` triangular mel bands, log
    * energies averaged over time — 2×nMels floats (per-band mean and
    * stddev), the standard clip embedding a speech/audio curation
    * pipeline computes before clustering or quality filtering. Returns
    * None for payloads javax.sound cannot decode or clips shorter than
    * one frame. */
  def audioLogMel(payload: Array[Byte], nFft: Int = 512, hop: Int = 256,
      nMels: Int = 26): Option[Array[Float]] = {
    decodeMono(payload).flatMap { case (mono, sr) =>
      if (mono.length < nFft) None
      else {
        val window = Array.tabulate(nFft)(i =>
          0.5 - 0.5 * math.cos(2.0 * math.Pi * i / (nFft - 1)))
        val filters = melFilters(nFft, sr, nMels)
        val nFrames = (mono.length - nFft) / hop + 1
        val sum = new Array[Double](nMels)
        val sum2 = new Array[Double](nMels)
        val re = new Array[Double](nFft)
        val im = new Array[Double](nFft)
        var f = 0
        while (f < nFrames) {
          var i = 0
          while (i < nFft) {
            re(i) = mono(f * hop + i) * window(i); im(i) = 0.0
            i += 1
          }
          fft(re, im)
          var m = 0
          while (m < nMels) {
            val (from, w) = filters(m)
            var acc = 0.0
            var k = 0
            while (k < w.length) {
              val b = from + k
              acc += (re(b) * re(b) + im(b) * im(b)) * w(k)
              k += 1
            }
            val logE = math.log(acc + 1e-10)
            sum(m) += logE; sum2(m) += logE * logE
            m += 1
          }
          f += 1
        }
        val out = new Array[Float](2 * nMels)
        var m = 0
        while (m < nMels) {
          val mean = sum(m) / nFrames
          out(m) = mean.toFloat
          out(nMels + m) = math.sqrt(math.max(0.0, sum2(m) / nFrames - mean * mean)).toFloat
          m += 1
        }
        Some(out)
      }
    }
  }

  /** Batch log-mel extraction over a media frame — same mapPartitions
    * batch shape as [[extractFeatures]]; non-audio payloads yield null
    * features rather than a stub (a spectral fake would poison any
    * downstream clustering). */
  def extractMelFeatures(media: DataFrame, nFft: Int = 512, hop: Int = 256,
      nMels: Int = 26): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_mel", IntegerType),
      StructField("mel", ArrayType(FloatType))))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    media.select("media_id", "payload")
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          audioLogMel(payload, nFft, hop, nMels) match {
            case Some(feat) => Row(id, nMels, feat.toSeq)
            case None => Row(id, 0, null)
          }
        }
      }(enc)
  }

  /** Batch feature extraction over the media frame: mapPartitions keeps
    * each task's working set to one partition of payloads (the Scala
    * analog of `mapInPandas` batch processing). Images and audio decode
    * with the real JDK codecs; payloads neither accepts (video, opaque
    * bytes) get the declared deterministic stub. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    media.select("media_id", "media_type", "payload")
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val mtype = r.getString(1)
          val payload = r.getAs[Array[Byte]](2)
          val feat = imageFeatures(payload)
            .orElse(audioFeatures(payload))
            .getOrElse(stubDecode(payload))
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
    if (!looksLikeImage(payload)) return None
    try {
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
    } catch { case _: Exception => None } // truncated/corrupt image → stub path
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

  /** Decode every k-th frame of an animated GIF via the JDK's ImageIO
    * multi-image reader (the one multi-frame container the JDK can
    * demux), re-encoded as PNG. Returns None when the payload is not a
    * GIF or fails to decode. */
  def gifFrames(payload: Array[Byte], everyK: Int): Option[Seq[(Int, Array[Byte])]] = {
    if (!magic(payload, 0, 'G', 'I', 'F', '8')) return None
    var stream: javax.imageio.stream.ImageInputStream = null
    try {
      stream = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      val readers = javax.imageio.ImageIO.getImageReaders(stream)
      if (!readers.hasNext) return None
      val reader = readers.next()
      reader.setInput(stream)
      val n = reader.getNumImages(true)
      val out = Iterator.range(0, n, everyK).map { i =>
        val img = reader.read(i)
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        (i, bos.toByteArray)
      }.toSeq
      reader.dispose()
      Some(out)
    } catch { case _: Exception => None
    } finally if (stream != null) stream.close()
  }

  /** Demux an MJPEG AVI (RIFF container, '00dc'/'00db' chunks holding
    * one JPEG per frame) with a pure-JVM chunk walk, decoding every k-th
    * frame through ImageIO and re-encoding as PNG — the same output
    * contract as [[gifFrames]]. RIFF is a length-prefixed chunk format
    * (fourcc + u32le size, even-padded; LIST chunks nest), so the walk
    * needs no codec beyond the JPEG decoder the JDK ships. Returns None
    * for non-AVI payloads, AVIs whose frames aren't JPEGs (compressed
    * codecs genuinely need native libs — those stay stubbed), or any
    * structural corruption. */
  def aviMjpegFrames(payload: Array[Byte], everyK: Int): Option[Seq[(Int, Array[Byte])]] = {
    if (payload.length < 12 ||
      !magic(payload, 0, 'R', 'I', 'F', 'F') ||
      !magic(payload, 8, 'A', 'V', 'I', ' ')) return None
    try {
      def u32(at: Int): Long =
        (payload(at) & 0xffL) | ((payload(at + 1) & 0xffL) << 8) |
          ((payload(at + 2) & 0xffL) << 16) | ((payload(at + 3) & 0xffL) << 24)
      val frames = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
      def walk(from: Int, until: Int): Unit = {
        var p = from
        while (p + 8 <= until) {
          val size = u32(p + 4)
          if (size < 0 || p + 8 + size > until) return
          val end = p + 8 + size.toInt
          if (magic(payload, p, 'L', 'I', 'S', 'T')) {
            walk(p + 12, end) // skip the 4-byte list type, recurse
          } else if ((magic(payload, p, '0', '0', 'd', 'c') ||
              magic(payload, p, '0', '0', 'd', 'b')) && size > 0) {
            frames += java.util.Arrays.copyOfRange(payload, p + 8, end)
          }
          p = end + (size.toInt & 1) // chunks are even-padded
        }
      }
      walk(12, math.min(payload.length, 8 + u32(4).toInt))
      if (frames.isEmpty) return None
      val out = Iterator.range(0, frames.length, everyK).map { i =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(frames(i)))
        if (img == null) return None // non-JPEG frames → declared stub
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        (i, bos.toByteArray)
      }.toSeq
      Some(out)
    } catch { case _: Exception => None }
  }

  /** Frame sampling: animated GIFs demux through the JDK codec and MJPEG
    * AVIs through the pure-JVM RIFF walk (every k-th frame,
    * PNG-encoded); payloads neither path can demux (compressed video
    * codecs — no decoder in the JDK) fall back to the declared STUB that
    * slices fixed-size frame slots. Either way the output is one row per
    * sampled frame — the real explode shape a video pipeline needs
    * (frame count scales with payload size, not row count). */
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
          gifFrames(payload, everyK).orElse(aviMjpegFrames(payload, everyK)) match {
            case Some(frames) =>
              frames.iterator.map { case (i, png) => Row(id, i, png) }
            case None =>
              val nFrames = math.max(1, payload.length / frameSize)
              Iterator.range(0, nFrames, everyK).map { f =>
                val from = f * frameSize
                val until = math.min(payload.length, from + frameSize)
                Row(id, f, java.util.Arrays.copyOfRange(payload, from, until))
              }
          }
        }
      }(enc)
  }

  /** DCT perceptual hash (pHash) of an image payload: decode via the real
    * JDK codec, average-pool the luma plane to 32×32 (pure pixel math —
    * no Graphics2D rendering, whose interpolation is implementation-
    * defined), 2-D DCT-II, then one bit per coefficient of the top-left
    * 8×8 low-frequency block: set iff the coefficient exceeds the
    * block's mean (DC excluded from the mean — it only encodes overall
    * brightness). Re-encodes, resizes, small edits, and brightness
    * shifts move few bits; structurally different images differ in
    * ~half — the classic image near-dup signal, and the multimodal
    * counterpart of [[SimHash]] for text.
    *
    * None for payloads ImageIO cannot decode (same contract as
    * [[imageFeatures]]). */
  def imagePhash(payload: Array[Byte]): Option[Long] = {
    if (!looksLikeImage(payload)) return None
    val img = try {
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    } catch { case _: Exception => return None }
    if (img == null) return None
    val w = img.getWidth; val h = img.getHeight
    if (w == 0 || h == 0) return None
    val n = 32
    // average-pool luma into an n×n grid: each cell averages its exact
    // pixel rectangle (deterministic across JDKs, unlike Graphics2D)
    val grid = Array.ofDim[Double](n, n)
    var gy = 0
    while (gy < n) {
      val y0 = gy * h / n; val y1 = math.max((gy + 1) * h / n, y0 + 1)
      var gx = 0
      while (gx < n) {
        val x0 = gx * w / n; val x1 = math.max((gx + 1) * w / n, x0 + 1)
        var s = 0.0; var y = y0
        while (y < math.min(y1, h)) {
          var x = x0
          while (x < math.min(x1, w)) {
            val rgb = img.getRGB(x, y)
            s += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
              0.114 * (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        val cnt = (math.min(y1, h) - y0).toLong * (math.min(x1, w) - x0)
        grid(gy)(gx) = s / math.max(cnt, 1L)
        gx += 1
      }
      gy += 1
    }
    // separable 2-D DCT-II, direct form with a precomputed cosine table
    // (n = 32: ~65k multiplies, negligible next to the decode)
    val cosT = Array.tabulate(n, n)((k, i) =>
      math.cos((2 * i + 1) * k * math.Pi / (2.0 * n)))
    val tmp = Array.ofDim[Double](n, n)
    var k = 0
    while (k < n) { // DCT along rows
      var r = 0
      while (r < n) {
        var s = 0.0; var i = 0
        while (i < n) { s += grid(r)(i) * cosT(k)(i); i += 1 }
        tmp(r)(k) = s
        r += 1
      }
      k += 1
    }
    val dct = Array.ofDim[Double](8, 8) // only the low-frequency block
    var ky = 0
    while (ky < 8) { // DCT along columns, top-left 8×8 only
      var kx = 0
      while (kx < 8) {
        var s = 0.0; var i = 0
        while (i < n) { s += tmp(i)(kx) * cosT(ky)(i); i += 1 }
        dct(ky)(kx) = s
        kx += 1
      }
      ky += 1
    }
    var mean = 0.0
    ky = 0
    while (ky < 8) {
      var kx = 0
      while (kx < 8) { if (ky != 0 || kx != 0) mean += dct(ky)(kx); kx += 1 }
      ky += 1
    }
    mean /= 63.0
    var bits = 0L; var bit = 0
    ky = 0
    while (ky < 8) {
      var kx = 0
      while (kx < 8) {
        if (dct(ky)(kx) > mean) bits |= (1L << bit)
        bit += 1; kx += 1
      }
      ky += 1
    }
    Some(bits)
  }

  /** Image near-duplicate pairs by pHash Hamming distance ≤ `maxDist`.
    *
    * Scale shape: the [[SimHash]] banding argument, applied to images —
    * the 64-bit hash splits into 8 disjoint 8-bit bands, and any pair
    * within Hamming distance 7 (so any `maxDist` ≤ 7) agrees on at
    * least one band by pigeonhole. Candidates come from 8 band-keyed
    * equi-joins (hashes only — payloads never shuffle), distinct to one
    * row per pair, then exact verification with codegen'd
    * `bit_count(a ^ b)`. Hashing itself is one mapPartitions over the
    * payload partition — the corpus is touched once.
    */
  def phashPairs(media: DataFrame, maxDist: Int = 6): DataFrame = {
    require(maxDist >= 0 && maxDist <= 7,
      "banding guarantees recall only for maxDist <= 7")
    val spark = media.sparkSession
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("phash", LongType, nullable = false))))
    val hashes = media.select("media_id", "payload")
      .mapPartitions { it =>
        it.flatMap { r =>
          imagePhash(r.getAs[Array[Byte]](1)).map(hc => Row(r.getLong(0), hc))
        }
      }(enc)
    val banded = hashes.select(col("media_id"), col("phash"),
        explode(sequence(lit(0), lit(7))).as("band"))
      .withColumn("key", expr("shiftrightunsigned(phash, band * 8)")
        .bitwiseAND(lit(255L)))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
        col("a.phash").as("ha"), col("b.phash").as("hb"))
      .distinct()
    cand
      .withColumn("dist", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("dist") <= maxDist)
      .select("id_a", "id_b", "dist")
  }

  /** Content-aware keyframe selection over a demuxable video payload
    * (animated GIF via the JDK codec, MJPEG AVI via the RIFF walk): keep
    * a frame iff its normalized 32-bin luma histogram moves more than
    * `threshold` (half-L1 distance ∈ [0,1]) from the LAST KEPT frame —
    * classic shot-boundary detection, and the content-aware complement
    * of [[sampleFrames]]'s fixed-stride sampling: a static scene yields
    * one frame however long it lasts, a cut always yields one. The
    * first frame is always kept. None when no real demuxer accepts the
    * payload (callers fall back to stride sampling — nothing is faked). */
  def keyframes(payload: Array[Byte],
      threshold: Double = 0.25): Option[Seq[(Int, Array[Byte])]] = {
    require(threshold > 0 && threshold <= 1, "threshold in (0, 1]")
    gifFrames(payload, 1).orElse(aviMjpegFrames(payload, 1)).map { fs =>
      var lastKept: Array[Double] = null
      fs.flatMap { case (idx, png) =>
        val img = try {
          javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
        } catch { case _: Exception => null }
        if (img == null) None
        else {
          val hist = new Array[Double](32)
          val w = img.getWidth; val h = img.getHeight
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val luma = 0.299 * ((rgb >> 16) & 0xff) +
                0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
              hist(math.min(31, (luma / 8.0).toInt)) += 1.0
              x += 1
            }
            y += 1
          }
          val n = (w.toLong * h).toDouble
          var i = 0
          while (i < 32) { hist(i) /= n; i += 1 }
          val dist =
            if (lastKept == null) 1.0
            else {
              var s = 0.0; var j = 0
              while (j < 32) { s += math.abs(hist(j) - lastKept(j)); j += 1 }
              s / 2.0
            }
          if (dist > threshold) { lastKept = hist; Some((idx, png)) }
          else None
        }
      }
    }
  }

  /** Batch keyframe extraction: one row per kept frame, with the scene
    * index (position among kept frames). Payloads no demuxer accepts
    * contribute their stride-0 stub frame so the schema contract matches
    * [[sampleFrames]] — plumbing real, decode honesty preserved. */
  def selectKeyframes(media: DataFrame, threshold: Double = 0.25,
      frameSize: Int = 256): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("scene", IntegerType, nullable = false),
      StructField("frame", BinaryType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select("media_id", "payload")
      .mapPartitions { it =>
        it.flatMap { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          keyframes(payload, threshold) match {
            case Some(kept) =>
              kept.iterator.zipWithIndex.map { case ((i, png), scene) =>
                Row(id, i, scene, png)
              }
            case None =>
              val until = math.min(payload.length, frameSize)
              Iterator.single(
                Row(id, 0, 0, java.util.Arrays.copyOfRange(payload, 0, until)))
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
