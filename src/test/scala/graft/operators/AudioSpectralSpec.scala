package graft.operators

import graft.readstat.SparkTestBase

/** Pins the pure-JVM spectral path: the radix-2 FFT against a naive
  * DFT, mel-band localization of a synthesized tone, and the batch
  * extraction op's schema/dispatch.
  */
class AudioSpectralSpec extends SparkTestBase {

  import spark.implicits._

  private def naiveDft(x: Array[Double]): (Array[Double], Array[Double]) = {
    val n = x.length
    val re = new Array[Double](n)
    val im = new Array[Double](n)
    for (k <- 0 until n; t <- 0 until n) {
      val ang = -2.0 * math.Pi * k * t / n
      re(k) += x(t) * math.cos(ang)
      im(k) += x(t) * math.sin(ang)
    }
    (re, im)
  }

  private def sineWav(freqHz: Double, sr: Float = 8000f,
      seconds: Double = 0.5): Array[Byte] = {
    val n = (sr * seconds).toInt
    val pcm = new Array[Byte](2 * n)
    (0 until n).foreach { i =>
      val s = (math.sin(2.0 * math.Pi * freqHz * i / sr) * 12000).toShort
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(sr, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("fft matches a naive DFT") {
    // deterministic pseudo-random signal (LCG), n = 256
    val n = 256
    var seed = 12345L
    val x = Array.fill(n) {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (seed >>> 40).toDouble / (1L << 24).toDouble - 0.5
    }
    val (er, ei) = naiveDft(x)
    val re = x.clone()
    val im = new Array[Double](n)
    Multimodal.fft(re, im)
    (0 until n).foreach { k =>
      assert(math.abs(re(k) - er(k)) < 1e-9, s"re[$k]")
      assert(math.abs(im(k) - ei(k)) < 1e-9, s"im[$k]")
    }
  }

  test("log-mel energies peak in the band containing a pure tone") {
    val nMels = 26
    val sr = 8000.0
    def hzToMel(f: Double) = 2595.0 * math.log10(1.0 + f / 700.0)
    def bandOf(freq: Double): Int = {
      // band m spans mel points m..m+2 of nMels+2 equally spaced points
      val lo = hzToMel(0.0); val hi = hzToMel(sr / 2.0)
      val m = (hzToMel(freq) - lo) / (hi - lo) * (nMels + 1)
      math.min(nMels - 1, math.max(0, math.round(m).toInt - 1))
    }
    for (tone <- Seq(500.0, 1000.0, 2500.0)) {
      val mel = Multimodal.audioLogMel(sineWav(tone), nMels = nMels).get
      assert(mel.length == 2 * nMels)
      val means = mel.take(nMels)
      val arg = means.indices.maxBy(means(_))
      val expected = bandOf(tone)
      assert(math.abs(arg - expected) <= 1,
        s"tone $tone Hz: argmax band $arg, expected ~$expected")
    }
  }

  test("tones are separable by their mel features, steady tone has low stddev") {
    val a = Multimodal.audioLogMel(sineWav(500.0)).get
    val b = Multimodal.audioLogMel(sineWav(2500.0)).get
    assert(!a.sameElements(b))
    // a steady tone's per-band log energies barely move across frames
    val stds = a.drop(26)
    assert(stds.forall(_ < 1.5), s"stddev too high for a steady tone: ${stds.max}")
  }

  test("batch extraction: audio rows get 2*nMels features, others null") {
    val wav = sineWav(1000.0)
    val media = Seq(
      (1L, "audio/wav", wav),
      (2L, "text/plain", "not audio at all".getBytes("UTF-8")))
      .toDF("media_id", "media_type", "payload")
    val out = Multimodal.extractMelFeatures(media)
      .collect().map(r => r.getLong(0) -> Option(r.get(2))).toMap
    assert(out(1L).get.asInstanceOf[scala.collection.Seq[Float]].size == 52)
    assert(out(2L).isEmpty)
  }

  test("too-short and corrupt payloads yield None, not exceptions") {
    assert(Multimodal.audioLogMel(sineWav(440.0, seconds = 0.01)).isEmpty)
    assert(Multimodal.audioLogMel(Array[Byte](1, 2, 3)).isEmpty)
    val riffJunk = "RIFFxxxxWAVEjunk".getBytes("UTF-8")
    assert(Multimodal.audioLogMel(riffJunk).isEmpty)
  }
}
