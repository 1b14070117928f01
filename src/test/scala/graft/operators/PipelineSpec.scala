package graft.operators

import graft.readstat.SparkTestBase
import org.apache.spark.sql.functions._

/** LLM-pipeline operators: LSH recall vs exact baselines, simhash
  * determinism, langid accuracy on real multilingual samples, multimodal
  * plumbing.
  */
class PipelineSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.01"
  private def docs = spark.read.parquet(s"$sf/documents.parquet")
  private def embs = spark.read.parquet(s"$sf/embeddings.parquet")

  test("minhash-lsh near-dups are a subset of exact jaccard pairs, high recall at high threshold") {
    import spark.implicits._
    // corpus with planted near-duplicates
    val base = docs.limit(100).select($"doc_id", $"text")
    val dups = base.filter($"doc_id" < 10)
      .select(($"doc_id" + 100000).as("doc_id"),
        concat($"text", lit(" extra token")).as("text"))
    val corpus = base.unionAll(dups).cache()

    val lsh = MinHashLsh.nearDupPairs(corpus, "doc_id", "text", threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact pairs at the same threshold via the oracle-checked formulation
    val sh = MinHashLsh.shingles(corpus, "doc_id", "text")
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val exact = sh.as("a").join(sh.as("b"),
        $"a.shingle" === $"b.shingle" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"))
      .agg(count(lit(1)).as("ni"))
      .join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("n", "na"), "id_a")
      .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("n", "nb"), "id_b")
      .filter($"ni" / ($"na" + $"nb" - $"ni") >= 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(exact.nonEmpty, "expected planted near-dup pairs")
    assert(lsh.subsetOf(exact), "LSH pairs must be verified-exact pairs")
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall (${lsh.size}/${exact.size})")
  }

  test("simhash: identical docs get identical hashes; near-dups within small hamming") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "alpha beta gamma delta epsilon zeta eta iota"),
      (4L, "totally different words entirely unrelated content here now")
    ).toDF("doc_id", "text")
    val sig = SimHash.simhash(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(1L) == sig(2L))
    assert(java.lang.Long.bitCount(sig(1L) ^ sig(3L)) <= 16)
    assert(java.lang.Long.bitCount(sig(1L) ^ sig(4L)) > 10)
    // banded blocking guarantees recall only within Hamming <= bands-1 = 3
    val pairs = SimHash.nearDupPairs(
      SimHash.simhash(df, "doc_id", "text"), "doc_id", maxDistance = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"identical docs must pair: $pairs")
    assert(!pairs.contains((1L, 4L)))
  }

  test("ann-lsh recall vs brute force") {
    import spark.implicits._
    val exact = graft.queries.Similarity.annBruteForce(spark, sf)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = graft.queries.Pipeline.annLsh(spark, sf)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    // random-hyperplane LSH with 16 bits / 4 bands on random gaussian
    // vectors: recall is modest by construction; assert it beats chance
    // by a wide margin (chance ≈ k/corpus = 5/500 = 1%)
    assert(recall >= 0.3, s"ANN recall $recall")
  }

  test("langid identifies real multilingual samples") {
    import spark.implicits._
    val samples = Seq(
      ("en", "the cat was sitting on the mat and it was happy with this"),
      ("es", "el perro está en la casa y no quiere salir por la lluvia"),
      ("de", "der hund ist nicht in dem haus und ich bin mit der katze"),
      ("fr", "le chat est dans la maison et il ne veut pas sortir avec"),
      ("zh", "这是一个中文句子用于测试语言识别功能")
    ).toDF("expected", "text")
    val got = LangId.withLanguage(samples, "text")
      .filter($"expected" === $"lang_pred").count()
    assert(got == 5, s"langid got $got/5 correct")
  }

  test("ann-ivf recall vs brute force") {
    val exact = graft.queries.Similarity.annBruteForce(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = graft.queries.Similarity.annIvfTopK(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    info(s"ivf recall@5 = $recall")
    // 4 of 16 cells probed; near neighbors concentrate in the query's
    // cell, so recall should be well above the 25% corpus fraction
    assert(recall >= 0.5, s"recall $recall")
  }

  test("connected components collapse near-dup pairs into clusters") {
    import spark.implicits._
    // two chains (diameter > 1 forces multiple propagation rounds),
    // one triangle, one isolated pair
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),       // chain -> comp 1
      (10L, 11L), (11L, 12L), (10L, 12L), // triangle -> comp 10
      (20L, 21L),                         // pair -> comp 20
      (30L, 31L), (31L, 32L), (32L, 33L), (33L, 34L) // longer chain -> 30
    ).toDF("a", "b")
    // both plan choices must agree: driver-local union-find (small side
    // of the cost switch) and the distributed hash-min loop (forced via
    // a zero threshold)
    for (threshold <- Seq(5000000L, 0L)) {
      val comp = Graph.connectedComponents(edges, "a", "b",
          localEdgeThreshold = threshold)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(Seq(1L, 2L, 3L, 4L).forall(comp(_) == 1L), s"t=$threshold")
      assert(Seq(10L, 11L, 12L).forall(comp(_) == 10L), s"t=$threshold")
      assert(Seq(20L, 21L).forall(comp(_) == 20L), s"t=$threshold")
      assert(Seq(30L, 31L, 32L, 33L, 34L).forall(comp(_) == 30L), s"t=$threshold")
      assert(comp.size == 14, s"t=$threshold")
    }
  }

  test("multimodal feature extraction is deterministic and schema-stable") {
    val media = Multimodal.mediaFromDocuments(docs.limit(50))
    val f1 = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    val f2 = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    assert(f1.length == 50)
    assert(f1.map(_.getString(3)).toSeq == f2.map(_.getString(3)).toSeq)
    assert(f1(0).getSeq[Float](4).length == 8)
  }

  test("multimodal resize rewrites payload + meta deterministically") {
    val media = Multimodal.mediaFromDocuments(docs.limit(20))
    val resized = Multimodal.resizeImages(media, w = 16, h = 16)
      .orderBy("media_id").collect()
    assert(resized.length == 20)
    resized.foreach { r =>
      val meta = r.getStruct(3)
      val payload = r.getAs[Array[Byte]](2)
      assert(meta.getInt(0) == payload.length)
      assert(meta.getInt(2) == 16 && meta.getInt(3) == 16)
      assert(payload.length <= 16 * 16 / 8)
    }
    val again = Multimodal.resizeImages(media, w = 16, h = 16)
      .orderBy("media_id").collect()
    assert(resized.map(_.getAs[Array[Byte]](2).toSeq).toSeq ==
      again.map(_.getAs[Array[Byte]](2).toSeq).toSeq)
  }

  test("real PNG payloads decode, resize and re-encode with correct dims") {
    import spark.implicits._
    // build real PNGs with the JDK encoder: 64x48 gradient per id
    def png(id: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        64, 48, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 64; y <- 0 until 48)
        img.setRGB(x, y, (x * 4 << 16) | (y * 5 << 8) | (id * 37 & 0xff))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val media = (1 to 5).map(i => (i.toLong, "image/png", png(i)))
      .toDF("media_id", "media_type", "payload")
    val out = Multimodal.resizeImages(media, w = 16, h = 12)
      .orderBy("media_id").collect()
    assert(out.length == 5)
    out.foreach { r =>
      val meta = r.getStruct(3)
      assert(meta.getString(1) == "png") // real codec path, not the stub
      val back = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](2)))
      assert(back.getWidth == 16 && back.getHeight == 12)
    }
    // undecodable payloads still fall back to the declared stub
    val junk = Seq((9L, "video/mp4", Array.fill[Byte](500)(7)))
      .toDF("media_id", "media_type", "payload")
    val j = Multimodal.resizeImages(junk, w = 16, h = 12).collect()(0)
    assert(j.getStruct(3).getString(1) == "raw")
  }

  test("real WAV and PNG payloads produce real codec features") {
    import spark.implicits._
    // 0.5s 440Hz sine at amplitude 0.5, 8kHz mono 16-bit WAV
    val sr = 8000
    val n = sr / 2
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val s = (0.5 * math.sin(2 * math.Pi * 440 * i / sr) * 32767).toInt
      pcm(2 * i) = (s & 0xff).toByte; pcm(2 * i + 1) = (s >> 8).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(sr.toFloat, 16, 1, true, false)
    val wavBos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, wavBos)
    val wav = wavBos.toByteArray

    val af = Multimodal.audioFeatures(wav).get
    // sine rms = amp/sqrt(2) ~ 0.354; duration 0.5s; sr 8k
    assert(math.abs(af(0) - 0.3536f) < 0.01, s"rms ${af(0)}")
    assert(math.abs(af(1) - 0.5f) < 0.01, s"peak ${af(1)}")
    assert(math.abs(af(4) - 0.5f) < 0.01, s"duration ${af(4)}")
    assert(af(5) == 8.0f && af(6) == 1.0f)

    // solid-color PNG: channel means are exact
    val img = new java.awt.image.BufferedImage(
      10, 20, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 10; y <- 0 until 20) img.setRGB(x, y, (200 << 16) | (100 << 8) | 50)
    val pngBos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", pngBos)
    val imf = Multimodal.imageFeatures(pngBos.toByteArray).get
    assert(imf(0) == 200f && imf(1) == 100f && imf(2) == 50f)
    assert(imf(4) == 0f) // solid color -> zero luma stddev
    assert(imf(5) == 10f && imf(6) == 20f)

    // extractFeatures dispatches: wav -> audio path, png -> image path,
    // junk -> stub (8-dim either way, schema stable)
    val media = Seq(
      (1L, "audio/wav", wav),
      (2L, "image/png", pngBos.toByteArray),
      (3L, "video/mp4", Array.fill[Byte](100)(9)))
      .toDF("media_id", "media_type", "payload")
    val feats = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    assert(feats.length == 3)
    assert(math.abs(feats(0).getSeq[Float](4).head - 0.3536f) < 0.01)
    assert(feats(1).getSeq[Float](4).head == 200f)
    assert(feats.forall(_.getSeq[Float](4).length == 8))
  }

  test("multimodal frame sampling emits every k-th fixed-size slice") {
    val media = Multimodal.mediaFromDocuments(docs.limit(10))
    val frames = Multimodal.sampleFrames(media, everyK = 2, frameSize = 64)
      .collect()
    val byId = frames.groupBy(_.getLong(0))
    assert(byId.size == 10)
    byId.foreach { case (_, fs) =>
      val idxs = fs.map(_.getInt(1)).sorted.toSeq
      assert(idxs == idxs.indices.map(_ * 2), s"frame stride wrong: $idxs")
      fs.foreach(f => assert(f.getAs[Array[Byte]](2).length <= 64))
    }
  }
}
