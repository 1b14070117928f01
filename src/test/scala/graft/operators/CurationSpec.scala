package graft.operators

import graft.readstat.SparkTestBase
import org.apache.spark.sql.functions._

/** Corpus-curation operators: global line dedup, hash splits, PII
  * redaction — plus the decode-robustness guarantees the media operators
  * make (a corrupt payload must never fail a task).
  */
class CurationSpec extends SparkTestBase {

  test("dedupLines keeps first global occurrence, preserves blanks and order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha\nshared\nbeta"),
      (2L, "shared\n\ngamma"),      // "shared" already seen in doc 1
      (3L, "shared\nalpha\ndelta")  // both dups → only delta survives
    ).toDF("id", "text")
    val out = TextCuration.dedupLines(docs, "id", "text")
      .orderBy("id").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(3L, 3L, 3L)) // n_lines
    assert(out.map(_.getLong(2)).toSeq == Seq(3L, 2L, 1L)) // n_kept
    assert(out(0).getString(3) == "alpha\nshared\nbeta")
    // doc 2: blank line survives dedup, "shared" does not
    assert(out(1).getString(3) == "\ngamma")
    assert(out(2).getString(3) == "delta")
  }

  test("dedupLines handles a doc whose every line is a duplicate") {
    import spark.implicits._
    val docs = Seq((1L, "x\ny"), (2L, "x\ny")).toDF("id", "text")
    val out = TextCuration.dedupLines(docs, "id", "text")
      .orderBy("id").collect()
    assert(out(0).getString(3) == "x\ny")
    assert(out(1).getLong(2) == 0L && out(1).getString(3) == "")
  }

  test("hashSplit is deterministic, in-range, and roughly 80/10/10") {
    import spark.implicits._
    val ids = spark.range(10000).toDF("id")
    val splits = ids.select(TextCuration.hashBucket(col("id")).as("b"),
      TextCuration.hashSplit(col("id")).as("s"))
    assert(splits.filter(col("b") < 0 || col("b") > 99).count() == 0)
    val bySplit = splits.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(bySplit("train") - 8000.0) / 8000.0 < 0.03)
    assert(math.abs(bySplit("val") - 1000.0) / 1000.0 < 0.10)
    assert(math.abs(bySplit("test") - 1000.0) / 1000.0 < 0.10)
    // stable across evaluations (pure function of the id)
    val again = ids.select(TextCuration.hashSplit(col("id")).as("s"))
      .groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == bySplit)
  }

  test("PII counts and redaction on a known string") {
    import spark.implicits._
    val df = Seq((1L,
      "mail a.b-c@test.org and x@y.io, call 555-123-4567, host 192.168.0.1 done"
    )).toDF("id", "t")
    val (e, p, ip) = TextCuration.piiCounts(col("t"))
    val r = df.select(e.as("e"), p.as("p"), ip.as("ip"),
      TextCuration.redactPii(col("t")).as("red")).collect()(0)
    assert(r.getInt(0) == 2 && r.getInt(1) == 1 && r.getInt(2) == 1)
    assert(r.getString(3) ==
      "mail <EMAIL> and <EMAIL>, call <PHONE>, host <IP> done")
  }

  test("corrupt payloads with valid magic bytes never throw in media ops") {
    // PNG magic followed by garbage: passes the sniff, fails the decode
    val corrupt = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10) ++
      Array.fill[Byte](64)(0x5a)
    assert(Multimodal.imageFeatures(corrupt).isEmpty)
    assert(Multimodal.resizeImage(corrupt, 8, 8).isEmpty)
    // and a whole frame of them goes through the stub path, not a crash
    import spark.implicits._
    val media = Seq((1L, "image/png", corrupt)).toDF("media_id", "media_type", "payload")
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == 1 && feats(0).getSeq[Float](4).length == 8)
    val resized = Multimodal.resizeImages(media, 8, 8).collect()
    assert(resized.length == 1 &&
      resized(0).getStruct(3).getString(1) == "raw") // stub fallback format
  }

  test("dedupLines invariants hold on random multi-line corpora") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    val genLine = Gen.frequency(
      6 -> Gen.oneOf("alpha", "beta", "gamma", "delta", "shared line", "x y"),
      2 -> Gen.alphaNumStr.map(_.take(12)),
      1 -> Gen.const("")) // blanks
    val genDoc = Gen.listOfN(6, genLine).map(_.mkString("\n"))
    (0 until 5).foreach { trial =>
      val docs = (0 until 20).map { i =>
        (i.toLong, genDoc(Gen.Parameters.default, Seed(trial * 100 + i)).get)
      }.toDF("id", "text")
      val out = TextCuration.dedupLines(docs, "id", "text").collect()
        .map(r => r.getLong(0) -> r).toMap
      val inLines = docs.collect().map(r => r.getLong(0) -> r.getString(1).split("\n", -1)).toMap
      // 1) every distinct non-blank line survives exactly once corpus-wide
      val keptAll = out.values.toSeq.flatMap { r =>
        val t = r.getString(3)
        if (t.isEmpty && r.getLong(2) == 0) Nil else t.split("\n", -1).toSeq
      }
      val keptNonBlank = keptAll.filter(_.trim.nonEmpty)
      assert(keptNonBlank.distinct.length == keptNonBlank.length, s"trial $trial: dup kept")
      val inDistinct = inLines.values.flatten.filter(_.trim.nonEmpty).toSet
      assert(keptNonBlank.toSet == inDistinct, s"trial $trial: kept set != distinct input")
      // 2) per-doc: kept text is a subsequence of the original lines
      out.foreach { case (id, r) =>
        val orig = inLines(id)
        val kept = if (r.getLong(2) == 0) Array[String]()
          else r.getString(3).split("\n", -1)
        var oi = 0
        kept.foreach { l =>
          while (oi < orig.length && orig(oi) != l) oi += 1
          assert(oi < orig.length, s"trial $trial doc $id: '$l' out of order")
          oi += 1
        }
        // 3) counts are consistent
        assert(r.getLong(1) == orig.length && r.getLong(2) == kept.length)
      }
    }
  }

  test("curation query plans: no cartesian products, bounded shuffles") {
    val sf = "/root/testdata/sf0.001"
    def audit(df: org.apache.spark.sql.DataFrame, name: String, maxShuffles: Int): Unit = {
      // string-based: node collect can't see through AdaptiveSparkPlanExec
      // (children are fields, not tree children), so the collect-based
      // form of this audit passed vacuously on any AQE-wrapped plan
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"$name plans a product join:\n$plan")
      val shuffles =
        "Exchange (hashpartitioning|rangepartitioning|SinglePartition)".r
          .findAllIn(plan).size
      assert(shuffles <= maxShuffles,
        s"$name plans $shuffles shuffles (max $maxShuffles):\n$plan")
    }
    // linear scans: only the final order-by may shuffle
    audit(graft.queries.Curation.gopherFilters(spark, sf), "gopher", 1)
    audit(graft.queries.Curation.piiRedact(spark, sf), "pii", 1)
    audit(graft.queries.Curation.hashSplit(spark, sf), "hash_split", 1)
    // line dedup: first-occurrence agg + keeper join + rebuild + totals + sort
    audit(graft.queries.Curation.dedupLines(spark, sf), "dedup_lines", 8)
  }

  test("decontamination flags only train docs, with sane overlap fractions") {
    val sf = "/root/testdata/sf0.01"
    val out = graft.queries.Curation.decontaminate(spark, sf).collect()
    assert(out.nonEmpty) // the sf0.01 corpus plants near-dup pairs across the split
    out.foreach { r =>
      // flagged docs are all on the train side of the hash split
      val bucket = spark.range(1).select(
        TextCuration.hashBucket(lit(r.getLong(0)))).collect()(0).getInt(0)
      assert(bucket >= 20, s"eval doc ${r.getLong(0)} flagged as contaminated")
      assert(r.getLong(2) >= 1 && r.getLong(2) <= r.getLong(1))
      val frac = r.getDouble(3)
      assert(frac > 0.0 && frac <= 1.0)
    }
  }

  test("temperature sampling keeps all of the rarest language, downsamples the rest") {
    val sf = "/root/testdata/sf0.01"
    val out = graft.queries.Curation.temperatureSample(spark, sf).collect()
    val byRate = out.map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val minLang = byRate.minBy(_._2)
    assert(minLang._3 == 1.0 && minLang._4 == minLang._2) // rate 1 → keeps everything
    byRate.foreach { case (_, n, rate, kept) =>
      assert(rate > 0.0 && rate <= 1.0)
      assert(kept <= n)
      // kept fraction tracks the rate (hash buckets are uniform to ~16 bits)
      assert(math.abs(kept.toDouble / n - rate) < 0.15)
    }
  }

  test("animated GIF payloads demux to real frames; others use the stub") {
    import javax.imageio.{IIOImage, ImageIO}
    val gifOut = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(gifOut)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    (0 until 6).foreach { f =>
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(f * 40, 10, 10)); g.fillRect(0, 0, 8, 8)
      g.dispose()
      writer.writeToSequence(new IIOImage(img, null, null), null)
    }
    writer.endWriteSequence(); writer.dispose(); ios.close()
    val gif = gifOut.toByteArray

    val frames = Multimodal.gifFrames(gif, everyK = 2).get
    assert(frames.map(_._1) == Seq(0, 2, 4))
    frames.foreach { case (_, png) =>
      val img = ImageIO.read(new java.io.ByteArrayInputStream(png))
      assert(img.getWidth == 8 && img.getHeight == 8)
    }
    import spark.implicits._
    val media = Seq((7L, gif), (8L, Array.fill[Byte](600)(1)))
      .toDF("media_id", "payload")
    val out = Multimodal.sampleFrames(media, everyK = 2).collect()
    assert(out.count(_.getLong(0) == 7L) == 3) // real GIF frames 0,2,4
    assert(out.count(_.getLong(0) == 8L) == 1) // stub: 2 slots, step 2 -> idx 0
  }

  test("MJPEG AVI payloads demux to real frames through the RIFF walk") {
    import javax.imageio.ImageIO
    def jpeg(shade: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(12, 10,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(shade, 20, 30)); g.fillRect(0, 0, 12, 10)
      g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    def chunk(fourcc: String, body: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(fourcc.getBytes("US-ASCII"))
      val n = body.length
      bos.write(Array[Byte]((n & 0xff).toByte, ((n >> 8) & 0xff).toByte,
        ((n >> 16) & 0xff).toByte, ((n >> 24) & 0xff).toByte))
      bos.write(body)
      if ((n & 1) == 1) bos.write(0) // even padding
      bos.toByteArray
    }
    val frames = (0 until 5).map(f => jpeg(f * 50))
    val movi = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write("movi".getBytes("US-ASCII"))
      frames.foreach(j => bos.write(chunk("00dc", j)))
      bos.toByteArray
    }
    val avi = {
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

    val got = Multimodal.aviMjpegFrames(avi, everyK = 2).get
    assert(got.map(_._1) == Seq(0, 2, 4))
    got.foreach { case (_, png) =>
      val img = ImageIO.read(new java.io.ByteArrayInputStream(png))
      assert(img.getWidth == 12 && img.getHeight == 10)
    }
    // a corrupt AVI (truncated mid-chunk) and a non-JPEG-frame AVI both
    // decline rather than throw, landing on the declared stub
    assert(Multimodal.aviMjpegFrames(avi.take(40), 1).isEmpty)
    val junkAvi = {
      val inner = chunk("LIST", "movi".getBytes("US-ASCII") ++
        chunk("00dc", Array.fill[Byte](32)(3)))
      val bos = new java.io.ByteArrayOutputStream()
      bos.write("RIFF".getBytes("US-ASCII"))
      val n = inner.length + 4
      bos.write(Array[Byte]((n & 0xff).toByte, ((n >> 8) & 0xff).toByte,
        ((n >> 16) & 0xff).toByte, ((n >> 24) & 0xff).toByte))
      bos.write("AVI ".getBytes("US-ASCII")); bos.write(inner)
      bos.toByteArray
    }
    assert(Multimodal.aviMjpegFrames(junkAvi, 1).isEmpty)

    import spark.implicits._
    val media = Seq((9L, avi)).toDF("media_id", "payload")
    val out = Multimodal.sampleFrames(media, everyK = 2).collect()
    assert(out.count(_.getLong(0) == 9L) == 3) // real AVI frames 0,2,4
  }

  test("connectedComponents drops null-id edges and handles int ids locally") {
    import spark.implicits._
    val edges = Seq(
      (Some(1), Some(2)), (Some(2), Some(3)),
      (None, Some(4)), (Some(5), None), // null edges: ignored entirely
      (Some(10), Some(11))
    ).toDF("a", "b")
    val comp = Graph.connectedComponents(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("dsirWeights separates target-vocabulary docs from the rest") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(7)
    val targetWords = Array("alpha", "beta", "gamma", "delta", "epsilon")
    val otherWords = Array("zeta", "eta", "theta", "iota", "kappa")
    def doc(words: Array[String]) =
      Array.fill(30)(words(rnd.nextInt(words.length))).mkString(" ")
    // raw corpus: 30 docs with the target vocabulary (10 marked target),
    // 30 with a disjoint vocabulary
    val rows = (0 until 30).map(i => (i.toLong, doc(targetWords), i < 10)) ++
      (30 until 60).map(i => (i.toLong, doc(otherWords), false))
    val df = rows.toDF("id", "text", "is_t")
    val out = TextCuration.dsirWeights(df, "id", "text", col("is_t"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getInt(3))).toMap
    // every target-vocabulary doc scores positive, every other negative
    (0L until 30L).foreach(i => assert(out(i)._1 > 0 && out(i)._2 == 1, s"doc $i"))
    (30L until 60L).foreach(i => assert(out(i)._1 < 0 && out(i)._2 == 0, s"doc $i"))
  }

  test("incrementalDupFlags is exact for any Bloom fpp, including fp-heavy filters") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the cat sat"), (2L, "dogs bark loudly"), (3L, "unique corpus line"),
      (4L, "  the   CAT sat "), // normalizes equal to doc 1
      (5L, "rain in spain")).toDF("doc_id", "text")
    val batch = Seq(
      (100L, "the cat sat"),        // dup (exact)
      (101L, "THE CAT SAT"),        // dup after lower+ws normalization
      (102L, "never seen before"),  // new
      (103L, "rain in spain"),      // dup
      (104L, "also new text")).toDF("doc_id", "text")
    val expect = Map(100L -> 1, 101L -> 1, 102L -> 0, 103L -> 1, 104L -> 0)
    // tight and sloppy filters must agree: false positives only cost work,
    // never correctness (the exact join strips them)
    for (fpp <- Seq(0.000001, 0.9)) {
      val got = TextCuration.incrementalDupFlags(corpus, batch, "doc_id", "text", fpp)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == expect, s"fpp=$fpp")
    }
  }

  test("incrementalDupFlags probes the corpus scan before any join") {
    import spark.implicits._
    // corpus goes through parquet so it is a real scan — over a local
    // relation the optimizer constant-folds the probe away entirely
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom").toFile
    dir.deleteOnExit()
    (0L until 1000L).map(i => (i, s"corpus doc number $i"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/corpus")
    val corpus = spark.read.parquet(s"$dir/corpus")
    val batch = Seq((9000L, "corpus doc number 7"), (9001L, "fresh"))
      .toDF("doc_id", "text")
    val out = TextCuration.incrementalDupFlags(corpus, batch, "doc_id", "text")
    // the bloom probe must sit in the corpus-side plan as a Filter on the
    // scan, upstream of the join
    val plan = out.queryExecution.optimizedPlan.toString
    assert(plan.contains("bloom_might_contain"), plan.take(2000))
    val got = out.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(9000L -> 1, 9001L -> 0))
  }

  test("mixtureEpochs hits epoch targets in expectation, deterministically") {
    import spark.implicits._
    val docs = (1L to 20000L).map(id => (id, s"g${id % 4}")).toDF("id", "grp")
    val targets = Map("g0" -> 2.5, "g1" -> 0.25, "g2" -> 0.0)
    val out = TextCuration.mixtureEpochs(docs, "id", "grp", targets)
    val rep = out.groupBy("grp")
      .agg(avg("n_repeats").as("r"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(rep("g0") - 2.5) < 0.05, s"g0 ${rep("g0")}")
    assert(math.abs(rep("g1") - 0.25) < 0.05, s"g1 ${rep("g1")}")
    assert(rep("g2") == 0.0)
    assert(rep("g3") == 1.0) // default
    // whole-epoch floor: every g0 doc repeats at least twice, at most 3
    val g0 = out.filter($"grp" === "g0").select("n_repeats").as[Long].collect()
    assert(g0.forall(r => r == 2L || r == 3L))
    // deterministic under recomputation and repartitioning
    val again = TextCuration.mixtureEpochs(docs.repartition(13), "id", "grp",
      targets).collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val first = out.collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(again == first)
  }

  test("packSequences lays tokens into gapless fixed-length sequences per shard") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val docs = (1L to 500L).map(id => (id, 1 + rnd.nextInt(300)))
      .toDF("id", "n_tok")
    val L = 128; val shards = 4
    val packed = TextCuration.packSequences(docs, "id", "n_tok", L, shards)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(packed.length == 500)
    packed.foreach { case (id, shard, n, sf, sl, off, ns) =>
      assert(shard >= 0 && shard < shards, s"doc $id shard $shard")
      assert(off >= 0 && off < L, s"doc $id offset $off")
      assert(ns == sl - sf + 1 && ns >= 1, s"doc $id spans $ns")
      // a doc's global token interval [start, start + n) maps exactly to
      // its claimed sequence range
      val start = sf * L + off
      assert((start + n - 1) / L == sl, s"doc $id end seq")
    }
    // within each shard, ordered by id, documents tile the token stream
    // with no gaps and no overlaps from offset 0
    packed.groupBy(_._2).foreach { case (_, ds) =>
      var cursor = 0L
      ds.sortBy(_._1).foreach { case (id, _, n, sf, _, off, _) =>
        assert(sf * L + off == cursor, s"doc $id starts at ${sf * L + off}, want $cursor")
        cursor += n
      }
    }
    // zero-token docs have nothing to pack
    val withEmpty = Seq((1L, 0), (2L, 5)).toDF("id", "n_tok")
    assert(TextCuration.packSequences(withEmpty, "id", "n_tok", L, shards)
      .count() == 1L)
  }
}
