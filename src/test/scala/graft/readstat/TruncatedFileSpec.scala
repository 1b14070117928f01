package graft.readstat

import java.nio.file.{Files, Paths}

/** A truncated stat file (partial copy/download) must fail loudly, not
  * silently return a prefix of the rows — at ingest scale a silent
  * short read is unrecoverable data loss.
  */
class TruncatedFileSpec extends SparkTestBase {

  private def truncated(src: String, keep: Double): String = {
    val bytes = Files.readAllBytes(Paths.get(src))
    val cut = java.util.Arrays.copyOfRange(bytes, 0, (bytes.length * keep).toInt)
    val out = Files.createTempFile("graft_trunc", src.substring(src.lastIndexOf('.')))
    Files.write(out, cut)
    out.toFile.deleteOnExit()
    out.toString
  }

  test("truncated sas7bdat reads throw instead of returning partial rows") {
    // header declares page count/size; a cut file must fail, not shrink
    val part = truncated(res("fixtures/sas/test1.sas7bdat"), 0.6)
    val n = try Some(spark.read.format("readstat").load(part).count())
      catch { case _: Throwable => None }
    n.foreach(c => fail(s"sas7bdat: truncated read silently returned $c rows"))
  }

  test("truncated por reads throw instead of returning partial rows") {
    import spark.implicits._
    val full = Files.createTempDirectory("graft_trunc_full").toString + "/full.por"
    (1 to 2000).map(i => (i, i * 1.5, s"row$i")).toDF("id", "v", "s")
      .write.format("readstat").mode("overwrite").save(full)
    val part = truncated(full, 0.6)
    val n = try Some(spark.read.format("readstat").load(part).count())
      catch { case _: Throwable => None }
    n.foreach(c => fail(s"por: truncated read silently returned $c rows"))
  }

  test("truncated dta/sav/xpt reads throw instead of returning partial rows") {
    import spark.implicits._
    for (ext <- Seq("dta", "sav", "zsav", "xpt")) {
      val full = Files.createTempDirectory("graft_trunc_full").toString + s"/full.$ext"
      (1 to 5000).map(i => (i, i * 1.5, s"row$i")).toDF("id", "v", "s")
        .write.format("readstat").mode("overwrite").save(full)
      val part = truncated(full, 0.6)
      // count() returning a silent prefix is the failure mode we guard against
      val n = try Some(spark.read.format("readstat").load(part).count())
        catch { case _: Throwable => None }
      n.foreach(c => fail(s"$ext: truncated read silently returned $c rows"))
    }
  }

  test("truncation fails loudly at every cut fraction, count and collect") {
    import spark.implicits._
    // XPT cut exactly at a row boundary is indistinguishable from valid
    // EOF by design of the format (no row count field), so XPT gets the
    // weaker guarantee: never the FULL count, either an error or fewer
    // rows. Header-counted formats must always throw.
    for (ext <- Seq("dta", "sav", "zsav", "xpt", "por")) {
      val full = Files.createTempDirectory("graft_trunc_prop").toString + s"/full.$ext"
      (1 to 4000).map(i => (i, i * 2.5, s"text$i")).toDF("id", "v", "s")
        .write.format("readstat").mode("overwrite").save(full)
      val fullRows = 4000L
      for (frac <- Seq(0.31, 0.52, 0.74, 0.9, 0.985)) {
        val part = truncated(full, frac)
        val viaCount = try Some(spark.read.format("readstat").load(part).count())
          catch { case _: Throwable => None }
        val viaCollect = try Some(spark.read.format("readstat").load(part)
            .agg(org.apache.spark.sql.functions.count(
              org.apache.spark.sql.functions.col("id"))).collect()(0).getLong(0))
          catch { case _: Throwable => None }
        if (ext == "xpt" || ext == "por") {
          viaCount.foreach(c => assert(c < fullRows, s"$ext@$frac count=$c"))
          viaCollect.foreach(c => assert(c < fullRows, s"$ext@$frac collect=$c"))
        } else {
          assert(viaCount.isEmpty, s"$ext@$frac count returned $viaCount")
          assert(viaCollect.isEmpty, s"$ext@$frac collect returned $viaCollect")
        }
      }
    }
  }
}
