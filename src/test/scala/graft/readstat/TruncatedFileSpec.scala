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
}
