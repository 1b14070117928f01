package graft.spark.readstat

import graft.readstat.SparkTestBase

/** Round-6 advice: rowCountCache keyed on (path, length, mtime) serves a
  * stale count when a file is replaced in place with identical length
  * within the filesystem's mtime granularity — and COUNT(*) pushdown
  * would return that stale number as a query RESULT. The fix folds a
  * first+last-64-byte content stamp into the key; this spec pins that
  * the stamp distinguishes equal-length, equal-mtime replacements.
  */
class RowCountStampSpec extends SparkTestBase {

  test("content stamp differs for equal-length equal-mtime files with different bytes") {
    val f = java.io.File.createTempFile("stamp", ".bin")
    f.deleteOnExit()
    val bytes = Array.tabulate[Byte](4096)(i => (i % 251).toByte)
    java.nio.file.Files.write(f.toPath, bytes)
    val mtime = 1700000000000L
    assert(f.setLastModified(mtime))
    val s1 = Formats.contentStamp(f, f.length())
    // same length, different tail byte — the in-place-replacement shape
    bytes(4095) = (bytes(4095) ^ 0x7f).toByte
    java.nio.file.Files.write(f.toPath, bytes)
    assert(f.setLastModified(mtime))
    val s2 = Formats.contentStamp(f, f.length())
    assert(s1 != s2, "tail change must change the stamp")
    // same length, different head byte
    bytes(0) = (bytes(0) ^ 0x7f).toByte
    java.nio.file.Files.write(f.toPath, bytes)
    assert(f.setLastModified(mtime))
    val s3 = Formats.contentStamp(f, f.length())
    assert(s2 != s3, "head change must change the stamp")
    // identical rewrite: stamp stable (cache still hits)
    java.nio.file.Files.write(f.toPath, bytes)
    assert(Formats.contentStamp(f, f.length()) == s3)
  }

  test("exactRowCount sees a same-length same-mtime replacement (stamp in key)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_stamp").toFile
    dir.deleteOnExit()
    val p = s"$dir/t.dta"
    Seq(1.0, 2.0, 3.0).toDF("v").coalesce(1)
      .write.format("readstat").mode("overwrite").save(p)
    assert(Formats.exactRowCount(p, ReadstatOptions()).contains(3L))
    // cache is warm; a fresh write under the same name must not serve 3
    Seq(1.0, 2.0, 3.0, 4.0).toDF("v").coalesce(1)
      .write.format("readstat").mode("overwrite").save(p)
    assert(Formats.exactRowCount(p, ReadstatOptions()).contains(4L))
  }
}
