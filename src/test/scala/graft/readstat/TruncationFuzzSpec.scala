package graft.readstat

import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.util.{Failure, Random, Success, Try}

import org.apache.spark.sql.DataFrame

/** Random-truncation fuzz across all six formats, pinning the failfast
  * contract the SAS fix (r14) made uniform: a cut file must either
  * fail LOUDLY or return the COMPLETE dataset (when the cut only ate
  * bytes past the data) — a silent proper-prefix short read is the one
  * forbidden outcome. Under mode=permissive the result must be a clean
  * prefix of the original rows (never garbage rows, never an error).
  *
  * XPT is held to the weaker prefix contract under failfast too: the
  * format declares NO row count (count = physical data length / row
  * width), so a row-and-padding-aligned cut is indistinguishable from
  * a legitimately smaller file — same limitation every XPT reader has.
  * SAS has the analogous page-aligned blind spot (documented at
  * `SasModule.truncationSuspect`), but at 1/pageLength per cut the
  * seeded points below never land on it.
  */
class TruncationFuzzSpec extends SparkTestBase {

  private val N = 4000

  private def tmpDir(tag: String): String = {
    val d = Files.createTempDirectory(s"graft_fuzz_$tag").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def write(path: String): Unit = {
    import spark.implicits._
    (1 to N).map(i => (i.toDouble, i * 1.5)).toDF("id", "x")
      .coalesce(1)
      .write.format("readstat").mode("overwrite").save(path)
  }

  private def truncateTo(path: String, bytes: Long): Unit = {
    val ch = java.nio.channels.FileChannel.open(Paths.get(path),
      StandardOpenOption.WRITE)
    try ch.truncate(bytes) finally ch.close()
  }

  private def read(path: String, mode: String): DataFrame =
    spark.read.format("readstat").option("mode", mode).load(path)

  private def ids(rows: Array[org.apache.spark.sql.Row]): Array[Int] =
    rows.map(_.getDouble(0).toInt).sorted

  private def check(ext: String, prefixOkUnderFailfast: Boolean): Unit = {
    val rnd = new Random(ext.hashCode) // deterministic per format
    val dir = tmpDir(ext)
    for (trial <- 0 until 5) {
      val p = s"$dir/t$trial.$ext"
      write(p)
      val full = Files.size(Paths.get(p))
      // cut inside the data region, away from the header/meta front
      val cut = (full * 60 / 100) + (rnd.nextLong().abs % (full * 37 / 100))
      truncateTo(p, cut)
      val tag = s"$ext trial=$trial cut=$cut/$full"

      Try(read(p, "failfast").collect()) match {
        case Success(rows) =>
          if (prefixOkUnderFailfast) {
            val got = ids(rows)
            assert(got.sameElements(1 to got.length), s"$tag: not a prefix")
          } else
            assert(rows.length == N,
              s"$tag: SILENT SHORT READ — ${rows.length} of $N rows")
        case Failure(_) => () // loud is correct
      }

      Try(read(p, "permissive").collect()) match {
        case Success(rows) =>
          val got = ids(rows)
          assert(got.length <= N, tag)
          assert(got.sameElements(1 to got.length),
            s"$tag: permissive salvage is not a clean prefix")
        case Failure(e) =>
          fail(s"$tag: permissive threw instead of salvaging: $e")
      }
    }
  }

  test("dta: cut files are loud-or-complete; permissive salvages a prefix") {
    check("dta", prefixOkUnderFailfast = false)
  }
  test("sav: cut files are loud-or-complete; permissive salvages a prefix") {
    check("sav", prefixOkUnderFailfast = false)
  }
  test("zsav: cut files are loud-or-complete; permissive salvages a prefix") {
    check("zsav", prefixOkUnderFailfast = false)
  }
  test("sas7bdat: cut files are loud-or-complete; permissive salvages a prefix") {
    check("sas7bdat", prefixOkUnderFailfast = false)
  }
  test("por: cut files are loud-or-complete; permissive salvages a prefix") {
    check("por", prefixOkUnderFailfast = false)
  }
  test("xpt: cut files never yield garbage; permissive salvages a prefix") {
    check("xpt", prefixOkUnderFailfast = true)
  }
}
