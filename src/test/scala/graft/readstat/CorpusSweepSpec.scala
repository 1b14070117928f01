package graft.readstat

import java.io.File

/** Robustness sweep over the full reference fixture corpus (read-only):
  * every file must either decode fully or fail with a clean exception —
  * mirrors the reference's `readstat_all_files.rs` harness. Known-bad
  * fixtures (files the reference's own tests special-case) are allowed
  * to fail; the pass-rate floors catch regressions.
  */
class CorpusSweepSpec extends SparkTestBase {

  private val refRoot = "/root/reference/crates/polars_readstat_rs/tests"

  private def sweep(dirs: Seq[String], exts: Seq[String]): (Int, Int, Seq[String]) = {
    val files = dirs.flatMap { d =>
      val f = new File(d)
      if (f.isDirectory)
        f.listFiles().filter(x => exts.exists(e => x.getName.toLowerCase.endsWith(e)))
      else Array.empty[File]
    }
    var ok = 0
    val failures = Seq.newBuilder[String]
    files.foreach { f =>
      try {
        val df = spark.read.format("readstat").load(f.getAbsolutePath)
        df.schema // force schema
        val n = df.count()
        // full decode of every column on a sample
        df.limit(50).collect()
        require(n >= 0)
        ok += 1
      } catch {
        case e: Throwable =>
          failures += s"${f.getName}: ${Option(e.getMessage).getOrElse(e.getClass.getName).take(100)}"
      }
    }
    (ok, files.length, failures.result())
  }

  test("stata corpus sweep (115 fixtures)") {
    val (ok, total, failures) = sweep(Seq(s"$refRoot/stata/data"), Seq(".dta"))
    info(s"stata: $ok/$total ok")
    failures.foreach(f => info(s"  FAIL $f"))
    assert(total > 100)
    assert(ok.toDouble / total >= 0.95, s"$ok/$total\n${failures.mkString("\n")}")
  }

  test("spss corpus sweep") {
    val (ok, total, failures) = sweep(Seq(s"$refRoot/spss/data"),
      Seq(".sav", ".zsav", ".por"))
    info(s"spss: $ok/$total ok")
    failures.foreach(f => info(s"  FAIL $f"))
    assert(total >= 18)
    assert(ok == total, failures.mkString("\n"))
  }

  test("sas corpus sweep (all fixtures across 9 source dirs)") {
    val dirs = Seq("data", "data_pandas", "data_AHS2013", "data_gov",
      "data_poe", "data_big5", "data_reikoch", "data_objectpool", "data_misc")
      .map(d => s"$refRoot/sas/data/$d") :+ s"$refRoot/sas/data"
    val (ok, total, failures) = sweep(dirs, Seq(".sas7bdat"))
    info(s"sas: $ok/$total ok")
    failures.foreach(f => info(s"  FAIL $f"))
    assert(total > 150) // 178 files at the top level of the 9 dirs
    // the reference's own harness tolerates a handful of bad fixtures
    // (e.g. zero_variables.sas7bdat); require ≥90%
    assert(ok.toDouble / total >= 0.90, s"$ok/$total\n${failures.mkString("\n")}")
  }

  test("xpt corpus sweep") {
    val (ok, total, failures) = sweep(Seq(s"$refRoot/sas/data/xpt"),
      Seq(".xpt", ".xpt5", ".xpt8"))
    info(s"xpt: $ok/$total ok")
    assert(ok == total, failures.mkString("\n"))
  }
}
