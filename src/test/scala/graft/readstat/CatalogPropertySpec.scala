package graft.readstat

import java.nio.file.Files

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.core.sas.SasCatalog
import graft.spark.readstat.writers.SasCatalogWriter

/** Property roundtrips for the sas7bcat writer: random numeric and
  * string label tables must read back EXACTLY through the catalog
  * reader (XLSR index, chain blocks, negated-BE-double / 16-byte-string
  * keys, positional label pairing) across format counts, label widths,
  * and unicode content — the size/shape axes the single fixture test
  * cannot sweep.
  */
class CatalogPropertySpec extends SparkTestBase {

  private val genLabel: Gen[String] = Gen.frequency(
    6 -> Gen.alphaNumStr.map(s => if (s.isEmpty) "L" else s.take(38)),
    2 -> Gen.oneOf("Homme — 男性", "ß∂ƒ unicode", "spaces  inside", "x" * 40),
    1 -> Gen.const("=|;,:"))

  private def fmtName(i: Int, str: Boolean): String =
    (if (str) "$" else "") + s"F${i}X"

  test("random catalogs roundtrip bit-exactly through write + read") {
    val genNum = for {
      n <- Gen.choose(1, 12)
      codes <- Gen.listOfN(n, Gen.choose(-100000, 100000))
      labels <- Gen.listOfN(n, genLabel)
    } yield codes.map(_.toDouble).distinct.zip(labels).toMap
    val genStr = for {
      n <- Gen.choose(1, 12)
      codes <- Gen.listOfN(n,
        Gen.alphaNumStr.map(s => (if (s.isEmpty) "c" else s).take(16)))
      labels <- Gen.listOfN(n, genLabel)
    } yield codes.distinct.zip(labels).toMap
    val genCat = for {
      nn <- Gen.choose(0, 8)
      ns <- Gen.choose(0, 8)
      nums <- Gen.listOfN(nn, genNum)
      strs <- Gen.listOfN(ns, genStr)
    } yield (
      nums.zipWithIndex.map { case (m, i) => fmtName(i, str = false) -> m }.toMap,
      strs.zipWithIndex.map { case (m, i) => fmtName(i, str = true) -> m }.toMap)

    (1L to 5L).foreach { seed =>
      val (nums, strs) =
        genCat.apply(Gen.Parameters.default, Seed(seed)).get
      if (nums.nonEmpty || strs.nonEmpty) {
        val dir = Files.createTempDirectory("graft_catprop").toFile
        dir.deleteOnExit()
        val p = s"${dir.getAbsolutePath}/c.sas7bcat"
        SasCatalogWriter.write(p, nums, strs)
        val back = SasCatalog.read(p)
        assert(back.numeric == nums, s"seed $seed numeric mismatch")
        assert(back.string == strs.map { case (k, m) =>
          // string codes store in 16-byte slots and read back trimmed
          k -> m.map { case (c, l) => c.trim -> l }
        }, s"seed $seed string mismatch")
      }
    }
  }

  test("a label table near the one-page bound roundtrips; past it fails loudly") {
    val dir = Files.createTempDirectory("graft_catbig").toFile
    dir.deleteOnExit()
    // ~81 B/entry × 700 codes ≈ 57 KB block — inside the 64 KiB page
    val big = (1 to 700).map(i => i.toDouble -> s"Label $i ${"x" * 30}").toMap
    val p = s"${dir.getAbsolutePath}/big.sas7bcat"
    SasCatalogWriter.write(p, Map("BIGF" -> big), Map.empty)
    assert(SasCatalog.read(p).numeric("BIGF") == big)
    val tooBig = (1 to 2000).map(i => i.toDouble -> ("L" * 40)).toMap
    val e = intercept[IllegalArgumentException] {
      SasCatalogWriter.write(s"${dir.getAbsolutePath}/huge.sas7bcat",
        Map("HUGEF" -> tooBig), Map.empty)
    }
    assert(e.getMessage.contains("exceeds"), e.getMessage)
  }
}
