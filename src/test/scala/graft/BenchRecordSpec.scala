package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench record is one driver-parsed JSON line; exception text must
  * never be able to corrupt it. */
class BenchRecordSpec extends AnyFunSuite {

  test("sanitizeErr strips every JSON-hostile character") {
    val nasty = new RuntimeException(
      "path \"C:\\tmp\"\nline2\u0000\u001b[31mred\u001b[0m\tend\b\f")
    val s = Bench.sanitizeErr(nasty)
    assert(!s.exists(c => c < 0x20), s"control char survived: ${s.toSeq}")
    assert(!s.contains('"') && !s.contains('\\'), s)
    assert(s.startsWith("RuntimeException: "), s)
    // embedding in a JSON string must parse
    val json = s"""{"e":"$s"}"""
    assert(!json.contains('\n'))
  }

  test("sanitizeErr handles null messages and caps length") {
    assert(Bench.sanitizeErr(new IllegalStateException()) ==
      "IllegalStateException: null")
    val long = Bench.sanitizeErr(new RuntimeException("x" * 1000))
    assert(long.length == 160)
  }
}
