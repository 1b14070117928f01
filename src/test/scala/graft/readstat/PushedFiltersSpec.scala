// lives in the connector package: PushedFilters is private[readstat]
package graft.spark.readstat

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Unit semantics of the pushed-filter compiler: the invariant under
  * test is one-directional — a compiled predicate may return true for a
  * row Catalyst drops (the residual re-filters), but must NEVER return
  * false for a row Catalyst keeps.
  */
class PushedFiltersSpec extends AnyFunSuite {

  private val types: Map[String, DataType] =
    Map("a" -> DoubleType, "b" -> IntegerType, "s" -> StringType,
      "f" -> FloatType, "d" -> DecimalType(10, 2), // decimal = unsupported
      "l" -> LongType, "dt" -> DateType, "ts" -> TimestampNTZType)
  private val slots: Map[String, Int] =
    Map("a" -> 0, "b" -> 1, "s" -> 2, "f" -> 3, "l" -> 4, "dt" -> 5, "ts" -> 6)

  private def eval(fs: Seq[Filter], cells: Any*): Option[Boolean] =
    PushedFilters.compile(fs, slots.get, types.get)
      .map(p => p(i => cells(i)))

  test("comparison leaves: nulls fail, values compare, strings binary") {
    assert(eval(Seq(GreaterThan("a", 5.0)), 6.0, null, null, null).contains(true))
    assert(eval(Seq(GreaterThan("a", 5.0)), 5.0, null, null, null).contains(false))
    assert(eval(Seq(GreaterThan("a", 5.0)), null, null, null, null).contains(false))
    assert(eval(Seq(LessThanOrEqual("b", 3)), null, 3, null, null).contains(true))
    assert(eval(Seq(EqualTo("s", "x")),
      null, null, UTF8String.fromString("x"), null).contains(true))
    assert(eval(Seq(GreaterThan("s", "b")),
      null, null, UTF8String.fromString("c"), null).contains(true))
  }

  test("Spark double ordering: NaN is largest and equal to itself, ±0.0 equal") {
    assert(eval(Seq(GreaterThan("a", 1e308)), Double.NaN, null, null, null).contains(true))
    assert(eval(Seq(EqualTo("a", Double.NaN)), Double.NaN, null, null, null).contains(true))
    assert(eval(Seq(EqualTo("a", 0.0)), -0.0, null, null, null).contains(true))
    assert(eval(Seq(In("a", Array[Any](0.0, 7.0))), -0.0, null, null, null).contains(true))
    assert(eval(Seq(In("a", Array[Any](Double.NaN))), Double.NaN, null, null, null).contains(true))
  }

  test("null-handling leaves and EqualNullSafe") {
    assert(eval(Seq(IsNull("a")), null, null, null, null).contains(true))
    assert(eval(Seq(IsNotNull("a")), 1.0, null, null, null).contains(true))
    assert(eval(Seq(EqualNullSafe("a", null)), null, null, null, null).contains(true))
    assert(eval(Seq(EqualNullSafe("a", 2.0)), null, null, null, null).contains(false))
  }

  test("And compiles one evaluable side; Or needs both; unresolved-only → None") {
    // 'd' is DecimalType (unsupported): And still skips on the 'a' side
    assert(eval(Seq(And(GreaterThan("a", 5.0), EqualTo("d", "x"))),
      4.0, null, null, null).contains(false))
    // Or with an unsupported side must NOT compile (it could be the
    // side that makes the row pass)
    assert(eval(Seq(Or(GreaterThan("a", 5.0), EqualTo("d", "x"))),
      4.0, null, null, null).isEmpty)
    assert(eval(Seq(EqualTo("d", "x"))).isEmpty)
  }

  test("Not: exact on non-null cells, keeps on null, refuses partial children") {
    assert(eval(Seq(Not(EqualTo("a", 5.0))), 6.0, null, null, null).contains(true))
    assert(eval(Seq(Not(EqualTo("a", 5.0))), 5.0, null, null, null).contains(false))
    // null ref: Catalyst's Not(null)=null drops the row, but skipping
    // requires certainty — the compiled form must KEEP it
    assert(eval(Seq(Not(EqualTo("a", 5.0))), null, null, null, null).contains(true))
    // Not over an And with an unsupported side: the And would compile
    // partially (an under-approximation), whose negation over-skips —
    // must refuse to compile
    assert(eval(Seq(Not(And(GreaterThan("a", 5.0), EqualTo("d", "x")))),
      6.0, null, null, null).isEmpty)
    // same hole via an unresolvable slot ('d' typed but no slot)
    assert(eval(Seq(Not(And(GreaterThan("a", 5.0), GreaterThan("zz", 1.0)))),
      6.0, null, null, null).isEmpty)
  }

  test("conjunction of multiple pushed filters all must pass") {
    val fs = Seq(GreaterThan("a", 1.0), LessThan("b", 10), IsNotNull("s"))
    assert(eval(fs, 2.0, 5, UTF8String.fromString("k"), null).contains(true))
    assert(eval(fs, 2.0, 11, UTF8String.fromString("k"), null).contains(false))
    assert(eval(fs, 2.0, 5, null, null).contains(false))
  }

  test("float cells compare through double promotion consistently") {
    assert(eval(Seq(GreaterThan("f", 0.25f)), null, null, null, 0.5f).contains(true))
    assert(eval(Seq(EqualTo("f", 0.1f)), null, null, null, 0.1f).contains(true))
    assert(eval(Seq(GreaterThan("f", 1e30f)), null, null, null, Float.NaN).contains(true))
  }

  private def row7(l: Any = null, dt: Any = null, ts: Any = null): Seq[Any] =
    Seq(null, null, null, null, l, dt, ts)

  test("LongType compares exactly in long space (no double rounding above 2^53)") {
    val twoTo53 = 9007199254740992L
    // the r12 double path rounded 2^53+1 to 2^53 and SKIPPED this kept row
    assert(eval(Seq(GreaterThan("l", twoTo53)),
      row7(l = java.lang.Long.valueOf(twoTo53 + 1)): _*).contains(true))
    assert(eval(Seq(GreaterThan("l", twoTo53)),
      row7(l = java.lang.Long.valueOf(twoTo53)): _*).contains(false))
    assert(eval(Seq(EqualTo("l", twoTo53 + 1)),
      row7(l = java.lang.Long.valueOf(twoTo53 + 1)): _*).contains(true))
    assert(eval(Seq(In("l", Array[Any](twoTo53 + 1, 5L))),
      row7(l = java.lang.Long.valueOf(twoTo53)): _*).contains(false))
    assert(eval(Seq(In("l", Array[Any](twoTo53 + 1, 5L))),
      row7(l = java.lang.Long.valueOf(twoTo53 + 1)): _*).contains(true))
  }

  test("date filters: java.sql.Date and LocalDate literals vs Integer-days cells") {
    val d20 = java.lang.Integer.valueOf(20000) // 2024-10-04 in epoch days
    assert(eval(Seq(GreaterThan("dt", java.sql.Date.valueOf(
      java.time.LocalDate.ofEpochDay(19999)))), row7(dt = d20): _*).contains(true))
    assert(eval(Seq(LessThan("dt", java.time.LocalDate.ofEpochDay(20000))),
      row7(dt = d20): _*).contains(false))
    assert(eval(Seq(EqualTo("dt", java.time.LocalDate.ofEpochDay(20000))),
      row7(dt = d20): _*).contains(true))
    assert(eval(Seq(In("dt", Array[Any](java.time.LocalDate.ofEpochDay(20000)))),
      row7(dt = d20): _*).contains(true))
    // null cell fails comparisons (residual drops it anyway)
    assert(eval(Seq(GreaterThan("dt", java.time.LocalDate.ofEpochDay(1))),
      row7(): _*).contains(false))
    // cells may box Long too (module decoders)
    assert(eval(Seq(GreaterThanOrEqual("dt", java.time.LocalDate.ofEpochDay(20000))),
      row7(dt = java.lang.Long.valueOf(20000L)): _*).contains(true))
  }

  test("timestamp_ntz filters: LocalDateTime literal vs Long-micros cell") {
    val lit = java.time.LocalDateTime.of(1996, 6, 15, 12, 0, 0)
    val litMicros = lit.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
    assert(eval(Seq(GreaterThan("ts", lit)),
      row7(ts = java.lang.Long.valueOf(litMicros + 1)): _*).contains(true))
    assert(eval(Seq(GreaterThan("ts", lit)),
      row7(ts = java.lang.Long.valueOf(litMicros)): _*).contains(false))
    assert(eval(Seq(EqualTo("ts", lit)),
      row7(ts = java.lang.Long.valueOf(litMicros)): _*).contains(true))
    // unconvertible literal class → conjunct refuses (residual covers)
    assert(eval(Seq(EqualTo("ts", "1996-06-15")), row7(): _*).isEmpty)
  }

  test("string predicates: startsWith/endsWith/contains, null fails, Or composes") {
    def s(v: String) = Seq(null, null, UTF8String.fromString(v), null, null, null, null)
    assert(eval(Seq(StringStartsWith("s", "1-")), s("1-URGENT"): _*).contains(true))
    assert(eval(Seq(StringStartsWith("s", "1-")), s("2-HIGH"): _*).contains(false))
    assert(eval(Seq(StringEndsWith("s", "T")), s("1-URGENT"): _*).contains(true))
    assert(eval(Seq(StringEndsWith("s", "T")), s("3-MEDIUM"): _*).contains(false))
    assert(eval(Seq(StringContains("s", "URG")), s("1-URGENT"): _*).contains(true))
    assert(eval(Seq(StringContains("s", "URG")), s("3-MEDIUM"): _*).contains(false))
    assert(eval(Seq(StringContains("s", "x")),
      Seq(null, null, null, null, null, null, null): _*).contains(false))
    assert(eval(Seq(Or(StringStartsWith("s", "1-"), StringStartsWith("s", "2-"))),
      s("2-HIGH"): _*).contains(true))
    // Not over an exact string child skips only on non-null refs
    assert(eval(Seq(Not(StringStartsWith("s", "1-"))), s("1-URGENT"): _*).contains(false))
    assert(eval(Seq(Not(StringStartsWith("s", "1-"))),
      Seq(null, null, null, null, null, null, null): _*).contains(true))
  }

  test("asInterval: the hot single-column range shape reduces (r13)") {
    import PushedFilters.{asInterval, DoubleInterval, LongInterval}
    // IsNotNull + range pair on a double column → exclusive/inclusive kept
    assert(asInterval(Seq(IsNotNull("a"), GreaterThan("a", 25.0),
      LessThanOrEqual("a", 50.0)), types.get)
      .contains(DoubleInterval("a", 25.0, false, 50.0, true)))
    // EqualTo pins both bounds inclusive
    assert(asInterval(Seq(EqualTo("a", 7.0)), types.get)
      .contains(DoubleInterval("a", 7.0, true, 7.0, true)))
    // unbounded hi is (NaN, inclusive): NaN IS Spark's maximum, so a
    // NaN cell passes `a > 49` exactly like Catalyst keeps it
    val gt = asInterval(Seq(IsNotNull("a"), GreaterThan("a", 49.0)), types.get)
      .get.asInstanceOf[DoubleInterval]
    assert(gt.hi.isNaN && gt.hiInc)
    assert(PushedFilters.inDouble(Double.NaN, gt.lo, gt.loInc, gt.hi, gt.hiInc))
    assert(PushedFilters.inDouble(50.0, gt.lo, gt.loInc, gt.hi, gt.hiInc))
    assert(!PushedFilters.inDouble(49.0, gt.lo, gt.loInc, gt.hi, gt.hiInc))
    // ...and NaN fails an upper-bounded interval, like Catalyst drops it
    val lt = asInterval(Seq(LessThan("a", 10.0)), types.get)
      .get.asInstanceOf[DoubleInterval]
    assert(!PushedFilters.inDouble(Double.NaN, lt.lo, lt.loInc, lt.hi, lt.hiInc))
    // And-nested conjuncts flatten
    assert(asInterval(Seq(And(GreaterThanOrEqual("b", 3),
      LessThan("b", 9))), types.get)
      .contains(DoubleInterval("b", 3.0, true, 9.0, false)))
    // date column → inclusive long space, GT/LT shift to half-open ints
    val d1 = java.sql.Date.valueOf("1994-01-01")
    val d2 = java.sql.Date.valueOf("1994-02-20")
    val days1 = d1.toLocalDate.toEpochDay
    val days2 = d2.toLocalDate.toEpochDay
    assert(asInterval(Seq(IsNotNull("dt"), GreaterThanOrEqual("dt", d1),
      LessThan("dt", d2)), types.get)
      .contains(LongInterval("dt", days1, days2 - 1)))
    // contradictory bounds → EMPTY interval (lo > hi), still a valid
    // reduction: every row skips, which the residual agrees with
    val empty = asInterval(Seq(GreaterThan("dt", d2), LessThan("dt", d1)),
      types.get).get.asInstanceOf[LongInterval]
    assert(empty.lo > empty.hi)
  }

  test("asInterval refusals: shapes the fast path must NOT claim (r13)") {
    import PushedFilters.asInterval
    // two columns → None
    assert(asInterval(Seq(GreaterThan("a", 1.0), LessThan("b", 5)),
      types.get).isEmpty)
    // plain LongType → None (Long.MinValue cells are legal, no sentinel)
    assert(asInterval(Seq(GreaterThan("l", 5L)), types.get).isEmpty)
    // string column / unsupported type → None
    assert(asInterval(Seq(GreaterThan("s", "x")), types.get).isEmpty)
    assert(asInterval(Seq(GreaterThan("d", 5.0)), types.get).isEmpty)
    // non-range conjunct kinds → None (fall back to the generic path)
    assert(asInterval(Seq(In("a", Array(1.0, 2.0))), types.get).isEmpty)
    assert(asInterval(Seq(Or(GreaterThan("a", 1.0), LessThan("a", 0.0))),
      types.get).isEmpty)
    assert(asInterval(Seq(Not(EqualTo("a", 1.0))), types.get).isEmpty)
    assert(asInterval(Seq(IsNull("a")), types.get).isEmpty)
    assert(asInterval(Seq(EqualNullSafe("a", 1.0)), types.get).isEmpty)
    // only-IsNotNull (no bounds) still reduces — full-range interval
    assert(asInterval(Seq(IsNotNull("a")), types.get).nonEmpty)
    assert(asInterval(Seq.empty, types.get).isEmpty)
  }
}
