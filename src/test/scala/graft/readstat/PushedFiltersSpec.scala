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
      "f" -> FloatType, "d" -> DateType)
  private val slots: Map[String, Int] = Map("a" -> 0, "b" -> 1, "s" -> 2, "f" -> 3)

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
    // 'd' is DateType (unsupported): And still skips on the 'a' side
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
}
