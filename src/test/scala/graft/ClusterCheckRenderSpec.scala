package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.ClusterCheck.render

/** The multi-executor parity sweep compares md5 fingerprints of
  * canonically RENDERED rows (ClusterCheck.render), so the renderer's
  * injectivity is what the 336/336 claim rests on: two values that
  * render identically would let a real local-vs-cluster divergence pass
  * silently. These are the collapses that would be easiest to ship by
  * accident. */
class ClusterCheckRenderSpec extends AnyFunSuite {

  test("doubles render by IEEE bits: ulps, signed zero, NaN all distinct") {
    val d = 0.1 + 0.2
    assert(render(d) != render(0.3), "one-ulp difference must be visible")
    assert(render(0.0) != render(-0.0), "signed zero must be visible")
    assert(render(Double.NaN) == render(Double.NaN), "NaN must be stable")
    assert(render(1.0f) != render(1.0), "float and double are different cells")
  }

  test("null is a sentinel, not the string forms it could collapse into") {
    assert(render(null) != render("null"))
    assert(render(null) != render(""))
    assert(render(null) != render(0L))
  }

  test("nested structure renders with boundaries: [a,bc] != [ab,c], nesting visible") {
    assert(render(Seq("a", "bc")) != render(Seq("ab", "c")))
    assert(render(Seq(Seq(1L), Seq(2L))) != render(Seq(Seq(1L, 2L))))
    assert(render(Seq.empty[Long]) != render(null))
    // maps render order-independently (Spark map iteration order is
    // unspecified) but still distinguish keys from values
    assert(render(Map("a" -> 1L, "b" -> 2L)) == render(Map("b" -> 2L, "a" -> 1L)))
    assert(render(Map("a" -> 1L)) != render(Map("1" -> "a".asInstanceOf[Any])))
  }

  test("Row cells and top-level row joins are length-prefixed: no boundary collapse") {
    import org.apache.spark.sql.Row
    // the r13 ADVICE collapse classes — digit drift and string drift
    // across a cell boundary, in the Row branch specifically
    assert(render(Row(12L, 3L)) != render(Row(1L, 23L)))
    assert(render(Row("ab", "c")) != render(Row("a", "bc")))
    // a cell CONTAINING the join separator still can't fake a boundary
    assert(render(Row("1:a")) != render(Row("1", "a").toSeq.map(render).mkString("|"))
      && render(Row("a|b")) != render(Row("a", "b")))
    // the top-level row body join in fingerprint() uses the same joinCells
    import graft.tools.ClusterCheck.joinCells
    assert(joinCells(Seq("12", "3")) != joinCells(Seq("1", "23")))
    assert(joinCells(Seq("a|b")) != joinCells(Seq("a", "b")))
    assert(joinCells(Seq("2:ab")) != joinCells(Seq("ab", "")))
    assert(joinCells(Seq("")) != joinCells(Seq("", "")))
    assert(joinCells(Nil) != joinCells(Seq("")))
  }

  test("Seq/Map element boundaries are length-prefixed too: separator chars can't fake them") {
    // the round-14 review collapse classes: a plain "," / "=" join made
    // these pairs render identically
    assert(render(Seq("a,b")) != render(Seq("a", "b")))
    assert(render(Map("a=1" -> "x")) != render(Map("a" -> "1=x")))
    assert(render(Map("a|b" -> "c")) != render(Map("a" -> "b|c")))
    // order-independence of map rendering survives the change
    assert(render(Map("a" -> 1L, "b" -> 2L)) == render(Map("b" -> 2L, "a" -> 1L)))
  }

  test("binary renders by content, numeric types keep their identity") {
    assert(render(Array[Byte](1, 2)) != render(Array[Byte](1, 3)))
    assert(render(Array[Byte]()) != render(""))
    // Long vs String spelling of the same digits must differ is NOT
    // guaranteed (both toString) — rows carry a schema hash alongside,
    // which is what separates same-spelling cross-type columns
    assert(render(42L) == "42")
  }
}
