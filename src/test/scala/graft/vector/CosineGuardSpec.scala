package graft.vector

import org.scalatest.funsuite.AnyFunSuite

/** Pins guardedCosine's routing contract for the degenerate inputs the hot
  * loops never see but a malformed corpus can produce (advisor round-7
  * finding): length-mismatched vectors score over ONE consistent span, and
  * denormal norm pairs route to the -1.0 sentinel instead of dividing by a
  * product that underflowed to zero.
  */
class CosineGuardSpec extends AnyFunSuite {

  test("length-mismatched vectors score all three terms over the shared prefix") {
    val a = Array(3f, 4f) // |a| over prefix(1) = 3
    val c = Array(3f, 0f, 0f, 100f) // |c| over prefix(2) = 3
    // precomputed norms deliberately full-length (what assign()/probeLists()
    // would hand in): guardedCosine must ignore them on mismatch
    val got = IvfIndex.guardedCosine(a, c, IvfIndex.norm(a), IvfIndex.norm(c))
    // shared prefix is length 2: dot = 9, |a|=5, |c|=3 over that prefix
    assert(math.abs(got - 9.0 / (5.0 * 3.0)) < 1e-12, s"got $got")
    // equal-length path still uses the caller's norms verbatim
    val eq = IvfIndex.guardedCosine(Array(1f, 0f), Array(1f, 0f), 1.0, 1.0)
    assert(eq == 1.0)
  }

  test("denormal norm pairs route to -1.0 instead of dividing by an underflowed product") {
    val tiny = java.lang.Double.MIN_VALUE // denormal: tiny * tiny == 0.0 exactly
    val a = Array(1f, 0f)
    val got = IvfIndex.guardedCosine(a, a, tiny, tiny)
    assert(got == -1.0, s"denormal-product pair must take the sentinel, got $got")
    // plain zero vectors keep the old behavior too
    assert(IvfIndex.safeCosine(Array(0f, 0f), Array(1f, 0f)) == -1.0)
  }
}
