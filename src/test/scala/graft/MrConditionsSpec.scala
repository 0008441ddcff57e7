package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.operators.MrConditions

/** The cross-variable DEFINE interpreter in isolation: parsing, three-valued
  * logic, numeric exactness rules, and run-placement resolution (the scan
  * integration is covered in MatchRecognizeScanSpec).
  */
class MrConditionsSpec extends org.scalatest.funsuite.AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("v", DoubleType), StructField("n", LongType),
    StructField("s", StringType), StructField("d", DecimalType(18, 2))))
  private val varIdx = Map("A" -> 0, "B" -> 1, "C" -> 2)

  /** rows(i) = buffered row at position i; A matched [0, aCnt), B [aCnt,
    * aCnt+bCnt); the candidate is classified as C with its run starting at
    * itself.
    */
  private def ctx(rows: IndexedSeq[Row], cand: Row, aCnt: Int, bCnt: Int): MrConditions.Ctx =
    new MrConditions.Ctx {
      def cur: Row = cand
      def rowAt(pos: Int): Row = rows(pos)
      def selfTok: Int = 2
      def selfRunStart: Int = aCnt + bCnt
      def selfPos: Int = aCnt + bCnt // run of one: the candidate row itself
      def starts: Array[Int] = Array(0, aCnt, aCnt + bCnt)
      def counts: Array[Int] = Array(aCnt, bCnt, 0)
    }

  private def row(v: Double, n: Long, s: String): Row =
    Row(v, n, s, new java.math.BigDecimal(v).setScale(2, java.math.RoundingMode.HALF_UP))

  private val rows = IndexedSeq(row(1.0, 10, "a"), row(2.0, 20, "b"), row(3.0, 30, "c"))
  private val cand = row(5.0, 50, "z")
  private val c11 = ctx(rows :+ cand, cand, 1, 2) // A=[r0], B=[r1,r2], cand=C

  private def holds(cond: String, c: MrConditions.Ctx = c11): Boolean =
    MrConditions.compile(cond, schema, varIdx, "C").holds(c)

  test("var refs resolve against the attempt: FIRST/LAST/bare, self, forward") {
    assert(holds("FIRST(A.v) = 1.0 AND LAST(A.v) = 1.0"))
    assert(holds("FIRST(B.v) = 2.0 AND LAST(B.v) = 3.0 AND B.v = 3.0")) // bare = running LAST
    assert(holds("C.v = 5.0 AND LAST(C.v) = 5.0 AND FIRST(C.v) = 5.0")) // self = candidate/run start
    assert(holds("v = 5.0 AND n = 50")) // bare columns = candidate row
    // empty earlier run and forward references are NULL -> never hold
    val empty = ctx(rows :+ cand, cand, 3, 0)
    assert(!holds("C.v > LAST(B.v)", empty) && !holds("C.v <= LAST(B.v)", empty))
  }

  test("logical offsets: FIRST/LAST(v.col, k) index the run, NULL past it") {
    assert(holds("FIRST(B.v, 1) = 3.0 AND LAST(B.v, 1) = 2.0")) // B=[r1, r2]
    assert(holds("LAST(B.v, 2) IS NULL AND FIRST(B.v, 2) IS NULL")) // run of 2
    assert(holds("FIRST(C.v, 0) = 5.0 AND LAST(C.v, 1) IS NULL")) // self run of 1
    assert(holds("FIRST(A.n, 0) = 10 AND LAST(A.n, 0) = 10")) // run of 1: k=0 both ends
  }

  test("three-valued logic: NULL propagates through NOT/compare, short-circuits AND/OR") {
    val nul = ctx(rows :+ cand, cand, 3, 0) // B empty -> B.v is NULL
    assert(!holds("NOT (B.v > 0)", nul)) // NOT UNKNOWN = UNKNOWN -> false
    assert(holds("B.v > 0 OR v = 5.0", nul)) // UNKNOWN OR TRUE = TRUE
    assert(!holds("B.v > 0 AND v = 5.0", nul)) // UNKNOWN AND TRUE = UNKNOWN
    assert(!holds("v = 5.0 AND B.v IS NOT NULL", nul))
    assert(holds("B.v IS NULL", nul) && holds("v IS NOT NULL", nul))
  }

  test("numeric model: exact decimal for integral/decimal, double once a double joins") {
    assert(holds("d = 5.0 OR d = 5")) // decimal column vs literals
    assert(holds("n + 10 = 60 AND n * 2 = 100 AND n - 1 = 49")) // exact BigDecimal
    assert(holds("n / 4 = 12.5")) // division is double
    assert(holds("0.1 + 0.2 <> 0.3")) // double literals stay IEEE doubles
    assert(holds("-n = -50 AND -(v - 6.0) = 1.0"))
    assert(holds("'b' < 's' AND s = 'z'")) // strings compare lexically
  }

  test("plan-time type check: boolean/numeric misuse fails at compile, not per-row") {
    def bad(cond: String) = intercept[RuntimeException](
      MrConditions.compile(cond, schema, varIdx, "C")).getMessage
    // the r10 shape: `A.v AND B.v` over numeric v compiled then threw
    // ClassCastException per-row on an executor — now a loud plan-time error
    assert(bad("A.v AND B.v").contains("type error"), bad("A.v AND B.v"))
    assert(bad("v OR n > 0").contains("boolean operand"))
    assert(bad("NOT v").contains("boolean operand"))
    assert(bad("s > 1").contains("cannot compare"))
    assert(bad("s + 1 = 2").contains("numeric operand"))
    assert(bad("-s = 'a'").contains("numeric operand"))
    assert(bad("v < s").contains("cannot compare"))
    assert(bad("v + 1").contains("must be a boolean condition"))
    // NULL literal is compatible with everything; IS NULL takes any operand
    MrConditions.compile("v = NULL OR s IS NOT NULL", schema, varIdx, "C")
  }

  test("NEXT() under allowNav: physical forward read; past the newest row DEFERS") {
    val buf = rows :+ cand // positions 0..3
    def navCtx(pos: Int, newest: Int): MrConditions.Ctx = new MrConditions.Ctx {
      def cur: Row = buf(pos)
      def rowAt(p: Int): Row = buf(p)
      def selfTok: Int = 2
      def selfRunStart: Int = pos
      def selfPos: Int = pos
      def starts: Array[Int] = Array(0, 0, pos)
      def counts: Array[Int] = Array(0, 0, 0)
      override def maxPos: Int = newest
    }
    val c = MrConditions.compile("NEXT(C.v) > C.v", schema, varIdx, "C", allowNav = true)
    assert(c.holdsOrDefer(navCtx(1, 3)) == 1) // rows(2).v=3.0 > rows(1).v=2.0
    val fall = MrConditions.compile("NEXT(C.v) < C.v", schema, varIdx, "C", allowNav = true)
    assert(fall.holdsOrDefer(navCtx(1, 3)) == 0)
    // the candidate IS the newest row: its successor has not arrived -> defer
    assert(c.holdsOrDefer(navCtx(3, 3)) == -1)
    // NEXT(C.v, 2) reaches one past a single successor -> still deferred
    val two = MrConditions.compile("NEXT(C.v, 2) > C.v", schema, varIdx, "C", allowNav = true)
    assert(two.holdsOrDefer(navCtx(2, 3)) == -1)
    assert(two.holdsOrDefer(navCtx(1, 3)) == 1)
    // batch routes (no allowNav) still rewrite NEXT before reaching here
    val e = intercept[RuntimeException](
      MrConditions.compile("NEXT(C.v) > C.v", schema, varIdx, "C")).getMessage
    assert(e.contains("unsupported function"), e)
  }

  test("loud plan-time failures: syntax, unknown names — on BOTH paths") {
    // functions/CASE/BETWEEN are no longer refusals — they compile through
    // the Catalyst fallback (MatchRecognizeScanSpec pins route parity); the
    // conditions here fail the interpreter AND the fallback, and the error
    // must carry the interpreter's reason
    def bad(cond: String) = intercept[RuntimeException](
      MrConditions.compile(cond, schema, varIdx, "C")).getMessage
    assert(bad("v > X.v").contains("unknown qualifier"))
    assert(bad("FIRST(A.nope) > 1").contains("unknown column"))
    assert(bad("v >").contains("unexpected"))
  }
}
