package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Cross-variable DEFINE conditions for the MATCH_RECOGNIZE NFA cursor scan
  * (r10 — closes the scan route's "state an upper bound" refusal).
  *
  * The bounded lead()-expansion path evaluates cross-variable conditions by
  * enumerating every fixed-length alternative; the NFA scan cannot (unbounded
  * runs have no fixed offsets), but it buffers the full rows of the current
  * attempt, and inside one attempt every earlier variable's run placement is
  * FIXED by the time a row is tested — so `LAST(A.col)` / `FIRST(A.col)` /
  * `A.col` are direct reads of buffered rows. This module parses the SQL
  * condition text into a tiny AST and evaluates it per candidate row with SQL
  * (Kleene) three-valued logic.
  *
  * Division of labor, by design:
  *   - row-local DEFINEs (the common case) stay Catalyst-compiled boolean
  *     columns — whole-stage codegen, zero interpretation;
  *   - `PREV`/`NEXT` physical navigation is rewritten by the SQL frontend to
  *     precomputed lag()/lead() helper columns BEFORE compilation here (the
  *     window shares the scan's one exchange + sort), so the interpreter only
  *     ever reads the candidate row and in-attempt run rows — never rows
  *     outside the buffer;
  *   - only DEFINEs that genuinely reference another variable's rows (or the
  *     self run's FIRST) pay the interpreted-atom cost, and only on rows the
  *     NFA actually tests.
  *
  * RUNNING visibility (the standard's DEFINE semantics, matching the bounded
  * path's `subst`): while classifying a row as variable `v`, a reference to
  * an EARLIER pattern variable resolves against its matched run in this
  * attempt (empty run → NULL); `v`'s own bare/LAST refs are the candidate row
  * and FIRST(v.col) the run's first row; references to LATER variables are
  * NULL — their conditions can never hold, exactly as the standard
  * prescribes.
  *
  * Supported surface (loud [[sys.error]] beyond it, with the bounded-path
  * hint): AND/OR/NOT, comparisons (= == <> != < <= > >=), IS [NOT] NULL,
  * arithmetic (+ - * / and unary -), parentheses, numeric/string/boolean/NULL
  * literals, bare column refs (candidate row), `var.col`, and
  * `FIRST|LAST(var.col)`. Numeric comparisons and + - * are exact
  * (BigDecimal) when both operands are integral/decimal, double otherwise;
  * division is always double — the same determinism contract the catalog's
  * oracle queries pin.
  */
object MrConditions {

  // ------------------------------------------------------------------- AST
  private sealed trait Ex
  private case class Lit(v: Any) extends Ex
  private case class Col(idx: Int) extends Ex // candidate row's column
  /** kind: 0 = FIRST, 1 = LAST/bare (running last); `off` = Flink's logical
    * occurrence offset (`FIRST(A.c, k)` = the (k+1)-th matched row, `LAST(A.c,
    * k)` = k back from the last; out-of-run → NULL).
    */
  private case class VarCol(tok: Int, kind: Int, idx: Int, off: Int = 0) extends Ex
  /** PREV(self.col, n): PHYSICAL navigation, candidate position − n. Only
    * produced under `allowNav` (the STREAMING route, which cannot precompute
    * lag() columns — the batch routes rewrite PREV to Catalyst nav columns
    * before compiling here). Before the buffer's retained range → NULL, the
    * partition-edge rule; NEXT is refused on this route (an unarrived row is
    * not a NULL — it would decide starts prematurely).
    */
  private case class PrevNav(n: Int, idx: Int) extends Ex
  private case class Un(op: String, e: Ex) extends Ex // NOT, NEG, ISNULL, ISNOTNULL
  private case class Bin(op: String, l: Ex, r: Ex) extends Ex

  /** Evaluation context the scan provides per tested row: the candidate row,
    * absolute-in-buffer accessors, and the current attempt's per-token run
    * placements (valid for tokens strictly before `selfTok`; `selfRunStart`
    * is the current token's run start).
    */
  trait Ctx {
    def cur: Row
    def rowAt(pos: Int): Row
    def selfTok: Int
    def selfRunStart: Int
    /** The candidate row's buffer position (= the self run's last position
      * under RUNNING semantics — offset navigation needs it).
      */
    def selfPos: Int
    def starts: Array[Int]
    def counts: Array[Int]
    /** Lowest buffer position `rowAt` can answer (physical PREV below it is
      * NULL — the partition-edge/retention rule). Batch contexts use 0.
      */
    def minPos: Int = 0
  }

  /** A compiled condition; `holds` is the final TRUE-or-not collapse of the
    * three-valued result (UNKNOWN → false, SQL WHERE semantics).
    */
  final class Compiled private[MrConditions] (root: Ex, val source: String) extends Serializable {
    private[MrConditions] def rootEx: Ex = root
    def holds(ctx: Ctx): Boolean = eval(root, ctx) match {
      case b: java.lang.Boolean => b.booleanValue()
      case _ => false // null/unknown
    }
  }

  /** Parse + resolve `cond` against the input schema. `varIdx` maps pattern
    * variable name → token index; `selfVar` is the variable being DEFINEd.
    * `allowNav` admits physical `PREV(self.col, n)` as an interpreter atom
    * (the streaming route — batch rewrites PREV to Catalyst lag() columns
    * instead); NEXT stays refused there, see [[PrevNav]].
    */
  def compile(cond: String, schema: StructType, varIdx: Map[String, Int],
              selfVar: String, allowNav: Boolean = false): Compiled = {
    require(varIdx.contains(selfVar), s"unknown DEFINE variable '$selfVar'")
    val p = new Parser(cond, schema, varIdx, if (allowNav) Some(selfVar) else None)
    val ex = p.parseAll()
    new Compiled(ex, cond)
  }

  /** Maximum physical PREV depth a compiled condition can reach — the
    * streaming operator's retention margin before the first undecided start.
    */
  def maxPrevDepth(c: Compiled): Int = {
    def walk(e: Ex): Int = e match {
      case PrevNav(n, _) => n
      case Un(_, x) => walk(x)
      case Bin(_, l, r) => math.max(walk(l), walk(r))
      case _ => 0
    }
    walk(c.rootEx)
  }

  // ------------------------------------------------------------ evaluation
  private def eval(e: Ex, ctx: Ctx): Any = e match {
    case Lit(v) => v
    case Col(i) => get(ctx.cur, i)
    case VarCol(tok, kind, i, off) =>
      val self = ctx.selfTok
      if (tok > self) null // forward reference: nothing matched yet
      else if (tok == self) {
        // running semantics: the run so far is [selfRunStart, selfPos]
        val p = if (kind == 1) ctx.selfPos - off else ctx.selfRunStart + off
        if (p < ctx.selfRunStart || p > ctx.selfPos) null // offset past the run
        else get(ctx.rowAt(p), i)
      } else {
        val c = ctx.counts(tok)
        if (c <= off) null // empty/short earlier run → NULL
        else if (kind == 0) get(ctx.rowAt(ctx.starts(tok) + off), i)
        else get(ctx.rowAt(ctx.starts(tok) + c - 1 - off), i)
      }
    case PrevNav(nBack, i) =>
      val p = ctx.selfPos - nBack
      if (p < ctx.minPos) null else get(ctx.rowAt(p), i)
    case Un("NOT", x) => eval(x, ctx) match {
      case b: java.lang.Boolean => java.lang.Boolean.valueOf(!b.booleanValue())
      case _ => null
    }
    case Un("NEG", x) => eval(x, ctx) match {
      case null => null
      case v => arith("-", java.math.BigDecimal.ZERO, v)
    }
    case Un("ISNULL", x) => java.lang.Boolean.valueOf(eval(x, ctx) == null)
    case Un("ISNOTNULL", x) => java.lang.Boolean.valueOf(eval(x, ctx) != null)
    case Un(op, _) => sys.error(s"MrConditions: unknown unary '$op'")
    case Bin("AND", l, r) => kleene(eval(l, ctx), eval(r, ctx), and = true)
    case Bin("OR", l, r) => kleene(eval(l, ctx), eval(r, ctx), and = false)
    case Bin(op, l, r) if op == "+" || op == "-" || op == "*" || op == "/" =>
      val lv = eval(l, ctx); val rv = eval(r, ctx)
      if (lv == null || rv == null) null else arith(op, lv, rv)
    case Bin(op, l, r) =>
      val lv = eval(l, ctx); val rv = eval(r, ctx)
      if (lv == null || rv == null) null
      else {
        val c = cmp(lv, rv)
        java.lang.Boolean.valueOf(op match {
          case "=" => c == 0
          case "<>" => c != 0
          case "<" => c < 0
          case "<=" => c <= 0
          case ">" => c > 0
          case ">=" => c >= 0
          case other => sys.error(s"MrConditions: unknown comparison '$other'")
        })
      }
  }

  private def kleene(l: Any, r: Any, and: Boolean): Any = {
    val lb = l.asInstanceOf[java.lang.Boolean]
    val rb = r.asInstanceOf[java.lang.Boolean]
    if (and) {
      if (lb != null && !lb) java.lang.Boolean.FALSE
      else if (rb != null && !rb) java.lang.Boolean.FALSE
      else if (lb == null || rb == null) null
      else java.lang.Boolean.TRUE
    } else {
      if (lb != null && lb) java.lang.Boolean.TRUE
      else if (rb != null && rb) java.lang.Boolean.TRUE
      else if (lb == null || rb == null) null
      else java.lang.Boolean.FALSE
    }
  }

  private def get(r: Row, i: Int): Any = if (r.isNullAt(i)) null else r.get(i)

  /** BigDecimal-capable = exact integral/decimal external types. */
  private def bd(v: Any): java.math.BigDecimal = v match {
    case b: java.math.BigDecimal => b
    case b: scala.math.BigDecimal => b.bigDecimal
    case n: java.lang.Long => java.math.BigDecimal.valueOf(n.longValue())
    case n: java.lang.Integer => java.math.BigDecimal.valueOf(n.longValue())
    case n: java.lang.Short => java.math.BigDecimal.valueOf(n.longValue())
    case n: java.lang.Byte => java.math.BigDecimal.valueOf(n.longValue())
    case _ => null
  }
  private def dbl(v: Any): java.lang.Double = v match {
    case d: java.lang.Double => d
    case f: java.lang.Float => java.lang.Double.valueOf(f.toString.toDouble)
    case n: java.lang.Number => java.lang.Double.valueOf(n.doubleValue())
    case _ => null
  }
  private def micros(v: Any): java.lang.Long = v match {
    case t: java.sql.Timestamp =>
      java.lang.Long.valueOf(Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000)
    case t: java.time.Instant => java.lang.Long.valueOf(t.getEpochSecond * 1000000L + t.getNano / 1000)
    case t: java.time.LocalDateTime =>
      val i = t.toInstant(java.time.ZoneOffset.UTC)
      java.lang.Long.valueOf(i.getEpochSecond * 1000000L + i.getNano / 1000)
    case _ => null
  }

  private def cmp(l: Any, r: Any): Int = (l, r) match {
    case (a: String, b: String) => a.compareTo(b)
    case (a: java.lang.Boolean, b: java.lang.Boolean) => a.compareTo(b)
    case _ =>
      val lm = micros(l); val rm = micros(r)
      if (lm != null && rm != null) java.lang.Long.compare(lm, rm)
      else {
        val lb = bd(l); val rb = bd(r)
        if (lb != null && rb != null) lb.compareTo(rb)
        else {
          val ld = dbl(l); val rd = dbl(r)
          if (ld != null && rd != null) java.lang.Double.compare(ld, rd)
          else sys.error(s"MrConditions: cannot compare ${l.getClass.getSimpleName} " +
            s"with ${r.getClass.getSimpleName}")
        }
      }
  }

  private def arith(op: String, l: Any, r: Any): Any = {
    val lb = bd(l); val rb = bd(r)
    if (op != "/" && lb != null && rb != null) op match {
      case "+" => lb.add(rb)
      case "-" => lb.subtract(rb)
      case "*" => lb.multiply(rb)
      case other => sys.error(s"MrConditions: unknown arithmetic '$other'")
    } else {
      val ld = dbl(l); val rd = dbl(r)
      if (ld == null || rd == null)
        sys.error(s"MrConditions: non-numeric operand for '$op' " +
          s"(${l.getClass.getSimpleName}, ${r.getClass.getSimpleName})")
      op match {
        case "+" => java.lang.Double.valueOf(ld + rd)
        case "-" => java.lang.Double.valueOf(ld - rd)
        case "*" => java.lang.Double.valueOf(ld * rd)
        case "/" => java.lang.Double.valueOf(ld / rd)
        case other => sys.error(s"MrConditions: unknown arithmetic '$other'")
      }
    }
  }

  // --------------------------------------------------------------- parsing
  private final class Parser(src: String, schema: StructType,
                             varIdx: Map[String, Int],
                             navSelf: Option[String] = None) {
    private var pos = 0
    private def fail(msg: String): Nothing =
      sys.error(s"MATCH_RECOGNIZE cross-variable DEFINE: $msg at offset $pos in: $src " +
        "(supported: AND/OR/NOT, comparisons, IS [NOT] NULL, + - * /, literals, " +
        "column refs, var.col, FIRST/LAST(var.col); state an upper bound to use " +
        "the full bounded-rewrite surface)")
    private def ws(): Unit = while (pos < src.length && src.charAt(pos).isWhitespace) pos += 1
    private def peek: Char = if (pos < src.length) src.charAt(pos) else ' '
    private def kw(k: String): Boolean = { // case-insensitive keyword with word boundary
      ws()
      if (src.regionMatches(true, pos, k, 0, k.length) &&
        (pos + k.length >= src.length || !isIdentChar(src.charAt(pos + k.length)))) {
        pos += k.length; true
      } else false
    }
    private def isIdentChar(c: Char) = c.isLetterOrDigit || c == '_'

    def parseAll(): Ex = {
      val e = orExpr()
      ws()
      if (pos != src.length) fail(s"unexpected trailing input '${src.substring(pos)}'")
      e
    }
    private def orExpr(): Ex = {
      var l = andExpr()
      while (kw("OR")) l = Bin("OR", l, andExpr())
      l
    }
    private def andExpr(): Ex = {
      var l = notExpr()
      while (kw("AND")) l = Bin("AND", l, notExpr())
      l
    }
    private def notExpr(): Ex = if (kw("NOT")) Un("NOT", notExpr()) else cmpExpr()
    private def cmpExpr(): Ex = {
      val l = addExpr()
      ws()
      if (kw("IS")) {
        val neg = kw("NOT")
        if (!kw("NULL")) fail("expected NULL after IS [NOT]")
        Un(if (neg) "ISNOTNULL" else "ISNULL", l)
      } else {
        val op =
          if (src.startsWith("<=", pos)) { pos += 2; "<=" }
          else if (src.startsWith(">=", pos)) { pos += 2; ">=" }
          else if (src.startsWith("<>", pos)) { pos += 2; "<>" }
          else if (src.startsWith("!=", pos)) { pos += 2; "<>" }
          else if (src.startsWith("==", pos)) { pos += 2; "=" }
          else if (peek == '<') { pos += 1; "<" }
          else if (peek == '>') { pos += 1; ">" }
          else if (peek == '=') { pos += 1; "=" }
          else null
        if (op == null) l else Bin(op, l, addExpr())
      }
    }
    private def addExpr(): Ex = {
      var l = mulExpr()
      var go = true
      while (go) {
        ws()
        if (peek == '+') { pos += 1; l = Bin("+", l, mulExpr()) }
        else if (peek == '-') { pos += 1; l = Bin("-", l, mulExpr()) }
        else go = false
      }
      l
    }
    private def mulExpr(): Ex = {
      var l = unary()
      var go = true
      while (go) {
        ws()
        if (peek == '*') { pos += 1; l = Bin("*", l, unary()) }
        else if (peek == '/') { pos += 1; l = Bin("/", l, unary()) }
        else go = false
      }
      l
    }
    private def unary(): Ex = {
      ws()
      if (peek == '-') { pos += 1; Un("NEG", unary()) } else primary()
    }
    private def primary(): Ex = {
      ws()
      if (peek == '(') {
        pos += 1
        val e = orExpr()
        ws()
        if (peek != ')') fail("expected ')'")
        pos += 1
        e
      } else if (peek == '\'') {
        pos += 1
        val sb = new StringBuilder
        while (pos < src.length && src.charAt(pos) != '\'') { sb += src.charAt(pos); pos += 1 }
        if (pos >= src.length) fail("unterminated string literal")
        pos += 1
        Lit(sb.toString)
      } else if (peek.isDigit || (peek == '.' && pos + 1 < src.length && src.charAt(pos + 1).isDigit)) {
        val start = pos
        while (pos < src.length && (src.charAt(pos).isDigit || src.charAt(pos) == '.')) pos += 1
        if (pos < src.length && (src.charAt(pos) == 'e' || src.charAt(pos) == 'E')) {
          pos += 1
          if (peek == '+' || peek == '-') pos += 1
          while (pos < src.length && src.charAt(pos).isDigit) pos += 1
        }
        val tok = src.substring(start, pos)
        if (tok.contains('.') || tok.toLowerCase.contains('e')) Lit(java.lang.Double.valueOf(tok))
        else Lit(new java.math.BigDecimal(tok))
      } else if (isIdentChar(peek)) {
        val start = pos
        while (pos < src.length && isIdentChar(src.charAt(pos))) pos += 1
        val name = src.substring(start, pos)
        name.toUpperCase match {
          case "TRUE" => Lit(java.lang.Boolean.TRUE)
          case "FALSE" => Lit(java.lang.Boolean.FALSE)
          case "NULL" => Lit(null)
          case "FIRST" | "LAST" => firstLast(name.toUpperCase)
          case "PREV" if navSelf.isDefined => prevNav()
          case "NEXT" if navSelf.isDefined =>
            fail("NEXT() is not available on the streaming route — an unarrived row " +
              "is not a NULL; use the batch form")
          case _ =>
            ws()
            if (peek == '.') { // var.col or unknown qualifier
              pos += 1
              val cstart = pos
              while (pos < src.length && isIdentChar(src.charAt(pos))) pos += 1
              val c = src.substring(cstart, pos)
              varIdx.get(name) match {
                case Some(tok) => VarCol(tok, 1, colIdx(c)) // bare = running LAST
                case None => fail(s"unknown qualifier '$name' (not a pattern variable)")
              }
            } else if (peek == '(') {
              fail(s"unsupported function '$name'")
            } else Col(colIdx(name)) // bare column: the candidate row
        }
      } else fail(s"unexpected character '$peek'")
    }
    private def firstLast(kind: String): Ex = {
      ws()
      if (peek != '(') fail(s"expected '(' after $kind")
      pos += 1
      ws()
      val vstart = pos
      while (pos < src.length && isIdentChar(src.charAt(pos))) pos += 1
      val v = src.substring(vstart, pos)
      ws()
      if (peek != '.') fail(s"$kind() needs var.col")
      pos += 1
      val cstart = pos
      while (pos < src.length && isIdentChar(src.charAt(pos))) pos += 1
      val c = src.substring(cstart, pos)
      ws()
      // optional Flink logical offset: FIRST(A.c, k) / LAST(A.c, k)
      var off = 0
      if (peek == ',') {
        pos += 1; ws()
        val nstart = pos
        while (pos < src.length && src.charAt(pos).isDigit) pos += 1
        if (pos == nstart) fail(s"$kind() offset must be a non-negative integer literal")
        off = src.substring(nstart, pos).toInt
        ws()
      }
      if (peek != ')') fail(s"expected ')' closing $kind()")
      pos += 1
      val tok = varIdx.getOrElse(v, fail(s"$kind() over unknown pattern variable '$v'"))
      VarCol(tok, if (kind == "FIRST") 0 else 1, colIdx(c), off)
    }
    /** `PREV(self.col [, n])` under `navSelf` — physical back-navigation. */
    private def prevNav(): Ex = {
      ws()
      if (peek != '(') fail("expected '(' after PREV")
      pos += 1
      ws()
      val vstart = pos
      while (pos < src.length && isIdentChar(src.charAt(pos))) pos += 1
      val v = src.substring(vstart, pos)
      ws()
      if (peek != '.') fail("PREV() needs var.col")
      pos += 1
      val cstart = pos
      while (pos < src.length && isIdentChar(src.charAt(pos))) pos += 1
      val c = src.substring(cstart, pos)
      ws()
      var n = 1
      if (peek == ',') {
        pos += 1; ws()
        val nstart = pos
        while (pos < src.length && src.charAt(pos).isDigit) pos += 1
        if (pos == nstart) fail("PREV() offset must be a non-negative integer literal")
        n = src.substring(nstart, pos).toInt
        ws()
      }
      if (peek != ')') fail("expected ')' closing PREV()")
      pos += 1
      if (!varIdx.contains(v)) fail(s"PREV() over unknown pattern variable '$v'")
      if (!navSelf.contains(v))
        fail(s"PREV() may only navigate the variable being DEFINEd, got PREV($v.$c)")
      PrevNav(n, colIdx(c))
    }

    private def colIdx(c: String): Int =
      try schema.fieldIndex(c)
      catch { case _: IllegalArgumentException => fail(s"unknown column '$c'") }
  }
}
