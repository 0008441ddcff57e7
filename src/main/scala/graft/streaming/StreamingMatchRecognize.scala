package graft.streaming

import java.sql.Timestamp

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.catalyst.expressions.GenericRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, OutputMode}
import org.apache.spark.sql.types._

import graft.operators.{MatchRecognize, MrConditions}

/** Streaming MATCH_RECOGNIZE over VALUE predicates — the ticker idiom
  * (`D AS D.value < PREV(D.value)`) as a standing query, which the typed
  * operator ([[StreamingSequenceMatchQ]], literal type tokens only) cannot
  * express (r10; Flink's CEP runs these natively, so a reference user's
  * first streaming value pattern lands here).
  *
  * Semantics contract: identical greedy leftmost-longest selection to the
  * batch NFA scan ([[MatchRecognize.scan]]) — bounded, unbounded AND
  * reluctant quantifiers, cross-variable / FIRST() / logical-offset DEFINE
  * conditions — decided with the streaming twins' open/dead/winner rules: a
  * run still extensible by future events stays OPEN until a breaking event,
  * the WITHIN horizon, or (reluctant) the shortest completion the moment it
  * exists. On a closed stream the emitted spans equal the batch scan's
  * row-for-row (spec-pinned).
  *
  * DEFINE columns (r11 — generalized from the r10 one-numeric+one-string
  * shape): `condCols` are the columns the conditions reference, buffered
  * per row in their ORIGINAL external types — integral/decimal values
  * compare exactly (BigDecimal), never through a lossy double cast, so
  * streaming spans agree with the batch scan bit-for-bit on wide longs and
  * high-precision decimals. Any number of numeric/string/boolean/time
  * columns is accepted; conditions are plan-time type-checked against the
  * projected schema.
  *
  * DEFINE evaluation: the batch routes precompute row-local booleans as
  * Catalyst lag()/lead() columns — a stream cannot (no lag over an unbounded
  * preceding window), so EVERY condition here runs on [[MrConditions]] with
  * `allowNav`: `PREV(V.col, n)` is physical back-navigation into the per-key
  * buffer, and rows below the retention margin answer NULL exactly like rows
  * before a batch partition's start. `NEXT(V.col, n)` (r11, Flink's streaming
  * semantics) is physical forward-navigation with ONE-EVENT DECISION
  * DEFERRAL: a read past the newest buffered row does not evaluate to NULL —
  * the whole attempt stays OPEN until the successor arrives (it always does,
  * or the stream ends and the open attempt never emits, the bounded-stream
  * tail contract shared with unbounded greedy runs).
  *
  * Event-time order contract: rows are sorted by (ts, tie) WITHIN each
  * micro-batch, but the buffer is append-only across batches — in-order
  * arrival per key across micro-batches is the parity contract's assumption
  * (the bounded replays and Kafka-per-key ordering satisfy it). A late event
  * arriving BELOW the buffer tail is detected, counted, logged loudly at
  * ERROR, and DROPPED — the watermark rule applied even when no TTL
  * watermark is configured — rather than silently corrupting PREV navigation
  * and run detection.
  *
  * Scale shape: one `groupByKey(key)` shuffle; per-key state is the rows
  * from `navDepth` before the selection frontier onward (navDepth = the
  * deepest PREV offset any condition uses) — the typed operator's
  * decided-prefix eviction plus that margin, so state is O(longest open
  * attempt + navDepth), event-time-capped by WITHIN and wall-capped by the
  * TTL. Buffered rows wrap their cell arrays in a [[GenericRow]] ONCE at
  * append/restore time — the interpreter's per-read path allocates nothing.
  * Nothing reaches the driver.
  */
object StreamingMatchRecognize {

  /** A value MEASURE over the buffered columns (r11 — Flink standing queries
    * report prices, not just span timestamps): `FIRST|LAST(tokens(tok).name
    * .col)` where `col` must be one of the operator's buffered `condCols`.
    * Emitted per match from the winning placement; a token that matched no
    * rows yields NULL (the optional-variable rule).
    */
  case class MrMeasure(isFirst: Boolean, tok: Int, col: String, alias: String)

  /** An aggregate MEASURE over a variable's matched rows (r11 — Flink CEP
    * supports aggregates in standing MEASURES; the batch scan's exactness
    * contract applies): fn ∈ cnt|sum|min|max|avg over `col` of the winning
    * run; `col = "*"` only for cnt (= run length). cnt emits LongType (0 on
    * an empty run); sum an EXACT DecimalType(38,6) over HALF_UP-scale-6
    * values (order-independent, bit-equal to the batch scan and the DuckDB
    * decimal forms); avg ONE double division of that exact sum by the
    * non-null count; min/max the column's type by natural order. Non-cnt
    * aggregates are NULL on an empty run.
    */
  case class MrAggMeasure(fn: String, tok: Int, col: String, alias: String) {
    require(Set("cnt", "sum", "min", "max", "avg").contains(fn), s"unknown aggregate '$fn'")
    require(col != "*" || fn == "cnt", s"'$fn(*)' is not a thing — name a column")
  }

  /** Aligned per-row state; `cells(i)` = row i's condCols values in their
    * original external types (Kryo-encoded state — the only state this
    * module keeps); `cursor` = the skip-past selection cursor's index within
    * the retained arrays (0 in skip-to-next mode); `undecided` =
    * skip-to-next per-position flags (margin-retained rows are decided);
    * `matchSeq` = the key's emitted-match ordinal so far (MATCH_NUMBER(),
    * r11 — skip-past emission is positional, so the ordinal equals the
    * batch scan's `__mr_seq`).
    */
  case class Buf(cells: Array[Array[Any]], tsMicros: Array[Long], ties: Array[Long],
                 cursor: Int, undecided: Array[Boolean], matchSeq: Long = 0L)

  /** Mutable evaluation context over the growing per-key buffers; rows are
    * pre-wrapped GenericRows over the stored cell arrays (zero per-read
    * allocation). `brPosRef` carries the branch being attempted's variable
    * positions so cross-variable visibility is BRANCH-positional, exactly
    * the batch scan's placedBefore rule under alternation.
    */
  private final class Cx(rowsB: ArrayBuffer[Row], val startsA: Array[Int],
                         val countsA: Array[Int]) extends MrConditions.Ctx {
    var curPos = 0
    var self = 0
    var runStart = 0
    var maxP = 0
    var brPosRef: Array[Int] = _
    var selfBrPos = 0
    def cur: Row = rowsB(curPos)
    def rowAt(pos: Int): Row = rowsB(pos)
    def selfTok: Int = self
    def selfRunStart: Int = runStart
    def selfPos: Int = curPos
    def starts: Array[Int] = startsA
    def counts: Array[Int] = countsA
    override def maxPos: Int = maxP
    override def placedBefore(tok: Int): Boolean =
      brPosRef(tok) >= 0 && brPosRef(tok) < selfBrPos
  }

  /** Linear-sequence entry (the pre-r11 surface, unchanged): every token is
    * one variable in pattern order, one branch.
    */
  def apply(df: DataFrame, keyCol: String, condCols: Seq[String],
            tsCol: String, tieCol: String,
            tokens: Seq[MatchRecognize.MrTok], defs: Seq[Option[String]],
            withinSeconds: Long = 0L, ttlSeconds: Long = 0L,
            ttlWatermarkDelay: String = "0 seconds",
            skipPast: Boolean = true,
            stateProbe: Option[StreamingOps.MaxAccumulator] = None,
            measures: Seq[MrMeasure] = Seq.empty,
            aggMeasures: Seq[MrAggMeasure] = Seq.empty,
            matchNumberAlias: Option[String] = None): DataFrame = {
    require(tokens.nonEmpty, "pattern must name at least one token")
    val branch = tokens.zipWithIndex
      .map { case (t, i) => MatchRecognize.BTok(i, t.lo, t.hi, t.reluctant) }.toIndexedSeq
    applyPattern(df, keyCol, condCols, tsCol, tieCol, tokens.map(_.name), Seq(branch),
      defs, withinSeconds, ttlSeconds, ttlWatermarkDelay, skipPast, stateProbe, measures,
      aggMeasures, matchNumberAlias)
  }

  private val AggFnCode = Map("cnt" -> 0, "sum" -> 1, "min" -> 2, "max" -> 3, "avg" -> 4)

  /** Branch-general entry (r11): `branches` are [[graft.operators.MrPattern]]-
    * expanded alternative linear sequences in PREFERENCE order over the
    * GLOBAL `varNames` table — streaming alternation/grouping/PERMUTE as a
    * standing query (Flink CEP's SQL surface has none of these). Branch
    * preference under the open/dead/winner rules: at a start position the
    * branches are tried in order; a DEAD branch falls through to the next, a
    * WINNING branch emits, and an OPEN branch (extensible by future events)
    * DEFERS the whole position — a later branch that already matches must
    * not pre-empt an earlier one that may yet match (leftmost preference is
    * decided, never raced). Output exclusion is refused (the streaming shape
    * is ONE-ROW QMatch — exclusion only affects ALL ROWS emission).
    */
  def applyPattern(df: DataFrame, keyCol: String, condCols: Seq[String],
                   tsCol: String, tieCol: String,
                   varNames: Seq[String], branches: Seq[IndexedSeq[MatchRecognize.BTok]],
                   defs: Seq[Option[String]],
                   withinSeconds: Long = 0L, ttlSeconds: Long = 0L,
                   ttlWatermarkDelay: String = "0 seconds",
                   skipPast: Boolean = true,
                   stateProbe: Option[StreamingOps.MaxAccumulator] = None,
                   measures: Seq[MrMeasure] = Seq.empty,
                   aggMeasures: Seq[MrAggMeasure] = Seq.empty,
                   matchNumberAlias: Option[String] = None): DataFrame = {
    val nTok = varNames.size
    require(condCols.nonEmpty, "conditions must reference at least one column")
    require(nTok > 0, "pattern must name at least one variable")
    require(varNames.distinct.size == nTok, s"duplicate variable name in $varNames")
    require(branches.nonEmpty, "pattern must carry at least one branch")
    branches.foreach { b =>
      require(b.nonEmpty, "empty pattern branch")
      require(b.map(_.v).distinct.size == b.size, "a variable may appear only once per branch")
      b.foreach { t =>
        require(t.v >= 0 && t.v < nTok, s"branch token indexes unknown variable ${t.v}")
        require(!t.excluded,
          "streaming MATCH_RECOGNIZE does not support {- exclusion -} (ONE-ROW output shape)")
      }
    }
    require(branches.exists(_.exists(t => t.hi.forall(_ > 0))),
      "pattern admits only the empty match")
    measures.foreach { m =>
      require(m.tok >= 0 && m.tok < nTok, s"measure over unknown token index ${m.tok}")
      require(condCols.contains(m.col),
        s"measure column '${m.col}' must be among the buffered condCols $condCols")
      require(!Set("key", "match_start_ts", "match_end_ts", "start_tie", "matched_len")
        .contains(m.alias) && !m.alias.startsWith("__mr_"),
        s"measure alias '${m.alias}' collides with an output/reserved name")
    }
    aggMeasures.foreach { m =>
      require(m.tok >= 0 && m.tok < nTok, s"aggregate measure over unknown token index ${m.tok}")
      require(m.col == "*" || condCols.contains(m.col),
        s"aggregate measure column '${m.col}' must be among the buffered condCols $condCols")
      require(!Set("key", "match_start_ts", "match_end_ts", "start_tie", "matched_len")
        .contains(m.alias) && !m.alias.startsWith("__mr_"),
        s"measure alias '${m.alias}' collides with an output/reserved name")
      if (m.col != "*") {
        val dt = df.schema(m.col).dataType
        if (m.fn == "sum" || m.fn == "avg")
          require(dt.isInstanceOf[org.apache.spark.sql.types.NumericType],
            s"${m.fn.toUpperCase} MEASURES column '${m.col}' must be numeric, got ${dt.simpleString}")
        if (m.fn == "min" || m.fn == "max")
          require(dt.isInstanceOf[org.apache.spark.sql.types.NumericType] || (dt match {
            case StringType | BooleanType | DateType | TimestampType | TimestampNTZType => true
            case _ => false
          }), s"${m.fn.toUpperCase} MEASURES column '${m.col}' must have an orderable atomic " +
            s"type, got ${dt.simpleString}")
      }
    }
    // MATCH_NUMBER(): the key's 1-based emitted-match ordinal. Skip-past
    // emission is strictly positional (the cursor is the selection
    // frontier), so the ordinal equals the batch scan's __mr_seq; under
    // SKIP TO NEXT ROW a later start can decide before an earlier deferred
    // one, which would scramble the ordinals — refused loudly.
    matchNumberAlias.foreach { a =>
      require(skipPast,
        "streaming MATCH_NUMBER() requires AFTER MATCH SKIP PAST LAST ROW — under SKIP TO " +
          "NEXT ROW a deferred earlier start can emit after a later one, scrambling ordinals")
      require(!Set("key", "match_start_ts", "match_end_ts", "start_tie", "matched_len")
        .contains(a) && !a.startsWith("__mr_"),
        s"measure alias '$a' collides with an output/reserved name")
    }
    require((measures.map(_.alias) ++ aggMeasures.map(_.alias) ++ matchNumberAlias).distinct.size ==
      measures.size + aggMeasures.size + matchNumberAlias.size,
      s"duplicate measure aliases: ${measures.map(_.alias) ++ aggMeasures.map(_.alias) ++
        matchNumberAlias}")
    require(condCols.distinct == condCols, s"duplicate condCols: $condCols")
    require(!condCols.exists(_.startsWith("__mr_")),
      s"condCols collide with the operator's reserved __mr_ prefix: $condCols")
    condCols.foreach(c => require(df.columns.contains(c), s"unknown DEFINE column '$c'"))
    require(defs.size == nTok, "one DEFINE option per pattern variable")
    require(withinSeconds >= 0 && withinSeconds <= Long.MaxValue / 1000000L,
      s"withinSeconds out of range: $withinSeconds")
    if (branches.exists(_.exists(_.hi.isEmpty)) && withinSeconds == 0L && ttlSeconds == 0L)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        "StreamingMatchRecognize: unbounded quantifier with neither withinSeconds nor " +
          "ttlSeconds — an unbroken greedy run grows per-key state without bound and " +
          "never emits; set a WITHIN bound (and/or a TTL >= it) to cap state age")

    // conditions compile against the referenced columns IN THEIR ORIGINAL
    // TYPES, named as in the input so SQL DEFINE text passes through
    // unchanged; the compile also runs the plan-time type check
    val condSchema = StructType(condCols.map(c => df.schema(c)))
    val varIdx = varNames.zipWithIndex.toMap
    val compiled: Array[MrConditions.Compiled] = defs.zipWithIndex.map { case (o, i) =>
      o.map(MrConditions.compile(_, condSchema, varIdx, varNames(i), allowNav = true)).orNull
    }.toArray
    val navDepth = compiled.filter(_ != null).map(MrConditions.maxPrevDepth).foldLeft(0)(math.max)

    val nCond = condCols.size
    // branch tables: token position → global variable / quantifier; brPos =
    // global variable → position in the branch (-1 absent) for placedBefore
    val nBr = branches.size
    val brVar: Array[Array[Int]] = branches.map(_.map(_.v).toArray).toArray
    val brLo: Array[Array[Int]] = branches.map(_.map(_.lo).toArray).toArray
    val brHi: Array[Array[Int]] = branches.map(_.map(_.hi.getOrElse(Int.MaxValue)).toArray).toArray
    val brRel: Array[Array[Boolean]] = branches.map(_.map(_.reluctant).toArray).toArray
    val brPos: Array[Array[Int]] = branches.map { b =>
      val p = Array.fill(nTok)(-1)
      b.zipWithIndex.foreach { case (t, i) => p(t.v) = i }
      p
    }.toArray
    val withinUs = withinSeconds * 1000000L

    // QMatch's shape (the r10 contract) plus the value-measure columns in
    // declaration order, typed from the buffered schema
    val outSchema = StructType(Seq(
      StructField("key", StringType, nullable = true),
      StructField("match_start_ts", TimestampType, nullable = true),
      StructField("match_end_ts", TimestampType, nullable = true),
      StructField("start_tie", LongType, nullable = false),
      StructField("matched_len", IntegerType, nullable = false)) ++
      measures.map(m => condSchema(condSchema.fieldIndex(m.col)).copy(
        name = m.alias, nullable = true)) ++
      aggMeasures.map(m => StructField(m.alias, m.fn match {
        case "cnt" => LongType
        case "sum" => DecimalType(38, 6)
        case "avg" => DoubleType
        case _ => condSchema(condSchema.fieldIndex(m.col)).dataType
      }, nullable = true)) ++
      matchNumberAlias.map(a => StructField(a, LongType, nullable = false)))
    val measArr: Array[(Boolean, Int, Int)] =
      measures.map(m => (m.isFirst, m.tok, condSchema.fieldIndex(m.col))).toArray
    val nMeas = measArr.length
    // (fnCode, tok, colIdx or -1 for '*')
    val aggMeasArr: Array[(Int, Int, Int)] = aggMeasures.map(m =>
      (AggFnCode(m.fn), m.tok, if (m.col == "*") -1 else condSchema.fieldIndex(m.col))).toArray
    val nAggMeas = aggMeasArr.length
    val hasMatchNumber = matchNumberAlias.isDefined

    implicit val outEnc = Encoders.row(outSchema)
    implicit val stEnc = Encoders.kryo[Buf]
    implicit val keyEnc = Encoders.STRING

    def toTs(us: Long): Timestamp = {
      val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
      t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }

    // projection layout: 0 = key, 1 = ts, 2 = tie, 3.. = cond columns as-is
    val sel = df.select(
      col(keyCol).cast("string").as("__mr_key") +:
        col(tsCol).cast("timestamp").as("__mr_ts") +:
        col(tieCol).cast("long").as("__mr_tie") +:
        condCols.map(col): _*)
    val srcQ = if (ttlSeconds > 0) sel.withWatermark("__mr_ts", ttlWatermarkDelay) else sel
    srcQ
      .groupByKey(_.getString(0))
      .flatMapGroupsWithState[Buf, Row](OutputMode.Append(), StreamingOps.ttlConf(ttlSeconds)) {
        (key: String, rows: Iterator[Row], state: GroupState[Buf]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val buf = state.getOption.getOrElse(
              Buf(Array.empty, Array.empty, Array.empty, 0, Array.empty))
            val out = Seq.newBuilder[Row]
            var newest = Long.MinValue
            var late = 0

            var matchSeq = buf.matchSeq
            val cellsB = ArrayBuffer.from(buf.cells)
            val rowsB = cellsB.map(a => new GenericRow(a): Row).to(ArrayBuffer)
            val tssB = ArrayBuffer.from(buf.tsMicros)
            val tiesB = ArrayBuffer.from(buf.ties)
            val undecB = ArrayBuffer.from(buf.undecided)
            var cursor = buf.cursor

            val starts = new Array[Int](nTok)
            val counts = new Array[Int](nTok)
            val cx = new Cx(rowsB, starts, counts)

            /** 1 holds, 0 not, -1 undecidable until the successor arrives.
              * `gv` = global variable, `bt` = its position in the branch
              * being attempted (placedBefore visibility).
              */
            def predOk(gv: Int, bt: Int, pos: Int, runStart: Int): Int = {
              val d = compiled(gv)
              if (d == null) 1
              else {
                cx.self = gv; cx.runStart = runStart; cx.curPos = pos; cx.selfBrPos = bt
                d.holdsOrDefer(cx)
              }
            }

            /** >0 winner len, -1 open, 0 dead for ONE branch at start p —
              * the batch NFA's greedy (and reluctant) exploration with the
              * streaming open rules; counts of branch-earlier tokens are
              * fixed along each attempt path, so cross-variable conditions
              * read the same placements the batch scan would. A NEXT() read
              * past the newest row aborts the whole attempt to OPEN
              * (decision deferred one event).
              */
            def resolveBranch(b: Int, p: Int): Int = {
              val len = rowsB.length
              val futureViolated = withinUs > 0L && tssB(len - 1) - tssB(p) > withinUs
              val vs = brVar(b); val los = brLo(b); val his = brHi(b); val rels = brRel(b)
              val bn = vs.length
              cx.brPosRef = brPos(b)
              def go(tokI: Int, pos: Int): Int = {
                if (tokI == bn) return if (pos > p) pos - p else 0
                val gv = vs(tokI)
                starts(gv) = pos
                // scan the run, capped at the quantifier's hi — rows beyond
                // the cap are never placed, so they must not defer/decide
                var avail = 0
                var stop = 0 // 1 pred-false, 2 buffer-end, 3 within, 4 cap
                while (stop == 0) {
                  if (avail >= his(tokI)) stop = 4
                  else if (pos + avail >= len) stop = 2
                  else if (withinUs > 0L && tssB(pos + avail) - tssB(p) > withinUs) stop = 3
                  else predOk(gv, tokI, pos + avail, pos) match {
                    case 1 => avail += 1
                    case 0 => stop = 1
                    case _ => throw MrConditions.NotYet
                  }
                }
                // stop==2 implies avail < hi (cap checked first): the run is
                // still extensible by future events unless the horizon is
                // already past every extension
                val openHere = stop == 2 && !futureViolated
                if (rels(tokI)) {
                  // lazy: shortest first; a win or an open at count k blocks
                  // every longer k, and only an all-dead scan of an
                  // extensible run stays open
                  var c = los(tokI)
                  while (c <= avail) {
                    counts(gv) = c
                    val r = go(tokI + 1, pos + c)
                    if (r != 0) return r
                    c += 1
                  }
                  if (openHere) return -1
                  counts(gv) = 0
                  0
                } else {
                  if (openHere) return -1
                  var c = avail
                  while (c >= los(tokI)) {
                    counts(gv) = c
                    val r = go(tokI + 1, pos + c)
                    if (r != 0) return r
                    c -= 1
                  }
                  counts(gv) = 0
                  0
                }
              }
              try go(0, p) catch { case MrConditions.NotYet => -1 }
            }

            /** Branches in preference order (r11): a DEAD branch falls
              * through; a WINNER emits (its placements are live in
              * starts/counts); an OPEN branch defers the WHOLE position —
              * a later branch matching now must not pre-empt an earlier
              * branch that future events may yet complete (leftmost
              * preference is decided, never raced — closed-stream parity
              * with the batch scan's branch order).
              */
            def resolve(p: Int): Int = {
              var b = 0
              while (b < nBr) {
                // zero UNCONDITIONALLY (r12): a prior match in the same
                // invocation leaves placements for variables absent from
                // this branch; a stale count > 0 would make emitMatch read
                // a previous match's rows for a variable the winner never
                // placed (non-NULL measures that should be NULL)
                java.util.Arrays.fill(counts, 0)
                resolveBranch(b, p) match {
                  case 0 => b += 1
                  case r => return r // winner or open
                }
              }
              0
            }

            /** One output row for the winner starting at buffer position p:
              * the QMatch columns plus the value measures read from the
              * WINNING placement (resolve's starts/counts hold it — a
              * successful recursion returns without further mutation).
              */
            def emitMatch(p: Int, len: Int): Unit = {
              val vals = new Array[Any](5 + nMeas + nAggMeas + (if (hasMatchNumber) 1 else 0))
              vals(0) = key
              vals(1) = toTs(tssB(p))
              vals(2) = toTs(tssB(p + len - 1))
              vals(3) = tiesB(p)
              vals(4) = len
              var m = 0
              while (m < nMeas) {
                val (isFirst, tok, colI) = measArr(m)
                val c = counts(tok)
                vals(5 + m) =
                  if (c <= 0) null // the token matched no rows in the winner
                  else {
                    val row = rowsB(if (isFirst) starts(tok) else starts(tok) + c - 1)
                    if (row.isNullAt(colI)) null else row.get(colI)
                  }
                m += 1
              }
              var am = 0
              while (am < nAggMeas) {
                val (fn, tok, colI) = aggMeasArr(am)
                val c = counts(tok)
                vals(5 + nMeas + am) = fn match {
                  case 0 => // cnt: rows (colI < 0) or non-null values of the run
                    var n = 0L; var r = 0
                    while (r < c) {
                      if (colI < 0 || !rowsB(starts(tok) + r).isNullAt(colI)) n += 1L
                      r += 1
                    }
                    n
                  case 1 | 4 => // sum / avg: exact scale-6 decimal accumulation
                    var acc: java.math.BigDecimal = null; var n = 0L; var r = 0
                    while (r < c) {
                      val row = rowsB(starts(tok) + r)
                      if (!row.isNullAt(colI)) {
                        val d = MatchRecognize.toDecimal6(row.get(colI))
                        acc = if (acc == null) d else acc.add(d)
                        n += 1L
                      }
                      r += 1
                    }
                    if (acc == null) null
                    else if (fn == 1) acc // scale-6 by construction (DecimalType(38,6))
                    else java.lang.Double.valueOf(acc.doubleValue() / n)
                  case _ => // min / max by the column type's natural order
                    var acc: Any = null; var r = 0
                    while (r < c) {
                      val row = rowsB(starts(tok) + r)
                      if (!row.isNullAt(colI)) {
                        val v = row.get(colI)
                        if (acc == null) acc = v
                        else {
                          val cmp = v.asInstanceOf[Comparable[Any]].compareTo(acc)
                          if ((fn == 2 && cmp < 0) || (fn == 3 && cmp > 0)) acc = v
                        }
                      }
                      r += 1
                    }
                    acc
                }
                am += 1
              }
              if (hasMatchNumber) {
                matchSeq += 1L
                vals(5 + nMeas + nAggMeas) = matchSeq
              }
              out += new GenericRow(vals)
            }

            rows.toSeq.sortBy(r => (StreamingOps.tsMicros(r.getTimestamp(1)),
              if (r.isNullAt(2)) 0L else r.getLong(2))).foreach { r =>
              val us = StreamingOps.tsMicros(r.getTimestamp(1))
              val tie = if (r.isNullAt(2)) 0L else r.getLong(2)
              if (tssB.nonEmpty && (us < tssB.last || (us == tssB.last && tie < tiesB.last))) {
                // a late event below the buffer tail: appending it would
                // silently corrupt PREV navigation and run detection — drop
                // it (the watermark rule) and report loudly after the batch
                late += 1
              } else {
                newest = math.max(newest, us)
                val cells = new Array[Any](nCond)
                var ci = 0
                while (ci < nCond) {
                  cells(ci) = if (r.isNullAt(3 + ci)) null else r.get(3 + ci)
                  ci += 1
                }
                cellsB += cells; rowsB += new GenericRow(cells); tssB += us; tiesB += tie
                cx.maxP = rowsB.length - 1
                if (!skipPast) undecB += true
                if (skipPast) {
                  // the buffer cursor is the selection frontier: only the
                  // oldest unresolved start may decide (an older open start
                  // can still consume a younger one's rows)
                  var walking = true
                  while (walking && cursor < rowsB.length) {
                    resolve(cursor) match {
                      case -1 => walking = false
                      case 0 => cursor += 1
                      case len =>
                        emitMatch(cursor, len)
                        cursor += len
                    }
                  }
                  val drop = math.max(0, cursor - navDepth)
                  if (drop > 0) {
                    cellsB.remove(0, drop); rowsB.remove(0, drop)
                    tssB.remove(0, drop); tiesB.remove(0, drop)
                    cursor -= drop
                    cx.maxP = rowsB.length - 1
                  }
                } else {
                  // SKIP TO NEXT ROW: every start decides independently
                  var p = 0
                  while (p < rowsB.length) {
                    if (undecB(p)) {
                      resolve(p) match {
                        case -1 => ()
                        case 0 => undecB(p) = false
                        case w =>
                          emitMatch(p, w)
                          undecB(p) = false
                      }
                    }
                    p += 1
                  }
                  val firstUndec = undecB.indexOf(true) match {
                    case -1 => rowsB.length
                    case i => i
                  }
                  val drop = math.max(0, firstUndec - navDepth)
                  if (drop > 0) {
                    cellsB.remove(0, drop); rowsB.remove(0, drop)
                    tssB.remove(0, drop); tiesB.remove(0, drop)
                    undecB.remove(0, drop)
                    cx.maxP = rowsB.length - 1
                  }
                }
              }
            }
            if (late > 0)
              org.slf4j.LoggerFactory.getLogger(getClass).error(
                s"StreamingMatchRecognize: dropped $late late event(s) for key '$key' " +
                  "arriving below the buffer tail — per-key event-time order across " +
                  "micro-batches is the operator's contract (see scaladoc); configure " +
                  "a TTL watermark or repair the upstream ordering")
            state.update(Buf(cellsB.toArray, tssB.toArray, tiesB.toArray,
              cursor, undecB.toArray, matchSeq))
            stateProbe.foreach(_.add(rowsB.length.toLong)) // peak retained rows per key
            StreamingOps.armTtl(state, ttlSeconds, newest)
            out.result().iterator
          }
      }
  }
}
