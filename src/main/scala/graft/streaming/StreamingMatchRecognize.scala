package graft.streaming

import java.sql.Timestamp

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.catalyst.expressions.GenericRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, OutputMode}
import org.apache.spark.sql.types._

import graft.operators.{MatchRecognize, MrConditions}
import StreamingSequenceMatchQ.QMatch

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
  * DEFINE evaluation: the batch routes precompute row-local booleans as
  * Catalyst lag()/lead() columns — a stream cannot (no lag over an unbounded
  * preceding window), so EVERY condition here runs on [[MrConditions]] with
  * `allowNav`: `PREV(V.col, n)` is physical back-navigation into the per-key
  * buffer, and rows below the retention margin answer NULL exactly like rows
  * before a batch partition's start. `NEXT()` is refused — an unarrived row
  * is not a NULL; treating it as one would decide starts prematurely.
  *
  * Scale shape: one `groupByKey(key)` shuffle; per-key state is the rows
  * from `navDepth` before the selection frontier onward (navDepth = the
  * deepest PREV offset any condition uses) — the typed operator's
  * decided-prefix eviction plus that margin, so state is O(longest open
  * attempt + navDepth), event-time-capped by WITHIN and wall-capped by the
  * TTL. Nothing reaches the driver.
  */
object StreamingMatchRecognize {

  /** Aligned per-row state; `cursor` = the skip-past selection cursor's
    * index within the retained arrays (0 in skip-to-next mode); `undecided`
    * = skip-to-next per-position flags (margin-retained rows are decided).
    */
  case class Buf(types: Seq[String], values: Seq[Double], tsMicros: Seq[Long],
                 ties: Seq[Long], cursor: Int, undecided: Seq[Boolean])

  case class Ev(key: String, typ: String, value: Double, ts: Timestamp, tie: Long)

  /** Mutable evaluation context over the growing per-key buffers. */
  private final class Cx(typesB: ArrayBuffer[String], valuesB: ArrayBuffer[Double],
                         val startsA: Array[Int], val countsA: Array[Int])
    extends MrConditions.Ctx {
    var curPos = 0
    var self = 0
    var runStart = 0
    def cur: Row = rowAt(curPos)
    def rowAt(pos: Int): Row = new GenericRow(Array[Any](typesB(pos), valuesB(pos)))
    def selfTok: Int = self
    def selfRunStart: Int = runStart
    def selfPos: Int = curPos
    def starts: Array[Int] = startsA
    def counts: Array[Int] = countsA
  }

  def apply(df: DataFrame, keyCol: String, typeCol: Option[String], valueCol: String,
            tsCol: String, tieCol: String,
            tokens: Seq[MatchRecognize.MrTok], defs: Seq[Option[String]],
            withinSeconds: Long = 0L, ttlSeconds: Long = 0L,
            ttlWatermarkDelay: String = "0 seconds",
            skipPast: Boolean = true): Dataset[QMatch] = {
    require(!typeCol.contains(valueCol), "typeCol and valueCol must differ")
    require(tokens.nonEmpty, "pattern must name at least one token")
    require(defs.size == tokens.size, "one DEFINE option per pattern token")
    require(tokens.exists(t => t.hi.forall(_ > 0)), "pattern admits only the empty match")
    require(withinSeconds >= 0 && withinSeconds <= Long.MaxValue / 1000000L,
      s"withinSeconds out of range: $withinSeconds")
    if (tokens.exists(_.hi.isEmpty) && withinSeconds == 0L && ttlSeconds == 0L)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        "StreamingMatchRecognize: unbounded quantifier with neither withinSeconds nor " +
          "ttlSeconds — an unbroken greedy run grows per-key state without bound and " +
          "never emits; set a WITHIN bound (and/or a TTL >= it) to cap state age")

    // conditions compile against the value-bearing columns, named as in the
    // input so SQL DEFINE text passes through unchanged; a pattern with no
    // type column gets an unreferencable placeholder slot
    val condSchema = StructType(Seq(
      StructField(typeCol.getOrElse("__mr_no_type_col"), StringType, nullable = true),
      StructField(valueCol, DoubleType, nullable = true)))
    val varIdx = tokens.map(_.name).zipWithIndex.toMap
    val compiled: Array[MrConditions.Compiled] = defs.zipWithIndex.map { case (o, i) =>
      o.map(MrConditions.compile(_, condSchema, varIdx, tokens(i).name, allowNav = true)).orNull
    }.toArray
    val navDepth = compiled.filter(_ != null).map(MrConditions.maxPrevDepth).foldLeft(0)(math.max)

    val nTok = tokens.size
    val loArr = tokens.map(_.lo).toArray
    val hiArr = tokens.map(_.hi.getOrElse(Int.MaxValue)).toArray
    val relArr = tokens.map(_.reluctant).toArray
    val withinUs = withinSeconds * 1000000L

    implicit val evEnc = Encoders.product[Ev]
    implicit val outEnc = Encoders.product[QMatch]
    implicit val stEnc = Encoders.product[Buf]
    implicit val keyEnc = Encoders.STRING

    def toTs(us: Long): Timestamp = {
      val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
      t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }

    val sel = df.select(col(keyCol).cast("string").as("key"),
      typeCol.map(c => col(c).cast("string")).getOrElse(lit(null).cast("string")).as("typ"),
      col(valueCol).cast("double").as("value"),
      col(tsCol).cast("timestamp").as("ts"), col(tieCol).cast("long").as("tie"))
    val srcQ = if (ttlSeconds > 0) sel.withWatermark("ts", ttlWatermarkDelay) else sel
    srcQ.as[Ev]
      .groupByKey(_.key)
      .flatMapGroupsWithState[Buf, QMatch](OutputMode.Append(), StreamingOps.ttlConf(ttlSeconds)) {
        (key: String, rows: Iterator[Ev], state: GroupState[Buf]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val buf = state.getOption.getOrElse(Buf(Nil, Nil, Nil, Nil, 0, Nil))
            val out = Seq.newBuilder[QMatch]
            var newest = Long.MinValue

            val typesB = ArrayBuffer.from(buf.types)
            val valuesB = ArrayBuffer.from(buf.values)
            val tssB = ArrayBuffer.from(buf.tsMicros)
            val tiesB = ArrayBuffer.from(buf.ties)
            val undecB = ArrayBuffer.from(buf.undecided)
            var cursor = buf.cursor

            val starts = new Array[Int](nTok)
            val counts = new Array[Int](nTok)
            val cx = new Cx(typesB, valuesB, starts, counts)

            def predOk(t: Int, pos: Int, runStart: Int): Boolean = {
              val d = compiled(t)
              d == null || {
                cx.self = t; cx.runStart = runStart; cx.curPos = pos
                d.holds(cx)
              }
            }

            /** >0 winner len, -1 open, 0 dead — the batch NFA's greedy (and
              * reluctant) exploration with the streaming open rules; counts
              * of earlier tokens are fixed along each attempt path, so
              * cross-variable conditions read the same placements the batch
              * scan would.
              */
            def resolve(p: Int): Int = {
              val len = typesB.length
              val futureViolated = withinUs > 0L && tssB(len - 1) - tssB(p) > withinUs
              def go(tokI: Int, pos: Int): Int = {
                if (tokI == nTok) return if (pos > p) pos - p else 0
                starts(tokI) = pos
                var avail = 0
                while (pos + avail < len && predOk(tokI, pos + avail, pos) &&
                  (withinUs == 0L || tssB(pos + avail) - tssB(p) <= withinUs)) avail += 1
                val reachedEnd = pos + avail == len
                if (relArr(tokI)) {
                  // lazy: shortest first; a win or an open at count k blocks
                  // every longer k, and only an all-dead scan of an
                  // extensible run stays open
                  var c = loArr(tokI)
                  val cap = math.min(hiArr(tokI), avail)
                  while (c <= cap) {
                    counts(tokI) = c
                    val r = go(tokI + 1, pos + c)
                    if (r != 0) return r
                    c += 1
                  }
                  if (reachedEnd && avail < hiArr(tokI) && !futureViolated) return -1
                  0
                } else {
                  if (reachedEnd && avail < hiArr(tokI) && !futureViolated) return -1
                  var c = math.min(hiArr(tokI), avail)
                  while (c >= loArr(tokI)) {
                    counts(tokI) = c
                    val r = go(tokI + 1, pos + c)
                    if (r != 0) return r
                    c -= 1
                  }
                  0
                }
              }
              go(0, p)
            }

            rows.toSeq.sortBy(e => (StreamingOps.tsMicros(e.ts), e.tie)).foreach { e =>
              val us = StreamingOps.tsMicros(e.ts)
              newest = math.max(newest, us)
              typesB += e.typ; valuesB += e.value; tssB += us; tiesB += e.tie
              if (!skipPast) undecB += true
              if (skipPast) {
                // the buffer cursor is the selection frontier: only the
                // oldest unresolved start may decide (an older open start
                // can still consume a younger one's rows)
                var walking = true
                while (walking && cursor < typesB.length) {
                  resolve(cursor) match {
                    case -1 => walking = false
                    case 0 => cursor += 1
                    case len =>
                      out += QMatch(key, toTs(tssB(cursor)), toTs(tssB(cursor + len - 1)),
                        tiesB(cursor), len)
                      cursor += len
                  }
                }
                val drop = math.max(0, cursor - navDepth)
                if (drop > 0) {
                  typesB.remove(0, drop); valuesB.remove(0, drop)
                  tssB.remove(0, drop); tiesB.remove(0, drop)
                  cursor -= drop
                }
              } else {
                // SKIP TO NEXT ROW: every start decides independently
                var p = 0
                while (p < typesB.length) {
                  if (undecB(p)) {
                    resolve(p) match {
                      case -1 => ()
                      case 0 => undecB(p) = false
                      case w =>
                        out += QMatch(key, toTs(tssB(p)), toTs(tssB(p + w - 1)), tiesB(p), w)
                        undecB(p) = false
                    }
                  }
                  p += 1
                }
                val firstUndec = undecB.indexOf(true) match {
                  case -1 => typesB.length
                  case i => i
                }
                val drop = math.max(0, firstUndec - navDepth)
                if (drop > 0) {
                  typesB.remove(0, drop); valuesB.remove(0, drop)
                  tssB.remove(0, drop); tiesB.remove(0, drop)
                  undecB.remove(0, drop)
                }
              }
            }
            state.update(Buf(typesB.toSeq, valuesB.toSeq, tssB.toSeq, tiesB.toSeq,
              cursor, undecB.toSeq))
            StreamingOps.armTtl(state, ttlSeconds, newest)
            out.result().iterator
          }
      }
  }
}
