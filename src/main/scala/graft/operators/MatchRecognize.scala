package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Row-pattern recognition by a per-key sequential cursor — the execution
  * shape MATCH_RECOGNIZE needs when the lead()-expansion rewrite cannot apply:
  * UNBOUNDED quantifiers (`A+`, `A*`, `A{m,}`) admit no fixed-length
  * alternative set, and `ALL ROWS PER MATCH` emits every matched row rather
  * than one per start.
  *
  * Division of labor (the r8 `skipPastSelect` architecture, generalized):
  *   - Catalyst evaluates every DEFINE predicate ONCE per row as a boolean
  *     column (lag/lead physical navigation included) — codegen'd, vectorized,
  *     pushdown-friendly; the scan never re-evaluates a predicate.
  *   - The scan itself is ONE hash repartition on the key + one in-partition
  *     sort on (key, order) — Catalyst collapses it into the DEFINE window's
  *     own exchange/sort, so the whole operator costs a single shuffle — and
  *     a streaming `mapPartitions` pass holding only the current match
  *     attempt's rows. Keys parallelize across partitions; nothing reaches
  *     the driver.
  *
  * Matching is the SQL-standard GREEDY semantics shared with the bounded
  * rewrite and [[graft.streaming.StreamingSequenceMatchQ]]: quantifier counts
  * are explored leftmost-longest-first (descending lexicographic), with
  * backtracking, so for bounded patterns the scan and the CASE-expansion
  * formulation select identical matches (spec-pinned). RELUCTANT quantifiers
  * (`A+?`/`A*?`/`A{m,n}?` — Flink's lazy forms, r10) flip that token's
  * exploration to ascending (shortest-first) while keeping leftmost priority,
  * on every surface identically. `AFTER MATCH SKIP PAST
  * LAST ROW` (the default) advances the cursor past a selected match —
  * matches never overlap; `SKIP TO NEXT ROW` advances one row — overlapping
  * matches all emit.
  *
  * The per-key dependency chain is inherently sequential (every skip decision
  * depends on all earlier ones — `Behavior.skipPastSelect`'s contract);
  * memory is O(longest match attempt), which a `WITHIN` bound caps in event
  * time, and an unbounded greedy run (`A+` over an always-true DEFINE) can
  * stretch to the key's row count — the same bound any CEP engine has.
  *
  * Row-local DEFINE predicates (the variable's own current row plus PREV/NEXT
  * physical navigation) are precomputed Catalyst boolean columns — codegen'd,
  * zero per-row interpretation. Cross-variable and FIRST() DEFINEs (r10) ride
  * the optional `dynDefs` interpreted predicates ([[MrConditions]]): inside
  * one attempt every earlier variable's placement is fixed, so they read the
  * buffered rows directly.
  *
  * Reference behavior covered: Flink's MATCH_RECOGNIZE accepts unbounded
  * quantifiers (confluent docs, flink-sql match_recognize) which the r8
  * bounded rewrite refused; ALL ROWS PER MATCH goes beyond Flink (ONE ROW
  * only there) with FINAL measure semantics, documented.
  */
object MatchRecognize {

  /** One pattern token: variable `name` repeated [lo, hi] times;
    * hi = None → unbounded (`+`/`*`/`{m,}`); `reluctant` → the lazy forms
    * (`+?`/`*?`/`{m,n}?`): counts explored shortest-first.
    */
  case class MrTok(name: String, lo: Int, hi: Option[Int], reluctant: Boolean = false) {
    require(lo >= 0, s"quantifier lower bound must be >= 0, got {$lo,} on '$name'")
    hi.foreach(h => require(h >= lo, s"empty quantifier range {$lo,$h} on '$name'"))
  }

  /** AFTER MATCH skip strategy — all four of the standard's forms. The
    * variable-targeted forms resume the cursor AT the named variable's
    * first/last matched row (matches may overlap); a target that would
    * re-anchor at the match's own start row, or a variable that matched no
    * rows, fails loudly (the standard's infinite-loop/empty rules — Flink
    * throws too). `tokenIdx` is resolved by the caller from the variable
    * name.
    */
  sealed trait Skip
  case object SkipPastLastRow extends Skip
  case object SkipToNextRow extends Skip
  final case class SkipToFirst(tokenIdx: Int) extends Skip
  final case class SkipToLast(tokenIdx: Int) extends Skip

  /** Epoch micros of an ORDER BY value — needed only under a WITHIN bound. */
  private[operators] def micros(v: Any): Long = v match {
    case t: java.sql.Timestamp => t.getTime * 1000L + (t.getNanos % 1000000L) / 1000L
    case t: java.time.LocalDateTime => // TIMESTAMP_NTZ surfaces as LocalDateTime
      t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000L
    case t: java.time.Instant => t.getEpochSecond * 1000000L + t.getNano / 1000L
    case other => sys.error("MATCH_RECOGNIZE WITHIN requires a timestamp ORDER BY column, got " +
      (if (other == null) "NULL" else other.getClass.getSimpleName))
  }

  /** A double/float/integral/decimal as an EXACT scale-6 decimal, rounded
    * HALF_UP exactly like Spark's double→decimal cast — so a sequential sum
    * of these is order-independent and matches `SUM(CAST(x AS DECIMAL(_,6)))`
    * in any engine.
    */
  private[operators] def toDecimal6(v: Any): java.math.BigDecimal = (v match {
    case b: java.math.BigDecimal => b
    case b: scala.math.BigDecimal => b.bigDecimal
    case d: java.lang.Double => java.math.BigDecimal.valueOf(d)
    case f: java.lang.Float => new java.math.BigDecimal(f.toString)
    case n: java.lang.Number => java.math.BigDecimal.valueOf(n.longValue)
    case other => sys.error("SUM over a non-numeric MEASURES column: " +
      (if (other == null) "NULL" else other.getClass.getSimpleName))
  }).setScale(6, java.math.RoundingMode.HALF_UP)

  /** Run the pattern over `df`.
    *
    * @param keyCols     PARTITION BY columns (atomic — KeyImage contract)
    * @param orderCols   ORDER BY columns; the FIRST is the event time
    * @param tsCol       name of the event-time column (WITHIN measures it;
    *                    unused when `withinMicros` is empty)
    * @param tokens      the pattern, in order
    * @param defs        one boolean predicate per token (aligned); row-local —
    *                    evaluated by Catalyst before the scan. `lit(true)`
    *                    for an undefined variable.
    * @param withinMicros every matched row must lie within this many micros
    *                    of the match's first row
    * @param skip        the AFTER MATCH strategy ([[Skip]]); SKIP PAST LAST
    *                    ROW is the standard default
    * @param allRows     true → one output row per MATCHED ROW (`__mr_var`
    *                    carries the classifier); false → one per match (the
    *                    match's start row)
    * @param measureCols input columns captured into the per-variable
    *                    `__mr_first_<v>` / `__mr_last_<v>` structs that
    *                    MEASURES read (FINAL semantics); empty → no structs
    * @param aggSpecs    per token (aligned), the aggregate MEASURES over its
    *                    matched rows: (fn, col) with fn ∈ cnt|sum|min|max,
    *                    col = "*" for cnt = the run length. Emitted as an
    *                    `__mr_agg_<v>` struct (`<fn>_<col>` fields): cnt_*
    *                    LongType (0 on an empty run); sum_* DecimalType(38,6)
    *                    — each value rounded HALF_UP to scale 6 exactly like
    *                    Spark's double→decimal cast, then summed EXACTLY, so
    *                    the result is order-independent and oracle-comparable
    *                    (the catalog's money-sum determinism rule); min/max
    *                    keep the input type; non-cnt fields NULL on an empty
    *                    run
    * @return df's columns plus the structs, `__mr_len` (match row count),
    *         `__mr_seq` (the match's 1-based ordinal WITHIN its key, in
    *         (order) position — deterministic under any parallelism, unlike
    *         a query-global counter; MATCH_NUMBER() maps here) and, under
    *         `allRows`, `__mr_var`
    */
  def scan(df: DataFrame, keyCols: Seq[Column], orderCols: Seq[Column], tsCol: String,
           tokens: Seq[MrTok], defs: Seq[Column], withinMicros: Option[Long],
           skip: Skip, allRows: Boolean, measureCols: Seq[String],
           aggSpecs: Seq[Seq[(String, String)]] = Seq.empty,
           dynDefs: Seq[Option[String]] = Seq.empty,
           offsetMeasures: Seq[(Int, Boolean, Int)] = Seq.empty,
           runningStructs: Boolean = false,
           runningAggStructs: Boolean = false): DataFrame = {
    // RUNNING measure semantics under ALL ROWS (r10): per emitted row,
    // __mr_run_first_<v>/__mr_run_last_<v> hold the variable's first/last
    // matched row AT OR BEFORE that row — NULL while the variable hasn't
    // matched yet. The match-level __mr_first/__mr_last structs stay FINAL.
    require(!runningStructs || (allRows && measureCols.nonEmpty),
      "runningStructs needs ALL ROWS PER MATCH and measureCols")
    // RUNNING aggregates under ALL ROWS (r11): __mr_run_agg_<v> mirrors
    // __mr_agg_<v>'s fields over the variable's rows AT OR BEFORE each
    // emitted row — incremental accumulators, cnt 0 / NULLs before the run
    // begins, equal to the FINAL struct on the match's last row.
    require(!runningAggStructs || (allRows && aggSpecs.exists(_.nonEmpty)),
      "runningAggStructs needs ALL ROWS PER MATCH and aggSpecs")
    require(aggSpecs.isEmpty || aggSpecs.size == tokens.size,
      "aggSpecs must align with tokens (or be empty)")
    // Flink's logical-offset navigation in MEASURES — FIRST(A.c, k)/LAST(A.c,
    // k): each distinct (token, isFirst, k>0) emits one additional
    // __mr_off_<f|l><k>_<var> struct over the measure columns; out-of-run
    // offsets are NULL structs
    offsetMeasures.foreach { case (t, _, k) =>
      require(t >= 0 && t < tokens.size, s"offset measure for unknown token index $t")
      require(k >= 1, s"offset measure needs k >= 1, got $k (k = 0 is the plain FIRST/LAST)")
      require(measureCols.nonEmpty, "offset measures need measureCols") }
    require(offsetMeasures.distinct.size == offsetMeasures.size,
      "duplicate offset-measure specs")
    require(dynDefs.isEmpty || dynDefs.size == tokens.size,
      "dynDefs must align with tokens (or be empty)")
    // cross-variable DEFINE conditions (r10): compiled once at plan time
    // against the INPUT schema (helper columns are appended after it, so
    // field indices stay valid on the scan's rows), evaluated per tested row
    // inside the NFA attempt where every earlier variable's placement is
    // fixed — see MrConditions. AND-composed with the Catalyst-compiled
    // row-local booleans (lit(true) when the whole condition is dynamic).
    val varIdxMap: Map[String, Int] = tokens.map(_.name).zipWithIndex.toMap
    val dynArr: Array[MrConditions.Compiled] =
      if (dynDefs.isEmpty) new Array[MrConditions.Compiled](tokens.size)
      else dynDefs.zipWithIndex.map { case (o, i) =>
        o.map(c => MrConditions.compile(c, df.schema, varIdxMap, tokens(i).name)).orNull
      }.toArray
    val aggs: Seq[Seq[(String, String)]] =
      if (aggSpecs.isEmpty) tokens.map(_ => Seq.empty) else aggSpecs
    aggs.flatten.foreach { case (fn, c) =>
      require(Set("cnt", "sum", "min", "max").contains(fn), s"unknown aggregate '$fn'")
      require(c == "*" || df.columns.contains(c), s"aggregate over unknown column '$c'")
      require(fn == "cnt" || c != "*", s"'$fn(*)' is not a thing — name a column")
      // fail at plan time, not mid-job: sum needs a numeric external type
      // (toDecimal6's contract); min/max compare via Comparable, which binary
      // (Array[Byte]) and nested types don't implement
      if (fn == "sum") {
        val dt = df.schema(c).dataType
        require(dt.isInstanceOf[NumericType],
          s"SUM MEASURES column '$c' must be numeric, got ${dt.simpleString}")
      }
      if (fn == "min" || fn == "max") {
        val dt = df.schema(c).dataType
        val orderableAtomic = dt.isInstanceOf[NumericType] || (dt match {
          case StringType | BooleanType | DateType | TimestampType | TimestampNTZType => true
          case _ => false
        })
        require(orderableAtomic,
          s"${fn.toUpperCase} MEASURES column '$c' must have an orderable atomic type " +
            s"(numeric/string/boolean/date/timestamp), got ${dt.simpleString}")
      } }
    skip match {
      case SkipToFirst(i) => require(i >= 0 && i < tokens.size, s"skip target out of range: $i")
      case SkipToLast(i)  => require(i >= 0 && i < tokens.size, s"skip target out of range: $i")
      case _ => ()
    }
    require(tokens.nonEmpty, "MATCH_RECOGNIZE requires a non-empty PATTERN")
    require(tokens.map(_.name).distinct.size == tokens.size,
      s"duplicate pattern variable in ${tokens.map(_.name).mkString(" ")}")
    require(defs.size == tokens.size, "one DEFINE predicate per pattern token (lit(true) when absent)")
    require(tokens.exists(t => t.hi.forall(_ > 0)),
      "MATCH_RECOGNIZE: pattern admits only the empty match")
    withinMicros.foreach(w => require(w > 0, s"WITHIN bound must be positive, got $w micros"))
    graft.core.KeyImage.requireAtomic(df, keyCols)
    // every helper AND output column the scan appends starts with __mr_
    // (__mr_spk, __mr_def_*, __mr_first_/__mr_last_/__mr_agg_<var>, __mr_len,
    // __mr_seq, __mr_var) — guard the whole prefix, not an enumerated set, so
    // an input column can never silently duplicate an appended name
    val mrClash = df.columns.filter(_.startsWith("__mr_"))
    require(mrClash.isEmpty,
      s"input columns collide with MATCH_RECOGNIZE's reserved __mr_ prefix: ${mrClash.mkString(", ")}")
    val missing = measureCols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"MEASURES reference columns absent from the input: ${missing.mkString(", ")}")

    val withDefs = tokens.indices.foldLeft(df)((d, i) => d.withColumn(s"__mr_def_$i", defs(i)))
    // sort on the REAL key columns (not the image) so Catalyst can collapse
    // this sort into the DEFINE window's own (key, order) sort; the image is
    // only the collision-free equality probe for key-change detection
    val pre = withDefs
      .withColumn("__mr_spk", graft.core.KeyImage.of(keyCols))
      .repartition(keyCols: _*)
      .sortWithinPartitions(keyCols ++ orderCols: _*)

    val inSchema = pre.schema
    val nOrig = df.schema.fields.length // original columns lead; helpers appended
    val keyIdx = inSchema.fieldIndex("__mr_spk")
    val defIdxArr = tokens.indices.map(i => inSchema.fieldIndex(s"__mr_def_$i")).toArray
    val tsIdx = inSchema.fieldIndex(tsCol)
    val measureIdxArr = measureCols.map(inSchema.fieldIndex).toArray
    val hasMeasures = measureCols.nonEmpty
    val mStruct = StructType(measureCols.map(c => inSchema(inSchema.fieldIndex(c)).copy(nullable = true)))
    def aggFieldType(fn: String, c: String) = fn match {
      case "cnt" => LongType
      case "sum" => DecimalType(38, 6)
      case _     => df.schema(c).dataType
    }
    val aggStructTypes: Seq[Option[StructType]] = tokens.indices.map { i =>
      if (aggs(i).isEmpty) None
      else Some(StructType(aggs(i).map { case (fn, c) =>
        StructField(s"${fn}_${if (c == "*") "rows" else c}", aggFieldType(fn, c), nullable = true) }))
    }
    val nAggStructs = aggStructTypes.count(_.isDefined)
    val outSchema = StructType(
      df.schema.fields.toSeq ++
        (if (hasMeasures) tokens.flatMap(t => Seq(
          StructField(s"__mr_first_${t.name}", mStruct, nullable = true),
          StructField(s"__mr_last_${t.name}", mStruct, nullable = true)))
        else Nil) ++
        offsetMeasures.map { case (t, isFirst, k) =>
          StructField(s"__mr_off_${if (isFirst) "f" else "l"}${k}_${tokens(t).name}",
            mStruct, nullable = true) } ++
        (if (runningStructs) tokens.flatMap(t => Seq(
          StructField(s"__mr_run_first_${t.name}", mStruct, nullable = true),
          StructField(s"__mr_run_last_${t.name}", mStruct, nullable = true)))
        else Nil) ++
        (if (runningAggStructs) tokens.indices.flatMap(i => aggStructTypes(i).map(t =>
          StructField(s"__mr_run_agg_${tokens(i).name}", t, nullable = false)))
        else Nil) ++
        tokens.indices.flatMap(i => aggStructTypes(i).map(t =>
          StructField(s"__mr_agg_${tokens(i).name}", t, nullable = false))) ++
        Seq(StructField("__mr_len", LongType, nullable = false),
          StructField("__mr_seq", LongType, nullable = false)) ++
        (if (allRows) Seq(StructField("__mr_var", StringType, nullable = false)) else Nil))
    val outArity = outSchema.fields.length
    val lenPos = nOrig + (if (hasMeasures) 2 * tokens.size else 0) +
      offsetMeasures.size + (if (runningStructs) 2 * tokens.size else 0) +
      (if (runningAggStructs) nAggStructs else 0) + nAggStructs
    val offSpecArr: Array[(Int, Boolean, Int)] = offsetMeasures.toArray
    val emitRunning = runningStructs
    val emitRunningAgg = runningAggStructs
    // per token: (fn, input field index or -1 for "*")
    val aggIdxArr: Array[Array[(String, Int)]] = aggs.map(_.map { case (fn, c) =>
      (fn, if (c == "*") -1 else inSchema.fieldIndex(c)) }.toArray).toArray

    val n = tokens.size
    val loArr = tokens.map(_.lo).toArray
    val hiArr = tokens.map(_.hi.getOrElse(Int.MaxValue)).toArray
    val relArr = tokens.map(_.reluctant).toArray
    val nameArr = tokens.map(_.name).toArray
    val hasWithin = withinMicros.isDefined
    val withinUs = withinMicros.getOrElse(0L)
    val skipMode = skip
    val nameByIdx = tokens.map(_.name).toArray
    val emitAll = allRows

    pre.mapPartitions { it =>
      new scala.collection.AbstractIterator[Row] {
        private val out = scala.collection.mutable.Queue.empty[Row]
        private var stash: Row = null // first row of the NEXT key, read past the boundary
        private var curKey: String = null
        private var keyDone = false
        private var finished = false
        // rows of the current key from the cursor on; base = cursor's index
        private val buf = new java.util.ArrayList[Row]()
        private var base = 0

        private def bufLen: Int = buf.size - base
        private def rowAt(j: Int): Row = buf.get(base + j)

        /** Pull rows until index j (cursor-relative) exists or the key ends. */
        private def ensure(j: Int): Boolean = {
          while (bufLen <= j && !keyDone) {
            val r =
              if (stash != null) { val s = stash; stash = null; s }
              else if (it.hasNext) it.next()
              else null
            if (r == null) keyDone = true
            else {
              val k = r.getString(keyIdx)
              if (curKey == null) curKey = k
              if (k == curKey) { buf.add(r); () }
              else { stash = r; keyDone = true }
            }
          }
          bufLen > j
        }

        /** Advance the cursor k rows; amortized-O(1) front compaction. */
        private def advance(k: Int): Unit = {
          base += k
          if (base >= 1024 && base * 2 >= buf.size) { buf.subList(0, base).clear(); base = 0 }
        }

        private def defOk(r: Row, t: Int): Boolean = {
          val i = defIdxArr(t); !r.isNullAt(i) && r.getBoolean(i)
        }

        // cross-variable predicate context: one mutable instance per task,
        // repointed per tested row (zero allocation in the scan loop)
        private val dynStarts = new Array[Int](n)
        private object dynCtx extends MrConditions.Ctx {
          var curRow: Row = _
          var self = 0
          var runStart = 0
          var candPos = 0
          var countsRef: Array[Int] = _
          def cur: Row = curRow
          def rowAt(pos: Int): Row = buf.get(base + pos)
          def selfTok: Int = self
          def selfRunStart: Int = runStart
          def selfPos: Int = candPos
          def starts: Array[Int] = dynStarts
          def counts: Array[Int] = countsRef
        }
        private def dynOk(r: Row, t: Int, runStart: Int, pos: Int): Boolean = {
          val d = dynArr(t)
          d == null || {
            dynCtx.curRow = r; dynCtx.self = t; dynCtx.runStart = runStart
            dynCtx.candPos = pos
            d.holds(dynCtx)
          }
        }

        /** Greedy leftmost-longest match at the cursor: counts per token, with
          * backtracking — identical selection order to the bounded rewrite's
          * descending-lexicographic CASE branches. Cross-variable predicates
          * are sound inside the avail-scan because a row's test depends only
          * on the run's start and EARLIER tokens' placements, both fixed here
          * (the prefix property: a valid run's prefixes are valid).
          */
        private def tryMatch(counts: Array[Int]): Boolean = {
          val startUs = if (hasWithin) micros(rowAt(0).get(tsIdx)) else 0L
          dynCtx.countsRef = counts
          def go(t: Int, pos: Int): Boolean = {
            if (t == n) return pos > 0 // the empty match never selects
            dynStarts(t) = pos
            var c = 0
            while (c < hiArr(t) && ensure(pos + c) && defOk(rowAt(pos + c), t) &&
              dynOk(rowAt(pos + c), t, pos, pos + c) &&
              (!hasWithin || micros(rowAt(pos + c).get(tsIdx)) - startUs <= withinUs)) c += 1
            if (relArr(t)) { // reluctant: shortest first (Flink's lazy forms)
              var k = loArr(t)
              while (k <= c) {
                counts(t) = k
                if (go(t + 1, pos + k)) return true
                k += 1
              }
            } else {
              while (c >= loArr(t)) {
                counts(t) = c
                if (go(t + 1, pos + c)) return true
                c -= 1
              }
            }
            false
          }
          go(0, 0)
        }

        private def projMeasure(r: Row): Row = {
          val vals = new Array[Any](measureIdxArr.length)
          var i = 0
          while (i < measureIdxArr.length) { vals(i) = r.get(measureIdxArr(i)); i += 1 }
          Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
        }

        private def mk(src: Row, structVals: Array[Any], offVals: Array[Any],
                       runVals: Array[Any], runAggVals: Array[Any], aggVals: Array[Any],
                       len: Long, seq: Long, cls: String): Row = {
          val vals = new Array[Any](outArity)
          var i = 0
          while (i < nOrig) { vals(i) = src.get(i); i += 1 }
          var base = nOrig
          if (hasMeasures) {
            var j = 0
            while (j < structVals.length) { vals(base + j) = structVals(j); j += 1 }
            base += structVals.length
          }
          if (offVals != null) {
            var j = 0
            while (j < offVals.length) { vals(base + j) = offVals(j); j += 1 }
            base += offVals.length
          }
          if (runVals != null) {
            var j = 0
            while (j < runVals.length) { vals(base + j) = runVals(j); j += 1 }
            base += runVals.length
          }
          if (runAggVals != null) {
            var j = 0
            while (j < runAggVals.length) { vals(base + j) = runAggVals(j); j += 1 }
            base += runAggVals.length
          }
          if (aggVals != null) {
            var j = 0
            while (j < aggVals.length) { vals(base + j) = aggVals(j); j += 1 }
          }
          vals(lenPos) = len
          vals(lenPos + 1) = seq
          if (emitAll) vals(lenPos + 2) = cls
          Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
        }

        /** Aggregates over one variable's matched run [p, p+c): cnt exact,
          * sum EXACT decimal over HALF_UP-scale-6 values (order-independent,
          * the Spark double→decimal cast's rounding), min/max by the column
          * type's natural order; non-cnt fields NULL on an empty run.
          */
        private def computeAgg(i: Int, p: Int, c: Int): Row = {
          val spec = aggIdxArr(i)
          val vals = new Array[Any](spec.length)
          var j = 0
          while (j < spec.length) {
            val (fn, colIdx) = spec(j)
            vals(j) = fn match {
              case "cnt" if colIdx < 0 => c.toLong
              case "cnt" =>
                var nn = 0L; var r = 0
                while (r < c) { if (!rowAt(p + r).isNullAt(colIdx)) nn += 1; r += 1 }
                nn
              case "sum" =>
                var acc: java.math.BigDecimal = null
                var r = 0
                while (r < c) {
                  val row = rowAt(p + r)
                  if (!row.isNullAt(colIdx)) {
                    val d = toDecimal6(row.get(colIdx))
                    acc = if (acc == null) d else acc.add(d)
                  }
                  r += 1
                }
                acc
              case _ =>
                var best: Any = null
                var r = 0
                while (r < c) {
                  val row = rowAt(p + r)
                  if (!row.isNullAt(colIdx)) {
                    val v = row.get(colIdx)
                    if (best == null) best = v
                    else {
                      val cmp = v.asInstanceOf[Comparable[Any]].compareTo(best)
                      if ((fn == "min" && cmp < 0) || (fn == "max" && cmp > 0)) best = v
                    }
                  }
                  r += 1
                }
                best
            }
            j += 1
          }
          Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
        }

        private def emit(counts: Array[Int], seq: Long): Unit = {
          val len = counts.sum.toLong
          val structVals = if (hasMeasures) new Array[Any](2 * n) else null
          if (hasMeasures) {
            var p = 0; var t = 0
            while (t < n) {
              if (counts(t) > 0) {
                structVals(2 * t) = projMeasure(rowAt(p))
                structVals(2 * t + 1) = projMeasure(rowAt(p + counts(t) - 1))
              }
              p += counts(t); t += 1
            }
          }
          val offVals: Array[Any] =
            if (offSpecArr.isEmpty) null
            else {
              val starts = new Array[Int](n) // token run starts within the match
              var p = 0; var t = 0
              while (t < n) { starts(t) = p; p += counts(t); t += 1 }
              offSpecArr.map { case (tk, isFirst, k) =>
                val c = counts(tk)
                if (c <= k) null // run shorter than the offset → NULL struct
                else projMeasure(rowAt(starts(tk) + (if (isFirst) k else c - 1 - k)))
              }
            }
          val aggVals: Array[Any] =
            if (nAggStructs == 0) null
            else {
              val av = new Array[Any](nAggStructs)
              var p = 0; var t = 0; var k = 0
              while (t < n) {
                if (aggIdxArr(t).nonEmpty) { av(k) = computeAgg(t, p, counts(t)); k += 1 }
                p += counts(t); t += 1
              }
              av
            }
          if (!emitAll)
            out.enqueue(mk(rowAt(0), structVals, offVals, null, null, aggVals, len, seq, null))
          else {
            val starts = new Array[Int](n)
            if (emitRunning || emitRunningAgg) {
              var p = 0; var t = 0
              while (t < n) { starts(t) = p; p += counts(t); t += 1 }
            }
            // running-aggregate accumulators (r11): one per agg-bearing
            // token, updated incrementally as the emit cursor enters its run
            // — O(rows × fields), never a per-row rescan of the prefix
            val runAcc: Array[Array[Any]] = if (!emitRunningAgg) null else {
              val a = new Array[Array[Any]](n)
              var u = 0
              while (u < n) {
                if (aggIdxArr(u).nonEmpty) {
                  val spec = aggIdxArr(u)
                  val vals = new Array[Any](spec.length)
                  var j = 0
                  while (j < spec.length) { vals(j) = if (spec(j)._1 == "cnt") 0L else null; j += 1 }
                  a(u) = vals
                }
                u += 1
              }
              a
            }
            // the before-the-run view: cnt fields 0, everything else NULL
            val emptyAggRows: Array[Any] = if (!emitRunningAgg) null else {
              val a = new Array[Any](n)
              var u = 0
              while (u < n) {
                if (runAcc(u) != null)
                  a(u) = Row.fromSeq(scala.collection.immutable.ArraySeq
                    .unsafeWrapArray(runAcc(u).clone()))
                u += 1
              }
              a
            }
            var pos = 0; var t = 0
            while (t < n) {
              var c = 0
              while (c < counts(t)) {
                val runVals: Array[Any] =
                  if (!emitRunning) null
                  else {
                    // the standard's RUNNING view at this row: a variable's
                    // first/last matched row AT OR BEFORE pos, NULL before
                    // its run begins
                    val rv = new Array[Any](2 * n)
                    var u = 0
                    while (u < n) {
                      if (counts(u) > 0 && starts(u) <= pos) {
                        rv(2 * u) = projMeasure(rowAt(starts(u)))
                        rv(2 * u + 1) = projMeasure(rowAt(math.min(pos, starts(u) + counts(u) - 1)))
                      }
                      u += 1
                    }
                    rv
                  }
                val runAggVals: Array[Any] =
                  if (!emitRunningAgg) null
                  else {
                    if (runAcc(t) != null) accumulate(runAcc(t), aggIdxArr(t), rowAt(pos))
                    val av = new Array[Any](nAggStructs)
                    var k = 0; var u = 0
                    while (u < n) {
                      if (aggIdxArr(u).nonEmpty) {
                        av(k) =
                          if (starts(u) > pos) emptyAggRows(u) // run not begun
                          else if (starts(u) + counts(u) - 1 <= pos) aggVals(k) // fully visible
                          else Row.fromSeq(scala.collection.immutable.ArraySeq
                            .unsafeWrapArray(runAcc(u).clone())) // mid-run snapshot
                        k += 1
                      }
                      u += 1
                    }
                    av
                  }
                out.enqueue(mk(rowAt(pos), structVals, offVals, runVals, runAggVals, aggVals,
                  len, seq, nameArr(t)))
                pos += 1; c += 1
              }
              t += 1
            }
          }
        }

        /** Fold one row into a running-aggregate accumulator (same exactness
          * contract as [[computeAgg]]: exact decimal sums, natural-order
          * min/max, non-null counting).
          */
        private def accumulate(acc: Array[Any], spec: Array[(String, Int)], row: Row): Unit = {
          var j = 0
          while (j < spec.length) {
            val (fn, colIdx) = spec(j)
            fn match {
              case "cnt" if colIdx < 0 => acc(j) = acc(j).asInstanceOf[Long] + 1L
              case "cnt" => if (!row.isNullAt(colIdx)) acc(j) = acc(j).asInstanceOf[Long] + 1L
              case "sum" =>
                if (!row.isNullAt(colIdx)) {
                  val d = toDecimal6(row.get(colIdx))
                  acc(j) = if (acc(j) == null) d
                  else acc(j).asInstanceOf[java.math.BigDecimal].add(d)
                }
              case _ =>
                if (!row.isNullAt(colIdx)) {
                  val v = row.get(colIdx)
                  if (acc(j) == null) acc(j) = v
                  else {
                    val cmp = v.asInstanceOf[Comparable[Any]].compareTo(acc(j))
                    if ((fn == "min" && cmp < 0) || (fn == "max" && cmp > 0)) acc(j) = v
                  }
                }
            }
            j += 1
          }
        }

        /** Cursor rows to consume after a selected match, per strategy.
          * Variable-targeted skips resume AT the target row; re-anchoring at
          * the match's own start (or an empty target) would loop — loud.
          */
        private def skipAdvance(counts: Array[Int]): Int = skipMode match {
          case SkipPastLastRow => counts.sum
          case SkipToNextRow   => 1
          case SkipToFirst(i)  =>
            if (counts(i) == 0) sys.error(s"AFTER MATCH SKIP TO FIRST ${nameByIdx(i)}: " +
              "the variable matched no rows in the selected match")
            else {
              var pos = 0; var t = 0
              while (t < i) { pos += counts(t); t += 1 }
              if (pos == 0) sys.error(s"AFTER MATCH SKIP TO FIRST ${nameByIdx(i)} would " +
                "re-anchor at the match's own start row (infinite loop)")
              pos
            }
          case SkipToLast(i) =>
            if (counts(i) == 0) sys.error(s"AFTER MATCH SKIP TO LAST ${nameByIdx(i)}: " +
              "the variable matched no rows in the selected match")
            else {
              var pos = 0; var t = 0
              while (t <= i) { pos += counts(t); t += 1 }
              if (pos - 1 == 0) sys.error(s"AFTER MATCH SKIP TO LAST ${nameByIdx(i)} would " +
                "re-anchor at the match's own start row (infinite loop)")
              pos - 1
            }
        }

        private var matchSeq = 0L // per-key match ordinal, resets with the key

        private def pump(): Unit = {
          while (out.isEmpty && !finished) {
            if (!ensure(0)) {
              if (stash == null && !it.hasNext) finished = true
              else { buf.clear(); base = 0; curKey = null; keyDone = false; matchSeq = 0L } // next key
            } else {
              val counts = new Array[Int](n)
              if (tryMatch(counts)) {
                matchSeq += 1
                emit(counts, matchSeq)
                advance(skipAdvance(counts))
              }
              else advance(1)
            }
          }
        }

        override def hasNext: Boolean = { pump(); out.nonEmpty }
        override def next(): Row = {
          pump()
          if (out.isEmpty) throw new NoSuchElementException("empty scan iterator")
          out.dequeue()
        }
      }
    }(Encoders.row(outSchema))
  }
}
