package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tumbling-window aggregation (reference: TUMBLE TVF, LAB3-Walkthrough.md:99-111,
  * LAB4-Walkthrough.md:127-141).
  *
  * Spark plan: one shuffle keyed on (window, keys) with map-side partial
  * aggregation — the optimal shape for this operator at any scale. The window
  * struct is epoch-aligned, matching Flink's TUMBLE and DuckDB's `time_bucket`.
  *
  * `window_time` (Flink's window event-time attribute) is `window_end - 1ms`
  * (SURVEY.md §7.4 item 4); exposed for interval joins ordered on it.
  */
object Tumble {

  def apply(df: DataFrame, tsCol: String, width: String, keys: Column*)(aggs: (String, Column)*): DataFrame = {
    val grouped = df
      .groupBy(window(col(tsCol), width) +: keys: _*)
      .agg(aggs.head._2.as(aggs.head._1), aggs.tail.map { case (n, c) => c.as(n) }: _*)
    grouped
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .withColumn("window_time", col("window.end") - expr("INTERVAL 1 MILLISECOND"))
      .drop("window")
  }
}

/** Cumulating-window aggregation — Flink's CUMULATE TVF (the fourth member of
  * the window-TVF family next to TUMBLE/HOP/SESSION; the reference engine's
  * SQL dialect ships it even though the walkthrough labs only use TUMBLE).
  * Windows share a `maxSize`-aligned start and expand by `step`:
  * `[w0, w0+step), [w0, w0+2·step), …, [w0, w0+maxSize)` — the "dashboard
  * counter that resets every maxSize" shape.
  *
  * Scale design — slice decomposition, the same trick Flink's own runtime
  * uses: a naive plan explodes EVERY fact row into its ~maxSize/step
  * cumulative windows before aggregating, multiplying the one full-data
  * shuffle by the expansion factor. Instead:
  *
  *   1. aggregate per `step` slice first (an ordinary tumble — ONE full-data
  *      shuffle with map-side partials, identical cost to `Tumble`);
  *   2. explode each |slices × keys|-row PARTIAL into the cumulative windows
  *      that contain its slice — replication happens on the tiny
  *      intermediate, never the fact table;
  *   3. merge the partials per (window_start, window_end, keys).
  *
  * The caller therefore supplies the aggregation split into its slice phase
  * and its merge phase (sum→sum, count→sum of counts, min→min, …) — the
  * standard partial/final decomposition every algebraic aggregate has.
  * Holistic aggregates (exact percentiles) have no such split; use a
  * row-exploded `Tumble` for those and accept the replication.
  */
object Cumulate {

  /** @param step     slice / emission period, e.g. "1 hour"
    * @param maxSize  full window span; must be an integral multiple of step
    * @param slice    phase-1 aggregates evaluated per (step-slice, keys)
    * @param merge    phase-2 aggregates over the slice columns, per
    *                 (window_start, window_end, keys)
    */
  def apply(df: DataFrame, tsCol: String, step: String, maxSize: String, keys: String*)(
      slice: Seq[(String, Column)], merge: Seq[(String, Column)]): DataFrame = {
    val stepUs = durationMicros(step)
    val maxUs = durationMicros(maxSize)
    require(maxUs % stepUs == 0 && maxUs > 0,
      s"maxSize ($maxSize) must be a positive integral multiple of step ($step)")

    val keyCols = keys.map(col)
    // unix_micros below rejects TIMESTAMP_NTZ; the session runs UTC so the
    // cast is wall-clock-neutral (same normalization as StreamingOps.tumble).
    val sliced = df
      .withColumn(tsCol, col(tsCol).cast("timestamp"))
      .groupBy(window(col(tsCol), step) +: keyCols: _*)
      .agg(slice.head._2.as(slice.head._1), slice.tail.map { case (n, c) => c.as(n) }: _*)
      .select(col("window.start").as("__slice_start") +: col("window.end").as("__slice_end") +:
        (keys ++ slice.map(_._1)).map(col): _*)

    // maxSize-aligned window start in pure integer micros (pmod keeps
    // pre-epoch timestamps aligned too; no double rounding at 2^53).
    val u = unix_micros(col("__slice_start"))
    val exploded = sliced
      .withColumn("window_start", timestamp_micros(u - pmod(u, lit(maxUs))))
      .withColumn("window_end", explode(sequence(
        col("__slice_end"),
        timestamp_micros(unix_micros(col("window_start")) + lit(maxUs)),
        expr(s"INTERVAL $stepUs MICROSECOND"))))

    exploded
      .groupBy(col("window_start") +: col("window_end") +: keyCols: _*)
      .agg(merge.head._2.as(merge.head._1), merge.tail.map { case (n, c) => c.as(n) }: _*)
      .withColumn("window_time", col("window_end") - expr("INTERVAL 1 MILLISECOND"))
  }

  /** "N unit" Spark-style duration → microseconds (fixed-length units only —
    * a cumulate step/maxSize is a fixed grid by definition).
    */
  private[graft] def durationMicros(s: String): Long = {
    val m = "(?i)^\\s*(\\d+)\\s+(\\w+)\\s*$".r.findFirstMatchIn(s)
      .getOrElse(throw new IllegalArgumentException(s"cannot parse duration: $s"))
    val unit = m.group(2).toUpperCase match {
      case "WEEK" | "WEEKS"               => 7L * 86400000000L
      case "DAY" | "DAYS"                 => 86400000000L
      case "HOUR" | "HOURS"               => 3600000000L
      case "MINUTE" | "MINUTES"           => 60000000L
      case "SECOND" | "SECONDS"           => 1000000L
      case "MILLISECOND" | "MILLISECONDS" => 1000L
      case u => throw new IllegalArgumentException(s"unsupported duration unit: $u")
    }
    m.group(1).toLong * unit
  }
}

/** Event-time interval join (reference: LAB4-Walkthrough.md:231-235 — equi-key
  * plus a bounded time range), as a BUCKETED range join.
  *
  * A plain equi-join on the business key alone is a scale trap when that key is
  * low-cardinality (lab4 joins on `city` — 5 distinct values): every row hashes
  * to ≤5 reducers and each left row multiplies against ALL of its key's right
  * rows before the range filter prunes. The fix is a composite equi-key
  * (key, time-bucket) with bucket width = the range span:
  *
  *   - each LEFT row lands in exactly one bucket (`floor(ts / span)`);
  *   - each RIGHT row is replicated to every bucket its match-range
  *     `[ts+lower, ts+upper]` overlaps — at most 2 when width = span, so the
  *     fan-out is a constant ×2, not range-dependent;
  *   - the exact range predicate stays as a residual filter.
  *
  * Each (left,right) pair can meet in at most one bucket (the left's), so no
  * dedup is needed. The shuffle now spreads over key-cardinality × time-buckets
  * partitions and each probe only sees right rows within ±1 span — the plan
  * survives both key skew and long histories at 100 TB.
  */
object IntervalJoin {

  /** left.key = right.key AND left.ts BETWEEN right.ts + lower AND right.ts + upper
    *
    * `bucketed = false` opts out of the composite-key layout, like
    * `broadcast()` lets a caller declare a size property the planner can't
    * see: on a quasi-unique key (a PK-FK join where each left row matches
    * ≤ a handful of right rows) there is no skew to spread and no long
    * per-key history to prune, so the bucket explode + wider join key is
    * pure overhead — measured 2.3× slower at 6M×1.5M rows on `l_orderkey`.
    * Keep the default for low-cardinality business keys (zones, cities),
    * where bucketing is the difference between ≤2× replication and
    * every-window-per-key replication through ≤|keys| reducers.
    */
  def apply(left: DataFrame, right: DataFrame, leftKey: String, rightKey: String,
            leftTs: String, rightTs: String, lowerBound: String, upperBound: String,
            bucketed: Boolean = true): DataFrame = {
    val lo = expr(s"INTERVAL $lowerBound")
    val hi = expr(s"INTERVAL $upperBound")
    if (!bucketed) {
      return left.join(right,
        left(leftKey) === right(rightKey) &&
          left(leftTs) >= right(rightTs) + lo &&
          left(leftTs) <= right(rightTs) + hi,
        "inner")
    }
    // Bucketing stays correct for ANY width ≥ the true span: the right side
    // replicates to every bucket its real (Spark-arithmetic) match range
    // overlaps, so variable-length units just use a conservative upper bound
    // (month ≤ 31 d, year ≤ 366 d) — replication stays ≤ 2 and results are
    // unchanged. No fallback to the unbucketed skew-trap plan.
    val span = intervalMicros(upperBound) - intervalMicros(lowerBound)
    require(span >= 0, s"upperBound $upperBound must be >= lowerBound $lowerBound")
    val width = math.max(span, 1L)
    def bucket(c: Column): Column = floor(unix_micros(c.cast("timestamp")) / width)

    val lb = left.withColumn("__ij_bucket", bucket(col(leftTs)))
    val rb = right.withColumn("__ij_bucket",
      explode(sequence(bucket(col(rightTs) + lo), bucket(col(rightTs) + hi))))
    lb.join(rb,
        lb(leftKey) === rb(rightKey) && lb("__ij_bucket") === rb("__ij_bucket") &&
          lb(leftTs) >= rb(rightTs) + lo &&
          lb(leftTs) <= rb(rightTs) + hi,
        "inner")
      .drop(lb("__ij_bucket")).drop(rb("__ij_bucket"))
  }

  /** `'N' UNIT` interval literal → microseconds (driver-side, for the bucket
    * width; the residual predicate still uses Spark's own interval
    * arithmetic). Variable-length units map to their MAXIMUM length — an
    * upper bound is all the bucket width needs for correctness.
    */
  private[graft] def intervalMicros(s: String): Long = {
    val m = "'\\s*(-?\\d+)\\s*'\\s+(\\w+)".r.findFirstMatchIn(s.trim)
      .getOrElse(throw new IllegalArgumentException(s"cannot parse interval literal: $s"))
    val n = m.group(1).toLong
    val unit = m.group(2).toUpperCase match {
      case "YEAR" | "YEARS"               => 366L * 86400000000L // upper bound
      case "MONTH" | "MONTHS"             => 31L * 86400000000L  // upper bound
      case "WEEK" | "WEEKS"               => 7L * 86400000000L
      case "DAY" | "DAYS"                 => 86400000000L
      case "HOUR" | "HOURS"               => 3600000000L
      case "MINUTE" | "MINUTES"           => 60000000L
      case "SECOND" | "SECONDS"           => 1000000L
      case "MILLISECOND" | "MILLISECONDS" => 1000L
      case u => throw new IllegalArgumentException(s"unsupported interval unit: $u")
    }
    n * unit
  }
}

/** Dimension-enrichment join (reference Lab1: orders ⋈ customers ⋈ products,
  * LAB1-Walkthrough.md:119-131). Dimensions are broadcast — the fact side never
  * shuffles, which is the correct plan when dims fit in executor memory
  * (customers=100, products=17 in the reference; up to ~100 MB in practice).
  */
object EnrichmentJoin {

  def apply(fact: DataFrame, dims: Seq[(DataFrame, String)]): DataFrame =
    dims.foldLeft(fact) { case (acc, (dim, key)) => acc.join(broadcast(dim), key) }
}
