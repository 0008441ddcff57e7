package graft.anomaly

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** CUSUM changepoint detection (Page 1954) — the mean-SHIFT member of the
  * anomaly family. The band detectors ([[AnomalyDetector]]: zband/AR/STL/
  * ARIMA) flag individual points outside a forecast band; CUSUM accumulates
  * small persistent deviations until their SUM is undeniable, so it catches
  * a 1.5σ level shift a 99% band never trips on — the "traffic quietly
  * degraded 20%" class of incident.
  *
  * Math (standardized two-sided form): baseline (μ₀, σ) is frozen from the
  * first `warmup` points per key; each later point's z = (x−μ₀)/σ feeds
  *   S⁺ = max(0, S⁺ + z − k)   S⁻ = max(0, S⁻ − z − k)
  * and a changepoint fires when either exceeds `h` (then both reset — the
  * restart convention, so repeated shifts re-alarm). Defaults k=0.5 (tuned
  * to detect ≥1σ shifts), h=5 (ARL₀ ≈ 10⁴ points under H₀).
  *
  * One `step()` drives the batch sequential path and the streaming
  * flatMapGroupsWithState twin — bit-identical, the family discipline.
  * State is O(1) per key (six doubles); the batch path is one key shuffle +
  * in-partition sort, keys streamed through each task one after another.
  */
object Cusum {

  case class Config(warmup: Int = 20, k: Double = 0.5, h: Double = 5.0) {
    require(warmup >= 2, s"warmup must be >= 2 (a stddev needs it), got $warmup")
    require(k >= 0, s"drift k must be >= 0, got $k")
    require(h > 0, s"decision threshold h must be > 0, got $h")
  }

  /** (n, sum, sumSq) while warming; (mu, sd) frozen after; running S⁺/S⁻. */
  case class State(n: Long, sum: Double, sumSq: Double,
                   mu: Double, sd: Double, sPos: Double, sNeg: Double)
  val Empty: State = State(0L, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)

  /** One online step: returns (state', sPos, sNeg, changepoint, warm). Warmup
    * points accumulate the baseline and emit (0, 0, false, false); the
    * baseline freezes at exactly `warmup` points (sample sd, /(n−1) — the
    * family's convention); a degenerate sd (constant warmup) emits alarms on
    * ANY deviation via the sd=0 guard (z = ±∞ clamps through max()).
    */
  private[graft] def step(st: State, v: Double, cfg: Config): (State, Double, Double, Boolean, Boolean) = {
    // a NaN observation must not poison the recurrences (max(0, NaN) = NaN
    // would stick forever and silently disable the key): skip it entirely —
    // no state change, no alarm, sums reported as they stand
    if (v.isNaN) (st, st.sPos, st.sNeg, false, st.n >= cfg.warmup)
    else if (st.n < cfg.warmup) {
      val n1 = st.n + 1
      val s1 = st.sum + v
      val q1 = st.sumSq + v * v
      val next =
        if (n1 == cfg.warmup) {
          val mu = s1 / n1
          val variance = math.max((q1 - s1 * s1 / n1) / (n1 - 1), 0.0)
          State(n1, s1, q1, mu, math.sqrt(variance), 0.0, 0.0)
        } else State(n1, s1, q1, 0.0, 0.0, 0.0, 0.0)
      (next, 0.0, 0.0, false, false)
    } else {
      val z = if (st.sd > 0) (v - st.mu) / st.sd
              else if (v == st.mu) 0.0
              else if (v > st.mu) Double.PositiveInfinity else Double.NegativeInfinity
      val sPos = math.max(0.0, st.sPos + z - cfg.k)
      val sNeg = math.max(0.0, st.sNeg - z - cfg.k)
      val alarm = sPos > cfg.h || sNeg > cfg.h
      val next = if (alarm) st.copy(sPos = 0.0, sNeg = 0.0)
                 else st.copy(sPos = sPos, sNeg = sNeg)
      (next, sPos, sNeg, alarm, true)
    }
  }

  /** Batch detection: adds `s_pos`, `s_neg`, `is_changepoint`, `warm`.
    * `orderCols` must totally order each key's series (tie-break included).
    */
  def detectBatch(df: DataFrame, valueCol: Column, partitionCols: Seq[Column],
                  orderCols: Seq[Column], cfg: Config): DataFrame = {
    graft.core.KeyImage.requireAtomic(df, partitionCols)
    val pre = df
      .withColumn("__v", valueCol.cast("double"))
      // collision-free length-prefixed key image (a separator encoding can
      // merge two crafted keys - state would never reset between their series)
      .withColumn("__key", graft.core.KeyImage.of(partitionCols))
      .repartition(partitionCols: _*)
      .sortWithinPartitions(col("__key") +: orderCols: _*)
    val outSchema = StructType(pre.schema.fields ++ Seq(
      StructField("s_pos", DoubleType), StructField("s_neg", DoubleType),
      StructField("is_changepoint", BooleanType), StructField("warm", BooleanType)))
    val vIdx = pre.schema.fieldIndex("__v")
    val keyIdx = pre.schema.fieldIndex("__key")
    pre.mapPartitions { it =>
      var curKey: String = null
      var st = Empty
      it.map { r =>
        val key = r.getString(keyIdx)
        if (key != curKey) { curKey = key; st = Empty }
        val out =
          if (r.isNullAt(vIdx)) Seq(null, null, null, Boolean.box(st.n >= cfg.warmup))
          else {
            val (next, sPos, sNeg, alarm, warm) = step(st, r.getDouble(vIdx), cfg)
            st = next
            Seq(Double.box(sPos), Double.box(sNeg), Boolean.box(alarm), Boolean.box(warm))
          }
        Row.fromSeq(r.toSeq ++ out)
      }
    }(Encoders.row(outSchema))
      .drop("__v", "__key")
  }

  case class Ev(key: String, tie: Long, ts: java.sql.Timestamp, v: Option[Double])
  case class Out(key: String, tie: Long, ts: java.sql.Timestamp, v: Option[Double],
                 s_pos: Option[Double], s_neg: Option[Double],
                 is_changepoint: Option[Boolean], warm: Boolean)

  /** Streaming twin: the same step over flatMapGroupsWithState — in-batch
    * rows time-ordered, state carried across micro-batches, bit-identical
    * to [[detectBatch]] on ordered arrivals. A null value row passes through
    * with null sums and unchanged state — exactly the batch path's
    * null-row semantics (an Option-typed Ev so deserialization cannot
    * crash the query on a null metric).
    */
  def detectStream(df: DataFrame, keyCol: String, valueCol: String, tsCol: String,
                   tieCol: String, cfg: Config) = {
    implicit val evEnc = Encoders.product[Ev]
    implicit val outEnc = Encoders.product[Out]
    implicit val stEnc = Encoders.product[State]
    implicit val keyEnc = Encoders.STRING
    // null tie/ts coalesce to minimal sentinels (a null Long field would
    // kill deserialization; a null ts would NPE the sort) — mirroring the
    // batch sort's NULLS FIRST placement instead of dropping the row
    df.select(col(keyCol).cast("string").as("key"),
        coalesce(col(tieCol).cast("long"), lit(Long.MinValue)).as("tie"),
        coalesce(col(tsCol).cast("timestamp"), to_timestamp(lit(0))).as("ts"),
        col(valueCol).cast("double").as("v")).as[Ev]
      .groupByKey(_.key)
      .flatMapGroupsWithState[State, Out](OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[Ev], state: GroupState[State]) =>
          var st = state.getOption.getOrElse(Empty)
          val out = Seq.newBuilder[Out]
          rows.toSeq.sortBy(e => (graft.streaming.StreamingOps.tsMicros(e.ts), e.tie)).foreach { e =>
            e.v match {
              case Some(x) =>
                val (next, sPos, sNeg, alarm, warm) = step(st, x, cfg)
                st = next
                out += Out(key, e.tie, e.ts, e.v, Some(sPos), Some(sNeg), Some(alarm), warm)
              case None =>
                out += Out(key, e.tie, e.ts, None, None, None, None, st.n >= cfg.warmup)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }
}
