package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.anomaly.AnomalyDetector

/** Streaming ML_DETECT_ANOMALIES (W2/M2 — the reference's
  * `... OVER (PARTITION BY key ORDER BY window_time RANGE UNBOUNDED PRECEDING)`
  * at LAB3-Walkthrough.md:128-132): per-key, event-time-ordered running
  * detection, one output row per input row.
  *
  * Spark has no streaming OVER window; this is the custom stateful operator
  * (SURVEY.md §7.3) built on flatMapGroupsWithState:
  *   - state = ring buffer of ≤ maxTrainingSize recent values per key — the
  *     reference's own state bound ("prevents memory issues",
  *     LAB4-Walkthrough.md:188);
  *   - rows within a trigger batch are processed in event-time order;
  *     cross-trigger ordering is the source's responsibility (the reference
  *     replays sorted for the same reason, scripts/publish_lab3_data.py:357-370);
  *   - emits exactly the batch detector's contract: nulls until
  *     minTrainingSize, then forecast/upper/lower/is_anomaly.
  *
  * State scales O(keys × maxTrainingSize) — at 1000 executors this partitions
  * by key hash like any keyed state; no driver involvement.
  */
object StreamingAnomaly {

  case class Point(key: String, ts: Timestamp, value: Double)
  case class Detection(key: String, ts: Timestamp, value: Double,
                       forecast_value: Option[Double], upper_bound: Option[Double],
                       lower_bound: Option[Double], is_anomaly: Boolean)
  case class BufferState(values: List[Double])

  def apply(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
            cfg: AnomalyDetector.Config): Dataset[Detection] = {
    implicit val pointEnc = Encoders.product[Point]
    implicit val detEnc = Encoders.product[Detection]
    implicit val stateEnc = Encoders.product[BufferState]
    implicit val keyEnc = Encoders.STRING

    val points = df.select(
      col(keyCol).cast("string").as("key"),
      col(tsCol).cast("timestamp").as("ts"),
      col(valueCol).cast("double").as("value")).as[Point]

    points
      .groupByKey(_.key)
      .flatMapGroupsWithState[BufferState, Detection](OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[Point], state: GroupState[BufferState]) =>
          var buf = state.getOption.map(_.values).getOrElse(Nil)
          val out = rows.toSeq.sortBy(_.ts.getTime).map { p =>
            val det =
              if (buf.size >= cfg.minTrainingSize) {
                val n = buf.size
                val mean = buf.sum / n
                val variance = buf.map(x => (x - mean) * (x - mean)).sum / (n - 1)
                val sd = math.sqrt(variance)
                val (lo, hi) = (mean - cfg.z * sd, mean + cfg.z * sd)
                Detection(key, p.ts, p.value, Some(mean), Some(hi), Some(lo),
                  p.value > hi || p.value < lo)
              } else Detection(key, p.ts, p.value, None, None, None, is_anomaly = false)
            buf = (buf :+ p.value).takeRight(cfg.maxTrainingSize)
            det
          }
          state.update(BufferState(buf))
          out.iterator
      }
  }
}
