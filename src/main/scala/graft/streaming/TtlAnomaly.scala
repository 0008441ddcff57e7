package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

import graft.anomaly.AnomalyDetector
import graft.streaming.StreamingAnomaly.{BufferState, Detection, Point}

/** ML_DETECT_ANOMALIES on the Spark 4 `transformWithState` API with state TTL —
  * the direct analog of the reference's `SET 'sql.state-ttl'`
  * (LAB1-Walkthrough.md:120, LAB4-Walkthrough.md:124): per-key detector state
  * expires after `ttl` of processing-time inactivity, so abandoned keys (a
  * zone that stops producing rides) release their ring buffers without any
  * manual cleanup — exactly the state-bounding contract Flink's TTL provides.
  *
  * Requires the RocksDB state store provider
  * (`spark.sql.streaming.stateStore.providerClass` =
  * `...state.RocksDBStateStoreProvider`), which ships with Spark.
  */
object TtlAnomaly {

  class Processor(cfg: AnomalyDetector.Config, ttl: TTLConfig)
    extends StatefulProcessor[String, Point, Detection] {

    @transient private var buf: ValueState[BufferState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      buf = getHandle.getValueState[BufferState]("buf", Encoders.product[BufferState], ttl)

    override def handleInputRows(key: String, rows: Iterator[Point],
                                 timerValues: TimerValues): Iterator[Detection] = {
      val prior = Option(buf.get())
      var history = prior.map(_.values).getOrElse(Nil)
      var lastTs = prior.map(_.lastTsMicros).getOrElse(Long.MinValue)
      var period = prior.map(_.period).getOrElse(0)
      val out = rows.toSeq.sortBy(p => StreamingOps.tsMicros(p.ts)).map { p =>
        // shared forecast step (zband/ar/stl incl. auto-period) — see
        // AnomalyDetector.step / advancePeriod
        val st = AnomalyDetector.advancePeriod(lastTs, period, StreamingOps.tsMicros(p.ts), cfg)
        lastTs = st._1; period = st._2
        val (f, hi, lo, anom) = AnomalyDetector.step(history, p.value, cfg, period)
        val det = Detection(key, p.ts, p.value, f, hi, lo, anom)
        history = (history :+ p.value).takeRight(cfg.maxTrainingSize)
        det
      }
      buf.update(BufferState(history, lastTs, period))
      out.iterator
    }
  }

  def apply(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
            cfg: AnomalyDetector.Config, ttl: TTLConfig): Dataset[Detection] = {
    implicit val pointEnc: Encoder[Point] = Encoders.product[Point]
    implicit val detEnc: Encoder[Detection] = Encoders.product[Detection]
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    df.select(
      col(keyCol).cast("string").as("key"),
      col(tsCol).cast("timestamp").as("ts"),
      col(valueCol).cast("double").as("value")).as[Point]
      .groupByKey(_.key)
      .transformWithState(new Processor(cfg, ttl), TimeMode.ProcessingTime(), OutputMode.Append())
  }
}
