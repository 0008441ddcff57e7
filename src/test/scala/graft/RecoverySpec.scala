package graft

import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.anomaly.AnomalyDetector
import graft.streaming.StreamingAnomaly

class RecoverySpec extends SparkSpec {

  test("stateful anomaly recovers per-key state from checkpoint across query restarts") {
    implicit val sq = spark.sqlContext
    implicit val enc = Encoders.product[(String, Timestamp, Double)]
    val cfg = AnomalyDetector.Config(minTrainingSize = 3, maxTrainingSize = 5, confidencePercentage = 95.0)
    val values = Seq(10.0, 11.0, 10.0, 11.0, 10.0, 100.0, 10.0, 11.0)
    val pts = values.zipWithIndex.map { case (v, i) =>
      ("k1", Timestamp.valueOf(f"2024-01-01 00:${i}%02d:00"), v)
    }
    val tmp = java.nio.file.Files.createTempDirectory("recov").toString

    val mem = MemoryStream[(String, Timestamp, Double)]
    def startQuery(m: MemoryStream[(String, Timestamp, Double)]) =
      StreamingAnomaly(m.toDF().toDF("key", "ts", "value"), "key", "ts", "value", cfg)
        .writeStream.format("parquet")
        .option("path", s"$tmp/sink").option("checkpointLocation", s"$tmp/ckpt")
        .outputMode("append").start()

    // first run: half the series, then a clean stop
    val (first, second) = pts.splitAt(4)
    val q1 = startQuery(mem)
    try { mem.addData(first: _*); q1.processAllAvailable() } finally q1.stop()

    // second run: NEW source instance, same checkpoint — state must carry over
    // (memory sources replay from their own offsets; re-adding the first half
    // is ignored by the committed offset log, only new rows process)
    mem.addData(second: _*)
    val q2 = startQuery(mem)
    try q2.processAllAvailable() finally q2.stop()

    val got = spark.read.parquet(s"$tmp/sink").orderBy("ts")
      .select("forecast_value", "is_anomaly").collect()
    val want = AnomalyDetector.detectSeries(values, cfg)
    assert(got.length == want.length, s"row count after recovery: ${got.length} vs ${want.length}")
    got.zip(want).foreach { case (row, (f, _, _, anom)) =>
      (f, if (row.isNullAt(0)) None else Some(row.getDouble(0))) match {
        case (Some(x), Some(y)) => assert(math.abs(x - y) < 1e-9,
          "post-restart forecasts must use pre-restart history (state recovered)")
        case (None, None)       => ()
        case other              => fail(s"mismatch: $other")
      }
      assert(row.getBoolean(1) == anom)
    }
    // the spike at index 5 is in the SECOND run — flagging it requires the
    // warm-up history from the FIRST run to have survived the restart
    assert(got(5).getBoolean(1), "spike must be flagged using recovered state")
  }

  test("CUSUM stream recovers baseline AND accumulated sums across query restarts") {
    import graft.anomaly.Cusum
    implicit val sq = spark.sqlContext
    implicit val enc = Encoders.product[(String, Long, Timestamp, Double)]
    val cfg = Cusum.Config(warmup = 5, k = 0.5, h = 3.0)
    // 5-point baseline around 10.4, then a persistent +1.6 level shift: each
    // shifted point adds z − k ≈ 2.4 to S⁺, so the alarm fires on the SECOND
    // shifted point — which arrives after the restart. Flagging it needs both
    // the frozen (μ, σ) and the partially-accumulated S⁺ from run 1.
    val values = Seq(10.0, 11.0, 10.0, 11.0, 10.0, 12.0, 12.0, 10.5)
    val pts = values.zipWithIndex.map { case (v, i) =>
      ("k1", i.toLong, Timestamp.valueOf(f"2024-01-01 00:${i}%02d:00"), v)
    }
    val tmp = java.nio.file.Files.createTempDirectory("recov-cusum").toString

    val mem = MemoryStream[(String, Long, Timestamp, Double)]
    def startQuery(m: MemoryStream[(String, Long, Timestamp, Double)]) =
      Cusum.detectStream(m.toDF().toDF("key", "tie", "ts", "value"),
          "key", "value", "ts", "tie", cfg)
        .writeStream.format("parquet")
        .option("path", s"$tmp/sink").option("checkpointLocation", s"$tmp/ckpt")
        .outputMode("append").start()

    // run 1: warmup + the FIRST shifted point (S⁺ ≈ 2.42, below h)
    val (first, second) = pts.splitAt(6)
    val q1 = startQuery(mem)
    try { mem.addData(first: _*); q1.processAllAvailable() } finally q1.stop()
    // run 2: new query instance, same checkpoint
    mem.addData(second: _*)
    val q2 = startQuery(mem)
    try q2.processAllAvailable() finally q2.stop()

    val got = spark.read.parquet(s"$tmp/sink").orderBy("tie")
      .select("s_pos", "s_neg", "is_changepoint", "warm").collect()
    assert(got.length == values.length)

    // bit-identical to an uninterrupted batch run over the same series
    import spark.implicits._
    val batch = Cusum.detectBatch(
      pts.toDF("key", "tie", "ts", "value"), col("value"),
      Seq(col("key")), Seq(col("tie")), cfg)
      .orderBy("tie").select("s_pos", "s_neg", "is_changepoint", "warm").collect()
    got.zip(batch).zipWithIndex.foreach { case ((s, b), i) =>
      assert(s.getDouble(0) == b.getDouble(0) && s.getDouble(1) == b.getDouble(1) &&
        s.getBoolean(2) == b.getBoolean(2) && s.getBoolean(3) == b.getBoolean(3),
        s"row $i diverged after recovery: stream=$s batch=$b")
    }
    // the changepoint is at index 6 — first row AFTER the restart
    assert(got(6).getBoolean(2), "changepoint must fire from recovered S⁺ + baseline")
    assert(!got(5).getBoolean(2), "the pre-restart shifted point must NOT yet alarm")
  }
}
