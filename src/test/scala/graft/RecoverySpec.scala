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
}
