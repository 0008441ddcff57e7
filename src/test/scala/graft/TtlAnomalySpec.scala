package graft

import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.TTLConfig

import graft.anomaly.AnomalyDetector

class TtlAnomalySpec extends SparkSpec {

  test("transformWithState anomaly (RocksDB + TTL) matches the pure detector") {
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sq = spark.sqlContext
      implicit val enc = Encoders.product[(String, Timestamp, Double)]
      val cfg = AnomalyDetector.Config(minTrainingSize = 3, maxTrainingSize = 5, confidencePercentage = 95.0)
      val values = Seq(10.0, 11.0, 10.0, 11.0, 10.0, 100.0, 10.0)
      val mem = MemoryStream[(String, Timestamp, Double)]
      val det = graft.streaming.TtlAnomaly(
        mem.toDF().toDF("key", "ts", "value"), "key", "ts", "value", cfg,
        TTLConfig(java.time.Duration.ofHours(1)))
      // ProcessingTime time-mode (required for TTL) schedules continuous
      // housekeeping batches, so processAllAvailable() never settles — poll
      // the sink for the expected row count instead.
      val q = det.writeStream.format("memory").queryName("ttl_anom").outputMode("append").start()
      try {
        val pts = values.zipWithIndex.map { case (v, i) =>
          ("k1", Timestamp.valueOf(f"2024-01-01 00:${i}%02d:00"), v)
        }
        def awaitRows(n: Int): Unit = {
          val deadline = System.nanoTime() + 120L * 1000000000L
          while (spark.table("ttl_anom").count() < n && System.nanoTime() < deadline)
            Thread.sleep(250)
        }
        val (a, b) = pts.splitAt(4)
        mem.addData(a: _*); awaitRows(4)
        mem.addData(b: _*); awaitRows(values.length)
        val got = spark.table("ttl_anom").orderBy("ts")
          .select("forecast_value", "is_anomaly").collect()
        val want = AnomalyDetector.detectSeries(values, cfg)
        assert(got.length == want.length)
        got.zip(want).foreach { case (row, (f, _, _, anom)) =>
          (f, if (row.isNullAt(0)) None else Some(row.getDouble(0))) match {
            case (Some(x), Some(y)) => assert(math.abs(x - y) < 1e-9)
            case (None, None)       => ()
            case other              => fail(s"mismatch: $other")
          }
          assert(row.getBoolean(1) == anom)
        }
        assert(got.count(_.getBoolean(1)) >= 1)
      } finally q.stop()
    } finally prior match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None    => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
