package graft

import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Behavior
import graft.streaming.StreamingTransitions

class StreamingTransitionsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming transition counts equal the batch matrix; pairs cross micro-batch boundaries") {
    implicit val sq = spark.sqlContext
    implicit val enc = Encoders.product[(Long, String, Timestamp, Long)]
    val mem = MemoryStream[(Long, String, Timestamp, Long)]
    val counts = StreamingTransitions.counts(
      mem.toDF().toDF("user_id", "event_type", "ts", "event_id"),
      "user_id", "event_type", "ts", "event_id")
    val q = counts.writeStream.format("memory").queryName("trans_sink")
      .outputMode("complete").start()

    val batch1 = Seq(
      (1L, "view", ts("2024-03-01 00:00:01"), 1L),
      (1L, "click", ts("2024-03-01 00:00:02"), 2L),
      (2L, "view", ts("2024-03-01 00:00:03"), 3L))
    val batch2 = Seq(
      // user 1's first event of batch 2 must pair with their LAST of batch 1
      (1L, "purchase", ts("2024-03-01 00:00:04"), 4L),
      (2L, "click", ts("2024-03-01 00:00:05"), 5L),
      (2L, "view", ts("2024-03-01 00:00:06"), 6L))
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("trans_sink")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got(("click", "purchase")) == 1L, s"cross-batch pair missing: $got")

    import spark.implicits._
    val all = (batch1 ++ batch2).toDF("user_id", "event_type", "ts", "event_id")
    val batch = Behavior.transitionMatrix(all, "user_id", "event_type", "ts", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == batch, s"streaming $got != batch $batch")
  }
}
