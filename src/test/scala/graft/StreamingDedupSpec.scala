package graft

import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingOps

class StreamingDedupSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("dedupWithinWatermark keeps first arrival, drops in-horizon duplicates, " +
    "and re-admits content after state eviction") {
    implicit val sq = spark.sqlContext
    implicit val enc = Encoders.product[(Long, Timestamp, String)]
    val mem = MemoryStream[(Long, Timestamp, String)]
    val df = StreamingOps.dedupWithinWatermark(
      mem.toDF().toDF("id", "ts", "text"), "text", "ts", "10 seconds")
    val q = df.writeStream.format("memory").queryName("dedup_sink").outputMode("append").start()
    try {
      // batch 1: duplicate content inside one batch — only the first survives
      mem.addData((1L, ts("2024-03-01 00:00:00"), "same doc"),
        (2L, ts("2024-03-01 00:00:01"), "same doc"),
        (3L, ts("2024-03-01 00:00:02"), "other doc"))
      q.processAllAvailable()
      // batch 2: same content again within the horizon — still dropped
      mem.addData((4L, ts("2024-03-01 00:00:03"), "same doc"))
      q.processAllAvailable()
      // batch 3: advance watermark far past the horizon → state evicted,
      // the same content is a NEW document now (bounded-state semantics)
      mem.addData((5L, ts("2024-03-01 01:00:00"), "advance"))
      q.processAllAvailable()
      mem.addData((6L, ts("2024-03-01 01:00:01"), "same doc"))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("dedup_sink").collect().map(_.getLong(0)).toSet
    assert(ids.contains(1L) && !ids.contains(2L) && ids.contains(3L) && !ids.contains(4L),
      s"in-horizon duplicates must drop: $ids")
    assert(ids.contains(6L), s"post-eviction re-arrival must be re-admitted: $ids")
    // fingerprint helper column must not leak into the output schema
    assert(!spark.table("dedup_sink").columns.contains("__fp"))
  }
}
