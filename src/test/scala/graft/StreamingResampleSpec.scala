package graft

import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingResampleSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming grid rows equal the batch gridFill on a closed input, across micro-batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    implicit val enc = Encoders.product[(String, Timestamp, Double)]
    val fixture = Seq(
      ("a", ts("2026-01-05 10:00:00"), 1.0),
      ("a", ts("2026-01-05 10:03:00"), 2.0), // between grid points: fill source only
      ("a", ts("2026-01-05 10:07:30"), 9.0),
      ("b", ts("2026-01-05 10:04:00"), 5.0),
      ("a", ts("2026-01-05 10:10:00"), 4.0), // exactly on a grid point
      ("b", ts("2026-01-05 10:14:00"), 6.0))
    val mem = MemoryStream[(String, Timestamp, Double)]
    val q = graft.streaming.StreamingResample(
      mem.toDF().toDF("k", "ts", "v"), "k", "ts", "v", stepSeconds = 300)
      .writeStream.format("memory").queryName("resample_sink").outputMode("append").start()
    try {
      val (b1, b2) = fixture.splitAt(3) // split mid-key-a across triggers
      mem.addData(b1); q.processAllAvailable()
      mem.addData(b2); q.processAllAvailable()
    } finally q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getTimestamp(1), r.getTimestamp(2), r.getDouble(3))
    val streamed = spark.table("resample_sink")
      .select("k", "grid_ts", "obs_ts", "v").collect().map(key).toSet
    val batch = graft.operators.Resample.gridFill(
      fixture.toDF("k", "ts", "v"), "k", "ts", 300, Seq("ts", "v"))
      .select(col("k"), col("grid_ts"), col("ts"), col("v")).collect().map(key).toSet
    assert(streamed == batch && streamed.nonEmpty,
      s"streaming must equal batch:\nonly streamed: ${(streamed -- batch).toSeq.sortBy(_._2.getTime)}\n" +
        s"only batch: ${(batch -- streamed).toSeq.sortBy(_._2.getTime)}")
    // the dense-grid property itself: key a spans 10 minutes at 5-min steps
    assert(streamed.count(_._1 == "a") == 3, s"a: 10:00, 10:05, 10:10 -> 3 grid rows")
  }
}
