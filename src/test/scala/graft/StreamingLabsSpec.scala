package graft

import org.apache.spark.sql.functions._

class StreamingLabsSpec extends SparkSpec {

  test("streaming lab1 enriches and judges orders per micro-batch") {
    val tmp = java.nio.file.Files.createTempDirectory("lab1s").toString
    val q = graft.pipelines.Labs.lab1PriceMatchStreaming(spark, sfDir, s"$tmp/sink", s"$tmp/ckpt")
    try q.processAllAvailable() finally q.stop()
    val out = spark.read.parquet(s"$tmp/sink")
    assert(out.count() > 0)
    assert(out.filter(col("agent_status") =!= "SUCCESS").count() == 0)
    assert(out.select("verdict").collect().forall(r => Set("MATCH", "NO_MATCH")(r.getString(0))))
    assert(out.columns.contains("customer_name") && out.columns.contains("nation_name"))
  }

  test("streaming lab4 joins spikes back to claims and judges a bounded queue") {
    val tmp = java.nio.file.Files.createTempDirectory("lab4s").toString
    val q = graft.pipelines.Labs.lab4FraudStreaming(spark, sfDir, s"$tmp/sink", s"$tmp/ckpt")
    try q.processAllAvailable() finally q.stop()
    val enum5 = Set("APPROVE", "APPROVE_PARTIAL", "REQUEST_DOCS", "DENY_INELIGIBLE", "DENY_FRAUD")
    val out = spark.read.parquet(s"$tmp/sink")
    assert(out.count() > 0, "streaming lab4 must emit judged claims")
    assert(out.select("verdict").collect().forall(r => enum5(r.getString(0))))
  }

  /** VERDICT r2 wrong-#2: the static claims side must be scanned once, before
    * the stream starts, not once per micro-batch. Proof by deletion: after the
    * first batch the static snapshot is REMOVED from disk; a second,
    * spike-producing micro-batch then still joins and judges successfully —
    * any per-batch re-read would die on the missing path at analysis time.
    */
  test("streaming lab4 scans the static claims source once, not per micro-batch") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val tmp = Files.createTempDirectory("lab4hoist").toString
    val streamDir = s"$tmp/stream"; val staticDir = s"$tmp/static"
    Files.createDirectories(Paths.get(streamDir)); Files.createDirectories(Paths.get(staticDir))
    for (d <- Seq(streamDir, staticDir))
      Files.copy(Paths.get(s"$sfDir/events.parquet"), Paths.get(s"$d/events.parquet"),
        StandardCopyOption.REPLACE_EXISTING)

    val q = graft.pipelines.Labs.lab4FraudStreaming(
      spark, streamDir, s"$tmp/sink", s"$tmp/ckpt", staticDir = staticDir)
    try {
      q.processAllAvailable()
      val afterBatch1 = spark.read.parquet(s"$tmp/sink").count()
      assert(afterBatch1 > 0, "first batch must already emit judged claims")

      // the stream is running; the static snapshot disappears from disk
      Files.delete(Paths.get(s"$staticDir/events.parquet"))

      // feed a fresh micro-batch holding an anomalous 6-h window for
      // 'purchase' (the zone with the latest fixture events, so the spike's
      // 6-h lookback overlaps static claims) plus closer rows that push the
      // watermark past the window end. The replay file must carry ts in the
      // SAME parquet flavor as the fixture (nanos-long vs timestamp[us]) or
      // the file-stream's fixed schema rejects it at read time.
      def micros(s: String): Long = java.time.Instant.parse(s).toEpochMilli * 1000L
      val big = (1 to 24).map(i => (900000L + i, micros("2024-01-30T23:27:00Z") + i * 60L * 1000000L,
        1L, "purchase", 12000.0, "late-surge"))
      val closers = (1 to 3).map(i => (910000L + i, micros("2024-01-31T00:01:00Z") + i * 1000000L,
        1L, "purchase", 5.0, "closer"))
      import spark.implicits._
      val staging = s"$tmp/staging"
      val fixtureTsIsLong = spark.read.parquet(s"$streamDir/events.parquet")
        .schema("ts").dataType == org.apache.spark.sql.types.LongType
      val raw = (big ++ closers).toDF("event_id", "us", "user_id", "event_type", "value", "props")
      val replay =
        if (fixtureTsIsLong) raw.withColumn("ts", col("us") * 1000L)
        else raw.withColumn("ts", timestamp_micros(col("us")).cast("timestamp_ntz"))
      replay.select("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(staging)
      val part = Files.list(Paths.get(staging)).toArray.map(_.toString)
        .find(p => p.endsWith(".parquet")).get
      Files.move(Paths.get(part), Paths.get(s"$streamDir/events_2.parquet"))

      q.processAllAvailable()
      val out = spark.read.parquet(s"$tmp/sink")
      assert(out.count() > afterBatch1,
        "the second micro-batch must join its spike against the pinned claims snapshot")
    } finally q.stop()
  }
}
