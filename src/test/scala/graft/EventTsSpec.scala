package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Regression gate for the events `ts` normalization (VERDICT r4 wrong-#1).
  *
  * The driver's testdata generator has shipped `events.ts` two ways across
  * regenerations: parquet TIMESTAMP(NANOS) (surfaced as a nanos long under
  * `spark.sql.legacy.parquet.nanosAsLong`) and TIMESTAMP(MICROS)
  * (TIMESTAMP_NTZ). Round 4 broke because the streaming labs hardcoded the
  * nanos branch. Both flavors must normalize through
  * [[graft.core.Tables.normalizeEventTs]] to the same TIMESTAMP_NTZ micros —
  * in batch AND when the schema is known upfront (the streaming-reader shape).
  */
class EventTsSpec extends SparkSpec {

  // 2024-03-01T00:00:01.234567Z in micros
  private val micros = 1709251201234567L

  // single FILE named events.parquet (like the driver fixture), not a directory:
  // the streaming readers glob on the file name
  private def writeParquet(df: org.apache.spark.sql.DataFrame): String = {
    import java.nio.file.Paths
    val dir = Files.createTempDirectory("evts").toString
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/staging")
    val part = Files.list(Paths.get(s"$dir/staging")).toArray.map(_.toString)
      .find(_.endsWith(".parquet")).get
    Files.move(Paths.get(part), Paths.get(s"$dir/events.parquet"))
    dir
  }

  test("normalizeEventTs: nanos-as-long flavor truncates to identical NTZ micros") {
    import spark.implicits._
    val dir = writeParquet(Seq((1L, micros * 1000L + 789L)).toDF("event_id", "ts"))
    val out = graft.core.Tables(spark, dir, "events")
    assert(out.schema("ts").dataType == TimestampNTZType)
    val got = out.select(unix_micros(col("ts").cast("timestamp"))).head().getLong(0)
    assert(got == micros) // sub-micro nanos truncated, not rounded
  }

  test("normalizeEventTs: timestamp[us] (TIMESTAMP_NTZ) flavor passes through") {
    import spark.implicits._
    val dir = writeParquet(
      Seq((1L, micros)).toDF("event_id", "us")
        .withColumn("ts", timestamp_micros(col("us")).cast("timestamp_ntz"))
        .select("event_id", "ts"))
    // confirm the fixture really is the timestamp flavor, not long
    val raw = spark.read.parquet(s"$dir/events.parquet")
    assert(raw.schema("ts").dataType == TimestampNTZType)
    val out = graft.core.Tables(spark, dir, "events")
    assert(out.schema("ts").dataType == TimestampNTZType)
    assert(out.select(unix_micros(col("ts").cast("timestamp"))).head().getLong(0) == micros)
  }

  test("normalizeEventTs analyzes against a schema known upfront (streaming-reader shape)") {
    import spark.implicits._
    for (dir <- Seq(
        writeParquet(Seq((1L, micros * 1000L)).toDF("event_id", "ts")),
        writeParquet(Seq((1L, micros)).toDF("event_id", "us")
          .withColumn("ts", timestamp_micros(col("us")).cast("timestamp_ntz"))
          .select("event_id", "ts")))) {
      val rawSchema = spark.read.parquet(s"$dir/events.parquet").schema
      // exactly what lab3FleetStreaming / lab4FraudStreaming do
      val stream = spark.readStream.schema(rawSchema)
        .option("pathGlobFilter", "events.parquet").parquet(dir)
        .withColumn("ts", graft.core.Tables.normalizeEventTs(rawSchema).cast("timestamp"))
      assert(stream.schema("ts").dataType == TimestampType) // analyzed, no DATATYPE_MISMATCH
      val q = stream.writeStream.format("memory").queryName(s"evts_${dir.hashCode.abs}").start()
      try { q.processAllAvailable() } finally q.stop()
      val got = spark.table(s"evts_${dir.hashCode.abs}")
        .select(unix_micros(col("ts"))).head().getLong(0)
      assert(got == micros)
    }
  }
}
