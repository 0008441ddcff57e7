package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale spot-run for the streaming VALUE-CEP operator (r10): replay the
  * events table as a TRUE multi-micro-batch stream (time-sliced files,
  * maxFilesPerTrigger = 1, so greedy runs and the skip-past cursor cross
  * micro-batch boundaries per key), drain the q164 ticker pattern through
  * [[graft.streaming.StreamingMatchRecognize]], and check span parity
  * against the batch NFA scan on the same rows.
  *
  * Bounded-stream contract (the SpotStreamingLabs discipline): a run still
  * OPEN when the file stream ends never emits — the batch side instead
  * decides it against the partition end — so the streaming span set must be
  * a SUBSET of the batch set missing at most one final match per key;
  * everything else must match exactly (symmetric except() COUNTS, nothing
  * collected to the driver).
  *
  * Usage: runMain graft.SpotStreamingMr <sfDir> [slices]
  */
object SpotStreamingMr {

  /** Time-sliced feed files under `tmp/feed`, written in event-time order so
    * the file source's modification-time ordering replays history
    * faithfully; [lo, hi) slicing keeps every equal-timestamp group in ONE
    * slice. Returns (feedDir, the events DataFrame the feed was cut from).
    */
  private[graft] def makeFeed(spark: org.apache.spark.sql.SparkSession, sfDir: String,
                              slices: Int, tmp: String): (String, DataFrame) = {
    val feed = s"$tmp/feed"
    new java.io.File(feed).mkdirs()
    val ev = graft.core.Tables(spark, sfDir, "events")
      .select(col("user_id"), col("event_type"), col("ts").cast("timestamp").as("ts"),
        col("event_id"), col("value"))
    val withUs = ev.withColumn("__us", unix_micros(col("ts")))
    val bounds = withUs.stat.approxQuantile("__us",
      (1 until slices).map(_.toDouble / slices).toArray, 0.0001)
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val cuts: Seq[Long] = (Long.MinValue +: bounds.map(_.toLong).toSeq) :+ Long.MaxValue
    cuts.sliding(2).zipWithIndex.foreach { case (pair, i) =>
      val (lo, hi) = (pair.head, pair.last)
      val slice = withUs.filter(col("__us") >= lo && col("__us") < hi).drop("__us")
      val dir = f"$tmp/slice_$i%03d"
      slice.coalesce(1).write.mode("overwrite").parquet(dir)
      val part = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
        .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
      fs.rename(part, new org.apache.hadoop.fs.Path(f"$feed/slice_$i%03d.parquet"))
    }
    (feed, ev)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("benchdata/sf10")
    val slices = args.lift(1).map(_.toInt).getOrElse(20)
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import graft.operators.MatchRecognize.MrTok
    val tmp = java.nio.file.Files.createTempDirectory("mrstream").toString
    val (feed, ev) = makeFeed(spark, sfDir, slices, tmp)
    println(s"[mrstream] feed ready: $slices slices")

    // ---- the standing ticker pattern over the sliced stream
    val schema = spark.read.parquet(feed).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(feed)
    val toks = Seq(MrTok("S", 1, Some(1)), MrTok("D", 1, None), MrTok("U", 1, None))
    val defs = Seq(None, Some("D.value < PREV(D.value)"), Some("U.value > PREV(U.value)"))
    // peak retained buffer rows for any key (post-batch, after eviction) —
    // the number the decided-prefix eviction + navDepth margin must bound
    val probe = new graft.streaming.StreamingOps.MaxAccumulator
    spark.sparkContext.register(probe, "mr_peak_state_rows")
    val matched = graft.streaming.StreamingMatchRecognize(
      stream, "user_id", condCols = Seq("value"),
      tsCol = "ts", tieCol = "event_id", tokens = toks, defs = defs,
      stateProbe = Some(probe))
    val t0 = System.nanoTime()
    val q = matched.writeStream.format("parquet")
      .option("path", s"$tmp/sink").option("checkpointLocation", s"$tmp/ckpt")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val sec = (System.nanoTime() - t0) / 1e9

    // ---- parity vs the batch NFA scan (same rows, same pattern)
    ev.createOrReplaceTempView("mr_stream_events")
    val batch = graft.sql.SqlFrontend.execute(spark, """
      SELECT * FROM mr_stream_events MATCH_RECOGNIZE (
        PARTITION BY user_id ORDER BY ts, event_id
        MEASURES FIRST(S.ts) AS start_ts, FIRST(S.event_id) AS start_tie,
                 LAST(U.ts) AS end_ts
        ONE ROW PER MATCH
        PATTERN (S D+ U+)
        DEFINE D AS D.value < PREV(D.value), U AS U.value > PREV(U.value)
      )""")
      .select(col("user_id").cast("string").as("key"),
        unix_micros(col("start_ts").cast("timestamp")).as("s"),
        unix_micros(col("end_ts").cast("timestamp")).as("e"),
        col("start_tie").cast("long").as("tie"))
    val streamed = spark.read.parquet(s"$tmp/sink")
      .select(col("key"), unix_micros(col("match_start_ts")).as("s"),
        unix_micros(col("match_end_ts")).as("e"), col("start_tie").cast("long").as("tie"))
    val nStream = streamed.count()
    val nBatch = batch.count()
    val extra = streamed.exceptAll(batch).count() // must be empty
    val missing = batch.exceptAll(streamed).count() // <= one open tail per key
    val nKeys = ev.select("user_id").distinct().count()
    val nEvents = ev.count()
    val ok = nStream > 0 && extra == 0 && missing <= nKeys
    println(f"""[mrstream] {"sec":$sec%.1f,"slices":$slices,"events":$nEvents,"eventsPerSec":${(nEvents / sec).toLong},"peakStateRows":${probe.value},"streamMatches":$nStream,"batchMatches":$nBatch,"extra":$extra,"missingFinal":$missing,"keys":$nKeys,"ok":$ok}""")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
