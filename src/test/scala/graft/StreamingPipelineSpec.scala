package graft

import org.apache.spark.sql.functions._

class StreamingPipelineSpec extends SparkSpec {

  test("streaming lab3 produces enriched surges consistent with the batch pipeline") {
    val tmp = java.nio.file.Files.createTempDirectory("lab3s").toString
    val q = graft.pipelines.Labs.lab3FleetStreaming(spark, sfDir, s"$tmp/sink", s"$tmp/ckpt")
    try {
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.read.parquet(s"$tmp/sink")
    assert(streamed.count() > 0, "streaming pipeline must emit surges")
    assert(streamed.select("reason").collect().forall(_.getString(0).startsWith("[local-textgen]")))

    // streaming surge set must be a subset of batch surges (final open window
    // never closes in the bounded stream — everything else matches)
    // batch emits TIMESTAMP_NTZ, streaming TIMESTAMP — compare as strings (UTC session)
    val batchZones = graft.pipelines.Labs.lab3Fleet(spark, sfDir)
      .select(col("zone"), col("window_start").cast("string").as("w")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val streamZones = streamed.select(col("zone"), col("window_start").cast("string").as("w")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(streamZones.nonEmpty && streamZones.subsetOf(batchZones),
      s"streaming surges must match batch (stream=${streamZones.size}, batch=${batchZones.size})")
  }
}
