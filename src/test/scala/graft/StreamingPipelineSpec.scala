package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._

/** Counts embed() invocations (JVM-local — valid under local[*] where driver
  * and executors share the process). Used to prove the RAG corpus is embedded
  * exactly once, not once per micro-batch.
  */
object CountingEmbed {
  val calls = new AtomicInteger(0)
}

class StreamingPipelineSpec extends SparkSpec {

  test("streaming lab3 produces enriched surges consistent with the batch pipeline") {
    graft.ml.ModelCatalog.registerEmbedding(new graft.ml.EmbeddingModel {
      private val inner = graft.ml.LocalHashEmbedding("counting-embed")
      val name = "counting-embed"
      val dim = 64
      def embed(text: String): Array[Float] = { CountingEmbed.calls.incrementAndGet(); inner.embed(text) }
    })
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    CountingEmbed.calls.set(0)

    val tmp = java.nio.file.Files.createTempDirectory("lab3s").toString
    val q = graft.pipelines.Labs.lab3FleetStreaming(spark, sfDir, s"$tmp/sink", s"$tmp/ckpt",
      embedModel = "counting-embed")
    // store hoisted out of foreachBatch: the corpus embed runs at setup time,
    // before any micro-batch...
    val afterSetup = CountingEmbed.calls.get()
    assert(afterSetup >= nDocs, s"store must be built before the stream starts ($afterSetup < $nDocs)")
    try {
      q.processAllAvailable()
    } finally q.stop()

    // ...and the stream itself only embeds the (tiny) surge queries — a
    // per-batch rebuild would re-embed all nDocs documents here
    val surgeCount = spark.read.parquet(s"$tmp/sink").count()
    val duringStream = CountingEmbed.calls.get() - afterSetup
    assert(duringStream <= surgeCount,
      s"stream must not re-embed the corpus: $duringStream embeds for $surgeCount surges")

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
