package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.llmops.Packing
import graft.streaming.StreamingPacking

class StreamingPackingSpec extends SparkSpec {

  private def docs(from: Int, until: Int) =
    (from until until).map(i => (i.toLong, ("w " * (i % 9 + 1)).trim))

  test("streamed packing ≡ one batch run; offsets carry across batches and restarts") {
    implicit val sq = spark.sqlContext
    implicit val enc = Encoders.product[(Long, String)]
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("spack").toString
    val (store, sink, ckpt) = (s"$tmp/store", s"$tmp/sink", s"$tmp/ckpt")

    val mem = MemoryStream[(Long, String)]
    def run() = {
      val q = StreamingPacking.start(mem.toDF().toDF("doc_id", "text"),
        "text", "doc_id", store, sink, ckpt, seqLen = 16L)
      try q.processAllAvailable() finally q.stop()
    }
    // two micro-batches, then a RESTART (new query, same checkpoint+store),
    // then a third batch — arrival order matches id order by construction
    mem.addData(docs(0, 40): _*); run()
    mem.addData(docs(40, 75): _*)
    mem.addData(docs(75, 100): _*); run()

    val streamed = StreamingPacking.placements(spark, store, sink)
      .orderBy("doc_id", "seq_id").collect()
    val batch = Packing.packSequences((0 until 100).map(i =>
        (i.toLong, ("w " * (i % 9 + 1)).trim)).toDF("doc_id", "text"),
      "text", "doc_id", 16L).orderBy("doc_id", "seq_id").collect()
    assert(streamed.length == batch.length,
      s"row count: streamed=${streamed.length} batch=${batch.length}")
    streamed.zip(batch).foreach { case (s, b) =>
      assert(s == b, s"placement diverged: stream=$s batch=$b")
    }
    // sequences genuinely straddle batch boundaries (continuation, not reset)
    val seqsPerBatchBoundary = streamed.map(_.getAs[Long]("seq_id")).distinct.length
    assert(seqsPerBatchBoundary > 3, "fixture must span multiple sequences")
  }

  test("a re-delivered batch id is a no-op: placements and offsets unchanged") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("spack2").toString
    val (store, sink) = (s"$tmp/store", s"$tmp/sink")
    val b0 = docs(0, 10).toDF("doc_id", "text")
    val b1 = docs(10, 20).toDF("doc_id", "text")
    StreamingPacking.applyBatch(spark, b0, "text", "doc_id", store, sink, 0L, 16L)
    StreamingPacking.applyBatch(spark, b1, "text", "doc_id", store, sink, 1L, 16L)
    val before = StreamingPacking.placements(spark, store, sink)
      .orderBy("doc_id", "seq_id").collect()
    // at-least-once delivery replays batch 1 — and even a STALE replay of 0
    StreamingPacking.applyBatch(spark, b1, "text", "doc_id", store, sink, 1L, 16L)
    StreamingPacking.applyBatch(spark, b0, "text", "doc_id", store, sink, 0L, 16L)
    val after = StreamingPacking.placements(spark, store, sink)
      .orderBy("doc_id", "seq_id").collect()
    assert(before.sameElements(after), "replays must not move placements")
  }
}
