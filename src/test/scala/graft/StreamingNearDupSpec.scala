package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingNearDup

/** Continuous ingestion dedup: within-batch, against-the-store, idempotent
  * re-delivery, and the documented greedy-online semantics.
  */
class StreamingNearDupSpec extends SparkSpec {

  // near-identical long docs (one token changed), distinct doc (no overlap)
  private val base = "the quick brown fox jumps over the lazy dog again and again " * 5
  private val nearDup = base.replace("lazy", "sleepy")
  private val other = "completely different content about spark streaming state stores " * 5

  private def dirs() = {
    val t = java.nio.file.Files.createTempDirectory("neardup").toString
    (s"$t/store", s"$t/sink", s"$t/ckpt")
  }

  test("stream dedups within a batch and against previously kept docs") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val (store, sink, ckpt) = dirs()
    val mem = MemoryStream[(Long, String)]
    val q = StreamingNearDup.start(mem.toDF().toDF("doc_id", "text"),
      "text", "doc_id", store, sink, ckpt)
    // batch 0: 1 and its in-batch near-dup 2, plus distinct 3
    mem.addData((1L, base), (2L, nearDup), (3L, other))
    q.processAllAvailable(); q.stop()
    // AvailableNow stops when drained; restart for the next feed
    mem.addData((4L, base), (5L, "fresh unrelated corpus material discussing catalyst optimizer rules " * 5))
    val q2 = StreamingNearDup.start(mem.toDF().toDF("doc_id", "text"),
      "text", "doc_id", store, sink, ckpt)
    q2.processAllAvailable(); q2.stop()

    val kept = StreamingNearDup.keptDocs(spark, store, sink)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(1L) && !kept.contains(2L), "in-batch near-dup loses to min id")
    assert(kept.contains(3L), "distinct doc survives")
    assert(!kept.contains(4L), "cross-batch near-dup of a KEPT doc is dropped")
    assert(kept.contains(5L), "genuinely fresh doc survives")
  }

  test("applyBatch is idempotent on batchId (at-least-once re-delivery)") {
    import spark.implicits._
    val (store, sink, _) = dirs()
    val b0 = Seq((1L, base), (2L, other)).toDF("doc_id", "text")
    StreamingNearDup.applyBatch(spark, b0, "text", "doc_id", store, sink, 0L)
    val after1 = StreamingNearDup.keptDocs(spark, store, sink).count()
    StreamingNearDup.applyBatch(spark, b0, "text", "doc_id", store, sink, 0L) // re-delivered
    assert(StreamingNearDup.keptDocs(spark, store, sink).count() == after1)
    // a fresh batch with a near-dup of doc 1 and a new doc
    val b1 = Seq((10L, nearDup), (11L, "an entirely new and unrelated document body " * 5))
      .toDF("doc_id", "text")
    StreamingNearDup.applyBatch(spark, b1, "text", "doc_id", store, sink, 1L)
    val kept = StreamingNearDup.keptDocs(spark, store, sink)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 11L))
    // re-deliver batch 1 too: nothing changes
    StreamingNearDup.applyBatch(spark, b1, "text", "doc_id", store, sink, 1L)
    assert(StreamingNearDup.keptDocs(spark, store, sink)
      .select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 2L, 11L))
  }

  test("greedy online semantics: transitive chains keep the endpoints (documented contract)") {
    import spark.implicits._
    val (store, sink, _) = dirs()
    // constructed chain: b is half-a + half-c, so sim(a,b) ~ sim(b,c) ~ 0.45
    // while a and c share NOTHING. At threshold 0.4 batch CC chains all three
    // into one cluster; the stream keeps both endpoints because the bridge b
    // was dropped before c arrived. Single-row bands (numBands = numHashes)
    // make LSH candidate recall deterministic-in-practice at sim 0.45.
    val aToks = (1 to 40).map(i => s"alpha$i")
    val cToks = (1 to 40).map(i => s"omega$i")
    val a = aToks.mkString(" ")
    val c = cToks.mkString(" ")
    val b = (aToks.take(35) ++ cToks.take(35)).mkString(" ")
    val cfg = StreamingNearDup.Config(numHashes = 16, numBands = 16, threshold = 0.4)
    StreamingNearDup.applyBatch(spark, Seq((1L, a)).toDF("doc_id", "text"),
      "text", "doc_id", store, sink, 0L, cfg)
    StreamingNearDup.applyBatch(spark, Seq((2L, b)).toDF("doc_id", "text"),
      "text", "doc_id", store, sink, 1L, cfg)
    StreamingNearDup.applyBatch(spark, Seq((3L, c)).toDF("doc_id", "text"),
      "text", "doc_id", store, sink, 2L, cfg)
    val kept = StreamingNearDup.keptDocs(spark, store, sink)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(1L) && !kept.contains(2L),
      "the bridge doc verifies against kept a and is dropped")
    assert(kept.contains(3L),
      "c shares nothing with any KEPT doc — the dropped bridge must not chain it away")
    val batchAll = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val batchPairs = graft.llmops.Dedup.minHashLsh(batchAll, "text", "doc_id",
      shingleSize = 3, numHashes = 16, numBands = 16, threshold = 0.4)
    val batchKept = graft.llmops.Dedup.resolveKeepers(
        batchAll.select(col("doc_id")), "doc_id", batchPairs)
      .filter(col("keep")).collect().map(_.getLong(0)).toSet
    assert(batchKept == Set(1L), "batch CC merges the chain and keeps only the min id")
  }

  test("first batch on an empty store keeps everything distinct") {
    import spark.implicits._
    val (store, sink, _) = dirs()
    val b = Seq((1L, base), (2L, other)).toDF("doc_id", "text")
    StreamingNearDup.applyBatch(spark, b, "text", "doc_id", store, sink, 0L)
    assert(StreamingNearDup.keptDocs(spark, store, sink).count() == 2)
  }

  test("compactStore: kept-set identical to the uncompacted store; file count collapses to one pair") {
    import spark.implicits._
    // two stores fed identically; A is compacted mid-stream (and again at the
    // end), B never — every subsequent dedup decision must match
    val (storeA, sinkA, _) = dirs()
    val (storeB, sinkB, _) = dirs()
    def feed(store: String, sink: String, id: Long, rows: Seq[(Long, String)]): Unit =
      StreamingNearDup.applyBatch(spark, rows.toDF("doc_id", "text"),
        "text", "doc_id", store, sink, id)
    val fresh = "fresh unrelated corpus material discussing catalyst optimizer rules " * 5
    val b0 = Seq((1L, base), (2L, other))
    val b1 = Seq((3L, fresh))
    val b2 = Seq((4L, base), (5L, nearDup),
      (6L, "entirely novel text about shuffle partition tuning strategies " * 5))
    for ((s, k) <- Seq((storeA, sinkA), (storeB, sinkB))) { feed(s, k, 0L, b0); feed(s, k, 1L, b1) }
    StreamingNearDup.compactStore(spark, storeA)
    for ((s, k) <- Seq((storeA, sinkA), (storeB, sinkB))) feed(s, k, 2L, b2)
    StreamingNearDup.compactStore(spark, storeA)
    def kept(store: String, sink: String) = StreamingNearDup.keptDocs(spark, store, sink)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val (ka, kb) = (kept(storeA, sinkA), kept(storeB, sinkB))
    assert(ka == kb, s"compacted store changed dedup decisions: $ka vs $kb")
    assert(!ka.contains(4L) && !ka.contains(5L) && ka.contains(6L),
      "cross-batch near-dups must still drop through the compacted signatures")
    // the store is one compacted pair + pointers — no per-batch dirs left
    val names = new java.io.File(storeA).listFiles().map(_.getName).toSet
    assert(names == Set("csigs_2", "csh_2", "_APPLIED", "_COMPACTED"),
      s"store must collapse to one pair: $names")
  }

  test("retention horizon: evicted signatures stop deduping; the duplicate is re-admitted") {
    import spark.implicits._
    val (store, sink, _) = dirs()
    def feed(id: Long, rows: Seq[(Long, String)]): Unit =
      StreamingNearDup.applyBatch(spark, rows.toDF("doc_id", "text"),
        "text", "doc_id", store, sink, id)
    feed(0L, Seq((1L, base)))
    feed(1L, Seq((2L, other)))
    // keep only the newest batch's signatures: batch 0 (doc 1) evicts
    StreamingNearDup.compactStore(spark, store, retainBatches = Some(1L))
    feed(2L, Seq((3L, base), (4L, other))) // 4 = exact dup of the in-horizon doc 2
    val kept = StreamingNearDup.keptDocs(spark, store, sink)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(3L),
      "doc 1's signatures are past the horizon — its duplicate must be ADMITTED again")
    assert(!kept.contains(4L),
      "doc 2 is inside the horizon — its near-dup must still drop")

    // control: the same feed without retention keeps deduping against doc 1
    val (store2, sink2, _) = dirs()
    def feed2(id: Long, rows: Seq[(Long, String)]): Unit =
      StreamingNearDup.applyBatch(spark, rows.toDF("doc_id", "text"),
        "text", "doc_id", store2, sink2, id)
    feed2(0L, Seq((1L, base)))
    feed2(1L, Seq((2L, other)))
    StreamingNearDup.compactStore(spark, store2)
    feed2(2L, Seq((3L, base)))
    val kept2 = StreamingNearDup.keptDocs(spark, store2, sink2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!kept2.contains(3L), "without retention the compacted store still drops the duplicate")
  }
}
