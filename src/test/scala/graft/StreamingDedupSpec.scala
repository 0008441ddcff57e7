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

  test("lineDedupStream drops repeated chunks across docs and micro-batches, arrival-first") {
    implicit val sq = spark.sqlContext
    implicit val enc = Encoders.product[(Long, Timestamp, String)]
    val boiler = (1 to 20).map(i => s"b$i").mkString(" ")
    val u1 = (1 to 20).map(i => s"u$i").mkString(" ")
    val u2 = (1 to 20).map(i => s"v$i").mkString(" ")
    val mem = MemoryStream[(Long, Timestamp, String)]
    val df = StreamingOps.lineDedupStream(
      mem.toDF().toDF("doc_id", "ts", "text"), "text", "doc_id", "ts", "10 minutes")
    val q = df.writeStream.format("memory").queryName("linededup_sink")
      .outputMode("append").start()
    try {
      mem.addData((1L, ts("2024-03-01 00:00:00"), s"$boiler $u1"))
      q.processAllAvailable()
      // later batch: boiler chunk repeats (dropped), u2 is fresh (kept)
      mem.addData((2L, ts("2024-03-01 00:00:05"), s"$u2 $boiler"))
      q.processAllAvailable()
    } finally q.stop()
    val kept = spark.table("linededup_sink").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("chunk_idx"), r.getAs[String]("line"))).toSet
    assert(kept == Set((1L, 0, boiler), (1L, 1, u1), (2L, 0, u2)),
      s"arrival-first chunk dedup violated: $kept")
  }

  test("decontaminate runs on a STREAMING corpus — the broadcast path is row-local — and matches batch") {
    implicit val sq = spark.sqlContext
    implicit val enc = org.apache.spark.sql.Encoders.product[(Long, String)]
    import spark.implicits._
    import graft.llmops.Dedup
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("bench_id", "text")
    val rows = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),   // verbatim copy
      (2L, "completely unrelated content about spark plans"),
      (3L, "a quick brown fox jumps over something else"))   // partial overlap
    val mem = MemoryStream[(Long, String)]
    val out = Dedup.decontaminate(mem.toDF().toDF("doc_id", "text"), bench, "text", "doc_id")
    val q = out.writeStream.format("memory").queryName("decontam_sink")
      .outputMode("append").start()
    try {
      mem.addData(rows(0), rows(1))
      q.processAllAvailable()
      mem.addData(rows(2)) // later micro-batch probes the same broadcast set
      q.processAllAvailable()
    } finally q.stop()
    val cols = Seq("doc_id", "n_ngrams", "matched", "overlap", "contaminated")
    val got = spark.table("decontam_sink").orderBy("doc_id")
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSeq
    val want = Dedup.decontaminate(rows.toDF("doc_id", "text"), bench, "text", "doc_id")
      .orderBy("doc_id").select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSeq
    assert(got == want, s"stream output must equal the batch run:\n$got\nvs\n$want")
    val flags = got.map(r => r.head -> r.last).toMap
    assert(flags(1L) == true && flags(2L) == false,
      s"the verbatim copy must flag, the unrelated doc must not: $flags")
  }
}
