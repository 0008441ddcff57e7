package graft

import org.apache.spark.sql.functions._

import graft.operators.Merge

class MergeSpec extends SparkSpec {

  test("applyChangelog: last change per key wins — update, delete, insert, pass-through") {
    import spark.implicits._
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("k", "name", "amt")
    val changes = Seq(
      (2L, "b2", 21.0, "U", 1L),  // plain update
      (3L, "c", 30.0, "D", 1L),   // delete
      (4L, "d2", 41.0, "U", 1L),  // update then delete: seq 2 wins
      (4L, "d", 40.0, "D", 2L),
      (5L, "e", 50.0, "I", 1L),   // insert
      (6L, "f0", 0.0, "D", 1L),   // delete then REINSERT: seq 2 wins
      (6L, "f", 60.0, "I", 2L))
      .toDF("k", "name", "amt", "op", "seq")
    val out = Merge.applyChangelog(base, changes, Seq("k"))
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, "a", 10.0), (2L, "b2", 21.0), (5L, "e", 50.0), (6L, "f", 60.0)))
  }

  test("applyChangelog converges when replaying a changelog over its own result (idempotent)") {
    import spark.implicits._
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "name", "amt")
    val changes = Seq((1L, "a2", 11.0, "U", 1L), (3L, "c", 30.0, "I", 1L))
      .toDF("k", "name", "amt", "op", "seq")
    val once = Merge.applyChangelog(base, changes, Seq("k"))
    val twice = Merge.applyChangelog(once, changes, Seq("k"))
    assert(once.orderBy("k").collect().toSeq == twice.orderBy("k").collect().toSeq)
  }

  test("applyChangelog over an empty base equals the compacted-topic snapshot (tombstone = D)") {
    import spark.implicits._
    // the same changelog, in both vocabularies: a compacted Kafka topic's
    // null-value tombstone IS the CDC 'D'; last-write-per-key IS highest-seq
    val records = Seq(
      (1L, Option("a1"), 10L), (1L, Option("a2"), 20L),        // update chain
      (2L, Option("b"), 11L), (2L, Option.empty[String], 21L), // tombstoned
      (3L, Option.empty[String], 12L), (3L, Option("c"), 22L)) // resurrected
      .toDF("key", "value", "offset")
    val kafka = graft.streaming.KafkaIO.compactedSnapshot(records)
      .as[(Long, String)].collect().sortBy(_._1).toSeq

    val base = Seq.empty[(Long, String)].toDF("key", "value")
    val changes = records.select(col("key"),
      coalesce(col("value"), lit("")).as("value"),
      when(col("value").isNull, "D").otherwise("U").as("op"),
      col("offset").as("seq"))
    val merged = Merge.applyChangelog(base, changes, Seq("key"))
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(merged == kafka && kafka == Seq((1L, "a2"), (3L, "c")))
  }

  test("a null or unknown op fails loudly instead of becoming a silent delete") {
    import spark.implicits._
    val base = Seq((1L, "a")).toDF("k", "v")
    for (badOp <- Seq(null.asInstanceOf[String], "X", "d")) {
      val ch = Seq((1L, "a2", badOp, 1L)).toDF("k", "v", "op", "seq")
      val e = intercept[Exception](
        Merge.applyChangelog(base, ch, Seq("k")).collect())
      assert(e.getMessage.contains("must be I/U/D") ||
        Option(e.getCause).exists(_.getMessage.contains("must be I/U/D")),
        s"op=$badOp: ${e.getMessage}")
    }
  }

  test("applyChangelog rejects a changelog whose data columns diverge from base") {
    import spark.implicits._
    val base = Seq((1L, "a")).toDF("k", "name")
    val bad = Seq((1L, 9.9, "U", 1L)).toDF("k", "amt", "op", "seq")
    val e = intercept[IllegalArgumentException](
      Merge.applyChangelog(base, bad, Seq("k")))
    assert(e.getMessage.contains("base's columns"))
  }

  test("a NULL-key change fails loudly instead of duplicating the base row") {
    import spark.implicits._
    // the anti-join is null-UNSAFE: without the guard a NULL-key upsert adds
    // a second NULL-key row while the old one survives the anti-join
    val base = Seq((Some(1L), "a"), (None: Option[Long], "old")).toDF("k", "v")
    val changes = Seq((None: Option[Long], "new", "U", 1L)).toDF("k", "v", "op", "seq")
    val e = intercept[Exception] {
      graft.operators.Merge.applyChangelog(base, changes, Seq("k")).collect()
    }
    assert(e.getMessage.contains("non-null keys"))
  }
}
