package graft

import org.apache.spark.sql.functions._

import graft.sources.Manifest

class ManifestSpec extends SparkSpec {

  test("snapshot reads are stable across later appends; versions advance") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("manifest").toString + "/t"
    (1L to 1000L).toDF("id").repartition(3).write.parquet(dir)

    val v0 = Manifest.snapshot(spark, dir)
    assert(v0 == 0L && Manifest.latestVersion(spark, dir).contains(0L))
    val before = Manifest.readAt(spark, dir, v0).as[Long].collect().sorted.toSeq

    (1001L to 1500L).toDF("id").repartition(2).write.mode("append").parquet(dir)
    val v1 = Manifest.snapshot(spark, dir)
    assert(v1 == 1L)

    // v0 is frozen: the append is invisible through the old manifest
    assert(Manifest.readAt(spark, dir, v0).as[Long].collect().sorted.toSeq == before)
    assert(Manifest.readAt(spark, dir, v0).inputFiles.length == 3)
    // v1 sees everything; the live directory read agrees with it
    assert(Manifest.readAt(spark, dir, v1).count() == 1500L)
    assert(spark.read.parquet(dir).count() == 1500L)
    // manifests never leak into data reads (the _manifests prefix is hidden)
    assert(!spark.read.parquet(dir).inputFiles.exists(_.contains("_manifests")))
  }

  test("appendCommit: exactly-once over re-delivery; orphans from crashed attempts stay invisible") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("manifest2").toString + "/t"
    val b0 = (1L to 100L).toDF("id")
    val b1 = (101L to 150L).toDF("id")

    assert(Manifest.appendCommit(b0, dir, batchId = 0L))
    assert(Manifest.appendCommit(b1, dir, batchId = 1L))
    assert(Manifest.readLatest(spark, dir).count() == 150L)

    // at-least-once re-delivery of batch 1: a no-op, no duplicates
    assert(!Manifest.appendCommit(b1, dir, batchId = 1L))
    assert(Manifest.readLatest(spark, dir).count() == 150L)

    // a crashed attempt: data files landed, manifest never published — the
    // committed view must not see them (a bare directory read does)
    (9000L to 9099L).toDF("id").write.mode("append").parquet(dir)
    assert(spark.read.parquet(dir).count() == 250L)
    assert(Manifest.readLatest(spark, dir).count() == 150L)

    // the NEXT committed batch still excludes the orphans (skipping to id 5
    // — batch ids need only be monotone, not dense)
    assert(Manifest.appendCommit((151L to 160L).toDF("id"), dir, batchId = 5L))
    val ids = Manifest.readLatest(spark, dir).as[Long].collect().toSet
    assert(ids == (1L to 160L).toSet, s"orphans leaked: ${ids.filter(_ >= 9000L).take(3)}")

    // an UNCOMMITTED batch id below the newest manifest fails loudly (a
    // committed one is the idempotent no-op above)
    val e = intercept[IllegalArgumentException](Manifest.appendCommit(b0, dir, batchId = 3L))
    assert(e.getMessage.contains("monotone"))
  }

  test("snapshotWithStats: time-travel AND zone-skip through one manifest") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("manifest4").toString + "/t"
    val part1 = (1 to 4000).map(i => (i.toLong, (i % 500).toLong)).toDF("id", "x")
    part1.repartitionByRange(8, col("x")).sortWithinPartitions("x").write.parquet(dir)
    val v0 = Manifest.snapshotWithStats(spark, dir, Seq("x"))
    // later appends: in-range values the v0 read must NOT see
    (4001 to 5000).map(i => (i.toLong, 100L)).toDF("id", "x")
      .write.mode("append").parquet(dir)

    val got = Manifest.prunedReadAt(spark, dir, v0, Map("x" -> (90L, 130L)))
    assert(got.inputFiles.length < 8, "the range must skip files")
    val want = part1.filter(col("x").between(90, 130)).select("id")
      .as[Long].collect().sorted.toSeq
    assert(got.select("id").as[Long].collect().sorted.toSeq == want,
      "pruned time-travel read must equal the frozen slice, appends invisible")

    val e = intercept[IllegalArgumentException](
      Manifest.prunedReadAt(spark, dir, v0, Map("id" -> (1L, 2L), "x" -> (1L, 2L), "nope" -> (0, 1))))
    assert(e.getMessage.contains("no stats"))
  }

  test("appendCommit drives a real foreachBatch stream with exactly-once table commits") {
    implicit val sq = spark.sqlContext
    implicit val enc = org.apache.spark.sql.Encoders.product[Tuple1[Long]]
    val dir = java.nio.file.Files.createTempDirectory("manifest3").toString + "/t"
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Tuple1[Long]]
    val q = mem.toDF().toDF("id").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        Manifest.appendCommit(batch, dir, batchId); ()
      }.start()
    try {
      mem.addData(Tuple1(1L), Tuple1(2L)); q.processAllAvailable()
      mem.addData(Tuple1(3L)); q.processAllAvailable()
    } finally q.stop()
    import spark.implicits._
    assert(Manifest.readLatest(spark, dir).as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }
}
