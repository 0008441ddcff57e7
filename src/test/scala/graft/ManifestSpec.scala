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
}
