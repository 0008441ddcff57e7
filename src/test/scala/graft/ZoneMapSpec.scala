package graft

import org.apache.spark.sql.functions._

import graft.sources.{ZOrderLayout, ZoneMapIndex}

class ZoneMapSpec extends SparkSpec {

  private def withDir(f: String => Unit): Unit = {
    val d = java.nio.file.Files.createTempDirectory("zonemap").toString
    try f(d) finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
  }

  test("pruned read equals the full scan and opens strictly fewer files") {
    import spark.implicits._
    withDir { dir =>
      val rnd = new scala.util.Random(9)
      val df = (1 to 8000).map(i => (i.toLong, rnd.nextInt(1000).toLong, rnd.nextInt(24)))
        .toDF("id", "x", "y")
      ZOrderLayout.write(df, s"$dir/t", "x", "y", files = 16)
      val idx = ZoneMapIndex.build(spark, s"$dir/t", Seq("x", "y"))
      assert(idx.count() == 16 && idx.agg(sum("n_rows")).as[Long].head() == 8000)

      val ranges = Map[String, (Any, Any)]("x" -> (100L, 220L), "y" -> (3, 9))
      val kept = ZoneMapIndex.prune(idx, ranges)
      assert(kept.nonEmpty && kept.size < 16, s"no pruning: ${kept.size}/16 files")

      val got = ZoneMapIndex.prunedRead(spark, s"$dir/t", idx, ranges)
        .select("id").as[Long].collect().sorted.toSeq
      val want = df.filter(col("x").between(100, 220) && col("y").between(3, 9))
        .select("id").as[Long].collect().sorted.toSeq
      assert(got == want)
      // the scan really is limited to the surviving files
      assert(ZoneMapIndex.prunedRead(spark, s"$dir/t", idx, ranges)
        .inputFiles.length == kept.size)
    }
  }

  test("incremental build stats only unseen files and merges to the full index") {
    import spark.implicits._
    withDir { dir =>
      val part1 = (1 to 2000).map(i => (i.toLong, i.toLong % 97)).toDF("id", "x")
      part1.repartition(4).write.parquet(s"$dir/t")
      val idx1 = ZoneMapIndex.build(spark, s"$dir/t", Seq("x")).localCheckpoint()
      val part2 = (2001 to 3000).map(i => (i.toLong, 500L + i % 13)).toDF("id", "x")
      part2.repartition(2).write.mode("append").parquet(s"$dir/t")

      val merged = ZoneMapIndex.buildIncremental(spark, s"$dir/t", Seq("x"), idx1)
      val full = ZoneMapIndex.build(spark, s"$dir/t", Seq("x"))
      assert(merged.orderBy("file").collect().toSeq == full.orderBy("file").collect().toSeq)
      // the incremental pass must not open already-indexed files: the fresh
      // rows it contributed carry exactly the 2 appended files' paths
      val known = idx1.select("file").as[String].collect().toSet
      val freshRows = merged.select("file").as[String].collect().filterNot(known)
      assert(freshRows.length == 2,
        s"only the 2 appended files may be statted, got ${freshRows.length}")
      // and the new zone (x >= 500) prunes to exactly the appended files
      assert(ZoneMapIndex.prune(merged, Map("x" -> (500L, 600L))).size == 2)
    }
  }

  test("incremental build sees files in partitioned SUBDIRECTORIES (recursive listing)") {
    import spark.implicits._
    withDir { dir =>
      (1 to 400).map(i => (i.toLong, i % 4, (i % 50).toLong)).toDF("id", "p", "x")
        .write.partitionBy("p").parquet(s"$dir/t")
      val idx1 = ZoneMapIndex.build(spark, s"$dir/t", Seq("x")).localCheckpoint()
      (401 to 500).map(i => (i.toLong, 9, 999L)).toDF("id", "p", "x")
        .write.partitionBy("p").mode("append").parquet(s"$dir/t")
      val merged = ZoneMapIndex.buildIncremental(spark, s"$dir/t", Seq("x"), idx1)
      val full = ZoneMapIndex.build(spark, s"$dir/t", Seq("x"))
      assert(merged.count() == full.count() && merged.count() > idx1.count(),
        "nested appended files must enter the incremental index")
      assert(ZoneMapIndex.prune(merged, Map("x" -> (999L, 999L))).nonEmpty)
    }
  }

  test("z-ordered layout prunes on the SECOND column too; disjoint range opens zero files") {
    import spark.implicits._
    withDir { dir =>
      val rnd = new scala.util.Random(1)
      val df = (1 to 8000).map(i => (i.toLong, rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong))
        .toDF("id", "x", "y")
      ZOrderLayout.write(df, s"$dir/z", "x", "y", files = 16)
      // x-sorted layout: every file spans the full y range -> y-only queries
      // can never skip a file. The z-order layout must skip some.
      df.repartitionByRange(16, col("x")).sortWithinPartitions("x")
        .write.parquet(s"$dir/linear")
      val zIdx = ZoneMapIndex.build(spark, s"$dir/z", Seq("x", "y"))
      val lIdx = ZoneMapIndex.build(spark, s"$dir/linear", Seq("x", "y"))
      val yOnly = Map[String, (Any, Any)]("y" -> (0L, 120L))
      assert(ZoneMapIndex.prune(lIdx, yOnly).size == 16)
      assert(ZoneMapIndex.prune(zIdx, yOnly).size < 16)

      val nothing = Map[String, (Any, Any)]("x" -> (5000L, 6000L))
      assert(ZoneMapIndex.prune(zIdx, nothing).isEmpty)
      val empty = ZoneMapIndex.prunedRead(spark, s"$dir/z", zIdx, nothing)
      assert(empty.count() == 0 && empty.columns.contains("id"))
    }
  }
}
