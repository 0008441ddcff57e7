package graft

import org.apache.spark.sql.functions._

class VectorExprsSpec extends SparkSpec {
  import graft.functions.Vectors

  test("l2_normalize: unit norm, zero-vector passthrough, HOF-equivalent values") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(3.0f, 4.0f)),
      (2L, Array(0.0f, 0.0f)),
      (3L, Array(-1.0f, 1.0f, 2.0f))).toDF("id", "v")
    val out = df.select(col("id"), Vectors.l2Normalize(col("v")).as("n")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(out(1L) == Seq(0.6f, 0.8f))
    assert(out(2L) == Seq(0.0f, 0.0f), "zero vector passes through, never NaNs")
    val n3 = out(3L).map(_.toDouble)
    assert(math.abs(n3.map(x => x * x).sum - 1.0) < 1e-6, "unit norm")
    // the safe two-projection HOF formulation agrees bit-for-bit
    val hof = df.filter(col("id") =!= 2)
      .withColumn("__nrm", sqrt(aggregate(transform(col("v"), x => x.cast("double") * x.cast("double")),
        lit(0.0), _ + _)))
      .select(col("id"), transform(col("v"), x => (x.cast("double") / col("__nrm")).cast("float")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(hof(1L) == out(1L) && hof(3L) == out(3L))
    // null in, null out
    val withNull = Seq((4L, Option.empty[Array[Float]])).toDF("id", "v")
      .select(Vectors.l2Normalize(col("v"))).head()
    assert(withNull.isNullAt(0))
  }

  test("l2_normalize runs inside whole-stage codegen") {
    // a real scan (not a pre-evaluated LocalTableScan) so the projection plans
    val df = graft.core.Tables(spark, sfDir, "embeddings")
      .select(Vectors.l2Normalize(col("embedding")).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    // the "*(n)" prefix marks a WholeStageCodegen span containing the project
    assert("\\*\\(\\d+\\) Project \\[l2_normalize".r.findFirstIn(plan).isDefined,
      s"expected l2_normalize inside a codegen span:\n$plan")
    assert(df.count() > 0)
  }

  test("mean_pool: averages, skips null tokens, empty pools to null, ragged fails") {
    import spark.implicits._
    val pooled = Seq(Seq(Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("vs")
      .select(Vectors.meanPool(col("vs"))).head().getSeq[Float](0)
    assert(pooled == Seq(2.0f, 3.0f))
    val withNullTok = Seq((Seq(Option(Array(2.0f, 6.0f)), Option.empty[Array[Float]])))
      .toDF("vs").select(Vectors.meanPool(col("vs"))).head().getSeq[Float](0)
    assert(withNullTok == Seq(2.0f, 6.0f), "null tokens carry no vector")
    val empty = Seq(Seq.empty[Array[Float]]).toDF("vs")
      .select(Vectors.meanPool(col("vs"))).head()
    assert(empty.isNullAt(0), "nothing to pool -> null")
    val ragged = intercept[Exception](
      Seq(Seq(Array(1.0f), Array(1.0f, 2.0f))).toDF("vs")
        .select(Vectors.meanPool(col("vs"))).collect())
    assert(ragged.getMessage.contains("ragged") ||
      Option(ragged.getCause).exists(_.getMessage.contains("ragged")))
  }

  test("graft_l2_normalize and graft_mean_pool resolve from SQL") {
    graft.plans.GraftExtensions.registerAll(spark)
    import spark.implicits._
    Seq((1L, Array(3.0f, 4.0f))).toDF("id", "v").createOrReplaceTempView("vx")
    val n = spark.sql("SELECT graft_l2_normalize(v) AS n FROM vx").head().getSeq[Float](0)
    assert(n == Seq(0.6f, 0.8f))
    val p = spark.sql("SELECT graft_mean_pool(array(v, v)) AS p FROM vx").head().getSeq[Float](0)
    assert(p == Seq(3.0f, 4.0f))
  }
}

class CompactionSpec extends SparkSpec {
  import graft.sources.Compaction

  test("compaction collapses small files, preserves content exactly, clusters on sort keys") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val orders = graft.core.Tables(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    // simulate a streaming sink's small-file mess: 64 splinter files
    orders.repartition(64).write.parquet(s"$tmp/in")
    val report = Compaction.compact(spark, s"$tmp/in", s"$tmp/out",
      targetFileBytes = 4L * 1024 * 1024, sortCols = Seq("o_orderkey"))
    assert(report.filesBefore == 64L)
    assert(report.filesAfter < 8L, s"expected few large files, got ${report.filesAfter}")
    assert(report.rows == orders.count())
    // content identical — the atomic-swap verify step
    val cols = Seq(col("o_orderkey").cast("string"), col("o_custkey").cast("string"),
      col("o_totalprice").cast("string"))
    val before = graft.operators.Reconcile.checksum(spark.read.parquet(s"$tmp/in"), lit("all"), cols).head()
    val after = graft.operators.Reconcile.checksum(spark.read.parquet(s"$tmp/out"), lit("all"), cols).head()
    assert(before.getLong(2) == after.getLong(2) && before.getLong(1) == after.getLong(1))
    // sorted output: each file covers a disjoint key range -> a point lookup
    // reads one file's row groups (footer stats prune)
    val one = spark.read.parquet(s"$tmp/out").filter(col("o_orderkey") === 42)
    assert(one.count() <= 1)
  }
}
