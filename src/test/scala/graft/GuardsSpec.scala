package graft

import org.apache.spark.sql.functions._

import graft.anomaly.AnomalyDetector
import graft.llmops.Dedup
import graft.ml.{MlPredict, ModelCatalog, TextGenModel}
import graft.vector.IvfIndex

/** Fail-fast guards added after the round-1 review (ADVICE.md): parameter
  * combinations that would silently corrupt results must throw instead.
  */
class GuardsSpec extends SparkSpec {

  test("minHashLsh rejects numHashes not divisible by numBands") {
    import spark.implicits._
    val df = Seq((1L, "some text here")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.minHashLsh(df, "text", "doc_id", numHashes = 16, numBands = 5)
    }
    assert(e.getMessage.contains("divisible"))
  }

  test("simHashPairs rejects maxHamming > 3 (quarter-band recall bound)") {
    import spark.implicits._
    val df = Seq((1L, "some text here")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.simHashPairs(df, "text", "doc_id", maxHamming = 4)
    }
    assert(e.getMessage.contains("recall"))
  }

  test("anomaly Config: enableStl=TRUE constructs (auto period); a degenerate period is rejected") {
    // auto mode (seasonalPeriod = 0): period inferred from the series cadence
    AnomalyDetector.Config(minTrainingSize = 5, maxTrainingSize = 20,
      confidencePercentage = 95.0, enableStl = true)
    val e = intercept[IllegalArgumentException] {
      AnomalyDetector.Config(5, 20, 95.0, enableStl = true, seasonalPeriod = 1)
    }
    assert(e.getMessage.contains("seasonalPeriod"))
    // FALSE (the only value the reference ever sets) still constructs
    AnomalyDetector.Config(5, 20, 95.0, enableStl = false)
  }

  test("IVF assign routes a zero-norm vector to a real list, not -1") {
    import spark.implicits._
    val centroids = Seq((0L, Array(1f, 0f)), (1L, Array(0f, 1f))).toDF("list_id", "centroid")
    val df = Seq((10L, Array(0f, 0f)), (11L, Array(0.9f, 0.1f))).toDF("vid", "emb")
    val out = IvfIndex.assign(df, centroids, "emb").select("vid", "list_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out(10L) >= 0L, "zero-norm vector must land in an existing list")
    assert(out(11L) == 0L)
  }

  test("hyperplane-LSH near-dup returns an empty pair set on an empty corpus") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val out = Dedup.embeddingNearDupLsh(empty, "embedding", "vec_id", 0.5)
    assert(out.columns.toSeq == Seq("id_a", "id_b", "cosine"))
    assert(out.count() == 0)
  }

  test("interval join buckets month-unit bounds with a conservative width") {
    import spark.implicits._
    val left = Seq((1L, java.sql.Timestamp.valueOf("2024-02-15 00:00:00")),
      (1L, java.sql.Timestamp.valueOf("2024-06-01 00:00:00"))).toDF("k", "lts")
    val right = Seq((1L, java.sql.Timestamp.valueOf("2024-01-20 00:00:00"))).toDF("k2", "rts")
    val out = graft.operators.IntervalJoin(left, right, "k", "k2", "lts", "rts", "'0' MONTH", "'2' MONTH")
    assert(out.count() == 1, "month-unit interval bounds must still join correctly")
    // and the plan keeps the composite bucketed key (no skew-trap fallback)
    assert(out.queryExecution.executedPlan.toString.contains("__ij_bucket"))
  }

  test("upsert sink recovers the full history after an interrupted swap") {
    import graft.streaming.StreamingOps
    val dir = java.nio.file.Files.createTempDirectory("upsert-crash").toString
    val path = s"$dir/sink"
    import spark.implicits._
    // batch 0 establishes the sink
    StreamingOps.upsertBatch(Seq((1L, "v1", 10L)).toDF("k", "v", "ord"), path, Seq("k"), "ord", 0L)
    // simulate a crash between rename(cur→bak) and rename(stg→cur)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(path), new org.apache.hadoop.fs.Path(s"${path}__backup")))
    // the checkpoint retry of batch 1 must restore the backup, not erase it
    StreamingOps.upsertBatch(Seq((2L, "v2", 11L)).toDF("k", "v", "ord"), path, Seq("k"), "ord", 1L)
    val rows = spark.read.parquet(path).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows == Map(1L -> "v1", 2L -> "v2"),
      s"history must survive the interrupted swap, got $rows")
  }

  test("generateBatched fails loudly when the provider returns a wrong-size batch") {
    import spark.implicits._
    ModelCatalog.registerTextGen(new TextGenModel {
      val name = "short-batch"
      def generate(p: String): String = p
      override def generateBatch(ps: Seq[String]): Seq[String] = ps.drop(1).map(generate)
    })
    val df = Seq("a", "b", "c").toDF("text").coalesce(1)
    val e = intercept[Exception] {
      MlPredict.generateBatched(df, "short-batch", "text", batchSize = 3).collect()
    }
    assert(e.getMessage != null)
  }

  test("clusters refuses to return half-propagated labels at the iteration cap") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // a diameter-4 chain with maxIterations=1 cannot converge
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("id_a", "id_b")
    val e = intercept[IllegalStateException] {
      graft.llmops.Dedup.clusters(chain, maxIterations = 1).collect()
    }
    assert(e.getMessage.contains("maxIterations"))
    // and the same graph converges fine with room to run
    val ok = graft.llmops.Dedup.clusters(chain, maxIterations = 10)
    assert(ok.filter(col("cluster_id") =!= 1L).count() == 0)
  }

  test("bloom join rejects unsupported key types and ambiguous key names") {
    import spark.implicits._
    val l = Seq((Array[Byte](1), 1L)).toDF("k", "v")
    val r = Seq((Array[Byte](1), 2L)).toDF("rk", "w")
    intercept[IllegalArgumentException] {
      graft.operators.BloomJoin(l, r, "k", "rk")
    }
    intercept[IllegalArgumentException] {
      graft.operators.BloomJoin(l.toDF("k", "v"), r.toDF("k", "w"), "k", "k")
    }
  }

  test("ml_predict SQL UDF carries runtime-registered models in its closure") {
    import spark.implicits._
    ModelCatalog.registerTextGen(new TextGenModel {
      val name = "closure-model"
      def generate(p: String): String = s"closure:$p"
    })
    // re-register → snapshot picks up the new model; the closure (not an
    // executor-local registry lookup) must resolve it
    graft.plans.GraftExtensions.registerModelUdfs(spark)
    val out = Seq("x").toDF("t").selectExpr("ml_predict('closure-model', t) AS r")
      .as[String].head()
    assert(out == "closure:x")
  }

  test("KeyImage-backed operators reject nested key columns (ambiguous string rendering)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // array("a, b") and array("a", "b") both render "[a, b]" — a crafted
    // nested key could share a noise draw / state key, so the operators that
    // image caller-supplied keys must fail fast instead (r5 advisor finding)
    val df = Seq((Seq("a, b"), 1.0), (Seq("a", "b"), 2.0)).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      graft.operators.Privacy.dpCounts(df, Seq("k"), epsilon = 1.0, seed = 7L)
    }
    assert(e.getMessage.contains("atomic"))
    val e2 = intercept[IllegalArgumentException] {
      graft.anomaly.Cusum.detectBatch(df, col("v"), Seq(col("k")), Seq(col("v")),
        graft.anomaly.Cusum.Config())
    }
    assert(e2.getMessage.contains("atomic"))
    // the documented escape hatch works: encode first
    val ok = graft.operators.Privacy.dpCounts(
      df.withColumn("k", to_json(col("k"))), Seq("k"), epsilon = 1.0, seed = 7L)
    assert(ok.count() == 2)
  }
}
