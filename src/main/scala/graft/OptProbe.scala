package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Optimization-round measurement harness (guide §1): times the component
  * stages of the expensive lab pipelines in isolation, forcing each with the
  * noop sink so the computation is timed, not the sink. Each stage is
  * labelled via setJobDescription. Ad hoc — numbers land in
  * OPTIMIZATION_r16.md, not in any gate.
  *
  * Run: sbt "runMain graft.OptProbe /root/testdata/sf0.1"
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Bench.session(cpus)
    import graft.core.Tables
    import graft.ml.MlPredict
    import graft.vector.{IvfIndex, VectorSearchAgg, VectorStore}

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // min-of-3 with one untimed warm-up, mirroring Bench's estimator: the
    // steady-state stage cost, not first-run codegen
    def time[A](label: String)(f: => A): A = {
      spark.sparkContext.setJobDescription(label)
      var r: A = f // warm-up
      var best = Double.MaxValue
      var i = 0
      while (i < 3) {
        val t0 = System.nanoTime()
        r = f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        i += 1
      }
      println(f"[probe] $label: $best%.3f s (min of 3, warm)")
      spark.sparkContext.setJobDescription(null)
      r
    }

    // warm-up: parquet footers + codegen for the shared scans
    noop(Tables(spark, dir, "events").select("ts", "event_type"))
    noop(Tables(spark, dir, "documents"))

    // --- lab3 stages -----------------------------------------------------
    val cfg = graft.anomaly.AnomalyDetector.Config(
      minTrainingSize = 8, maxTrainingSize = 50, confidencePercentage = 99.9)
    val windowed = graft.operators.Tumble(
      Tables(spark, dir, "events"), "ts", "5 minutes", col("event_type"))(
      "request_count" -> count(lit(1)),
      "total_value" -> graft.functions.Scalars.sumMoney(col("value")))
    time("lab3: tumble")(noop(windowed))
    val detected = graft.anomaly.AnomalyDetector.detectBatch(windowed,
      col("request_count"), Seq(col("event_type")), Seq(col("window_start")), cfg)
    time("lab3: tumble+anomaly")(noop(detected))
    val surges = detected
      .filter(col("is_anomaly") === true && col("request_count") > col("upper_bound"))
    time("lab3: tumble+anomaly+surges")(noop(surges))

    // hand-built twin of detectBatchWindow with the SIX primitive window
    // aggregates materialized once as columns, scalar arithmetic after — the
    // candidate rewrite; measures what de-duplicating window expressions buys
    {
      import org.apache.spark.sql.expressions.{Window => W}
      val cfg2 = cfg
      val v = col("request_count").cast("double")
      val cumA = W.partitionBy(col("event_type")).orderBy(col("window_start"))
        .rowsBetween(W.unboundedPreceding, -1)
      val cumB = W.partitionBy(col("event_type")).orderBy(col("window_start"))
        .rowsBetween(W.unboundedPreceding, -(cfg2.maxTrainingSize + 1L))
      val mat = windowed
        .withColumn("__s1a", sum(v.cast("string").cast("decimal(27,6)")).over(cumA))
        .withColumn("__s1b", sum(v.cast("string").cast("decimal(27,6)")).over(cumB))
        .withColumn("__s2a", sum((v * v).cast("string").cast("decimal(27,8)")).over(cumA))
        .withColumn("__s2b", sum((v * v).cast("string").cast("decimal(27,8)")).over(cumB))
        .withColumn("__na", count(v).over(cumA))
        .withColumn("__nb", count(v).over(cumB))
      val s1 = when(col("__s1b").isNull, col("__s1a")).otherwise(col("__s1a") - col("__s1b"))
        .cast("string").cast("double")
      val s2 = when(col("__s2b").isNull, col("__s2a")).otherwise(col("__s2a") - col("__s2b"))
        .cast("string").cast("double")
      val n = (col("__na") - col("__nb")).cast("double")
      val forecast = s1 / n
      val sd = sqrt(greatest((s2 - s1 * s1 / n) / (n - lit(1.0)), lit(0.0)))
      val warm = n >= cfg2.minTrainingSize
      val upper = forecast + lit(cfg2.z) * sd
      val lower = forecast - lit(cfg2.z) * sd
      val det2 = mat
        .withColumn("forecast_value", when(warm, forecast))
        .withColumn("upper_bound", when(warm, upper))
        .withColumn("lower_bound", when(warm, lower))
        .withColumn("is_anomaly", when(warm, v > upper || v < lower).otherwise(lit(false)))
        .drop("__s1a", "__s1b", "__s2a", "__s2b", "__na", "__nb")
      time("lab3: tumble+anomaly SIX-EXPR twin")(noop(det2))
      time("lab3: tumble+anomaly+surges SIX-EXPR twin")(noop(
        det2.filter(col("is_anomaly") === true && col("request_count") > col("upper_bound"))))
      time("lab3: detected.count (column-pruned)")(detected.count())
    }

    val docs = Tables(spark, dir, "documents")
    time("docs: count")(println("  rows=" + docs.count()))
    time("docs: distinct texts")(println("  distinct=" + docs.select("text").distinct().count()))
    val corpus = MlPredict.embedDistinct(docs, "local-embed-64", "text")
      .select(col("doc_id"), col("text").as("chunk"), col("embedding"))
    time("corpus: embedDistinct (1st pass)")(noop(corpus))
    time("corpus: embedDistinct (2nd pass — lineage re-run)")(noop(corpus))
    time("corpus: plain embed (no distinct)")(
      noop(MlPredict.embed(docs, "local-embed-64", "text")))

    val store = time("q34: bruteForce collect (embed re-run + collect)")(
      VectorStore.bruteForce(corpus, "doc_id", "chunk", "embedding"))
    println("  store size=" + store.getClass.getSimpleName)

    // sub-steps of IvfIndex.build, replicated for attribution
    {
      val pinnedCorpus = corpus.localCheckpoint()
      val vecs = time("ivf: vecs checkpoint (embed pass)")(
        pinnedCorpus.select(col("doc_id"), col("embedding")).localCheckpoint())
      val n = time("ivf: count")(vecs.count())
      val lists = math.max(16, math.min(4096, (4.0 * math.sqrt(n.toDouble)).toInt))
      println(s"  lists=$lists")
      def initChain = vecs.select(col("embedding").as("centroid"))
        .withColumn("__h", xxhash64(col("centroid").cast("string")))
        .orderBy("__h").limit(lists)
        .withColumn("list_id", (row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy("__h")) - 1).cast("long"))
        .select("list_id", "centroid")
      val c0 = time("ivf: init collect")(initChain.collect())
      println(s"  c0=${c0.length}")
      val c0df = initChain
      def lloydStep(cents: DataFrame): DataFrame = {
        val assigned = IvfIndex.assign(vecs, cents, "embedding")
        assigned.select(col("list_id"), posexplode(col("embedding")))
          .groupBy("list_id", "pos")
          .agg((sum(col("col").cast("decimal(38,12)")).cast("double") /
            count(col("col"))).as("m"))
          .groupBy("list_id")
          .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
            s => s.getField("m").cast("float")).as("centroid"))
      }
      val c1 = time("ivf: lloyd iter1 (assign collect + agg collect)")(lloydStep(c0df).collect())
      println(s"  c1=${c1.length}")
      val c1df = lloydStep(c0df)
      val c2ckpt = time("ivf: lloyd iter2 + final checkpoint")(lloydStep(c1df).localCheckpoint())
      val asg = IvfIndex.assign(vecs, c2ckpt, "embedding")
        .select(col("doc_id").as("nid"), col("embedding").as("nvec"), col("list_id"))
      time("ivf: final assign noop")(noop(asg))
    }

    val ivf = time("q161: IVF build (iterations=2)")(
      VectorSearchAgg.buildIndex(corpus))
    time("q161: IVF assigned count")(println("  assigned=" + ivf.assigned.count()))

    // search cost in isolation: pinned corpus, reuse surge queries
    val queried = surges.select(
      concat(lit("q "), col("event_type")).as("query_text"))
    val embeddedQ = MlPredict.embed(queried, "local-embed-64", "query_text")
    time("q161: probe+score+assemble (index prebuilt)")(
      noop(VectorSearchAgg.annPrepared(embeddedQ, ivf, corpus, "embedding", 3, 500)))
    spark.stop()
  }
}
