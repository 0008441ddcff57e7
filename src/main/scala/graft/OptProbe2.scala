package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Optimization-round stage attribution for the dedup/substring headline
  * queries (q139, q54, q28, q27) — same min-of-3 noop-sink discipline as
  * [[OptProbe]]. Ad hoc measurement tooling.
  */
object OptProbe2 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Bench.session(cpus)
    import graft.core.Tables

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time[A](label: String)(f: => A): A = {
      spark.sparkContext.setJobDescription(label)
      var r: A = f
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

    val docs = Tables(spark, dir, "documents")
    noop(docs) // warm footers

    // --- q139 stages ------------------------------------------------------
    val L = 40
    val base = graft.core.Parallelism.defend(docs)
      .select(col("doc_id"), col("text").as("__text"))
      .where(col("__text").isNotNull && length(col("__text")) >= L)
    val pos = base.select(col("doc_id"), col("__text"),
      explode(sequence(lit(1L), (length(col("__text")) - lit(L - 1)).cast("long"))).as("p"))
    val gram = col("__text").substr(col("p").cast("int"), lit(L))
    val grams = pos.select(col("doc_id"), col("p"), xxhash64(gram).as("__h"))
    time("q139: grams rows")(println("  grams=" + grams.count()))
    time("q139: grams (explode+substr+xxhash64)")(noop(grams))
    val byHash = Window.partitionBy("__h")
    val byHashOrd = byHash.orderBy(col("doc_id"), col("p"))
    val red = grams
      .withColumn("__c", count(lit(1)).over(byHash))
      .withColumn("__rn", row_number().over(byHashOrd))
      .where(col("__c") > 1 && col("__rn") > 1)
      .select(col("doc_id"), col("p"))
    time("q139: + dup window (count+row_number)")(noop(red))
    val redRn = grams
      .withColumn("__rn", row_number().over(byHashOrd))
      .where(col("__rn") > 1)
      .select(col("doc_id"), col("p"))
    time("q139: + dup window (row_number ONLY twin)")(noop(redRn))
    time("q139: full spans")(noop(graft.llmops.Dedup.exactSubstringSpans(
      docs, "text", "doc_id", minLen = 40)))

    // --- q54 stages -------------------------------------------------------
    val keeperIds = graft.llmops.Dedup.exact(docs, "text", "doc_id").select(col("doc_id"))
    time("q54: exact keepers")(noop(keeperIds))
    val exactDeduped = docs.join(keeperIds, Seq("doc_id"), "leftsemi")
    time("q54: exactDeduped (no ckpt)")(noop(exactDeduped))
    val pinned = exactDeduped.localCheckpoint()
    val losers = graft.llmops.Dedup.minHashLsh(pinned, "text", "doc_id",
      threshold = 0.5, collapseIdentical = false)
      .select(col("id_b").as("doc_id")).distinct()
    time("q54: minhash losers (from pinned)")(noop(losers))
    val kept = pinned.join(losers, Seq("doc_id"), "leftanti")
    time("q54: + leftanti")(noop(kept))
    val scored = kept
      .withColumn("lang_pred", graft.functions.Text.langId(col("text")))
      .withColumn("quality", graft.functions.Text.qualityScore(col("text")))
      .filter(col("lang_pred") === lit("en") && col("quality") >= 0.3)
    time("q54: + langId+quality (Column)")(noop(scored))
    val scoredF = kept
      .withColumn("__lq", graft.functions.Text.langQualityFused(col("text")))
      .withColumn("lang_pred", col("__lq").getField("lang_pred"))
      .withColumn("quality", col("__lq").getField("quality"))
      .drop("__lq")
      .filter(col("lang_pred") === lit("en") && col("quality") >= 0.3)
    time("q54: + langId+quality (fused)")(noop(scoredF))
    time("q54: full curate")(noop(graft.llmops.Curation.curate(
      docs, "text", "doc_id", lang = "en", minQuality = 0.3, jaccardThreshold = 0.5)))

    // --- q28 --------------------------------------------------------------
    time("q28: minHashLsh direct (collapse probe on)")(noop(
      graft.llmops.Dedup.minHashLsh(docs, "text", "doc_id", threshold = 0.5)))

    // --- q27 stages (r17): where does ngramJaccardPairs spend? ------------
    val shUdf = udf { text: String =>
      if (text == null) null else graft.llmops.Dedup.shingleHashSet(text, 3)
    }.asNondeterministic()
    val sh27 = graft.core.Parallelism.defend(docs)
      .select(col("doc_id"), shUdf(col("text")).as("sh"))
      .withColumn("n_sh", size(col("sh")))
    time("q27: tokenize+hash UDF pass")(noop(sh27))
    val inv27 = sh27.select(col("doc_id"), col("n_sh"), explode(col("sh")).as("shingle"))
      .select(col("shingle"), struct(col("doc_id"), col("n_sh")).as("__p"))
    time("q27: + explode (pre-exchange rows)")(noop(inv27))
    val post27 = inv27.groupBy("shingle").agg(collect_list(col("__p")).as("__ps"))
      .filter(size(col("__ps")) >= 2)
    time("q27: + postings shuffle (collect_list + df>=2)")(noop(post27))
    time("q27: full ngramJaccardPairs")(noop(
      graft.llmops.Dedup.ngramJaccardPairs(docs, "text", "doc_id", threshold = 0.8)))
    spark.stop()
  }
}
