package graft

import org.apache.spark.sql.functions._

/** Scale spot-run for the STREAMING lab pipelines (r7 judge directive #3):
  * drive lab3FleetStreaming and lab4FraudStreaming at a real scale factor,
  * time the drain, and assert stream ≡ batch on the rows the bounded-stream
  * contract makes comparable:
  *
  *  - lab3: the streaming surge (zone, window_start) set must be a SUBSET of
  *    the batch surge set, missing at most one final OPEN window per zone
  *    (a bounded file stream's watermark never passes the last window end —
  *    the StreamingPipelineSpec contract, enforced here at scale);
  *  - lab4: both paths judge a queueLimit-bounded queue; every claim id the
  *    two queues share must carry the IDENTICAL verdict (the judge is a
  *    deterministic function of the prompt).
  *
  * Usage: runMain graft.SpotStreamingLabs <sfDir> [ann]
  *
  * `ann` switches both labs to the reference's production search semantics
  * (numCandidates = 500 approximate vectordbs — terraform lab3
  * main.tf:110-124, lab4 main.tf:270-290). Surge/queue selection does not
  * depend on the search path, so the lab3 surge-set parity still holds;
  * lab4's verdicts DO depend on the retrieved policy context (prompt
  * content), so ann mode checks the judged CLAIM set + verdict enum rather
  * than verdict equality against the context-free batch twin.
  */
object SpotStreamingLabs {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("benchdata/sf1")
    val ann = args.drop(1).headOption.contains("ann")
    val nc = if (ann) Some(500) else None
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val tmp = java.nio.file.Files.createTempDirectory("labstream").toString
    var failed = false

    // ------------------------------------------------------------- lab3
    val t3 = System.nanoTime()
    val q3 = graft.pipelines.Labs.lab3FleetStreaming(spark, sfDir, s"$tmp/l3sink", s"$tmp/l3ckpt",
      annCandidates = nc)
    try q3.processAllAvailable() finally q3.stop()
    val sec3 = (System.nanoTime() - t3) / 1e9
    val streamed3 = spark.read.parquet(s"$tmp/l3sink")
    // batch emits TIMESTAMP_NTZ, streaming TIMESTAMP — compare as strings (UTC)
    val streamSet = streamed3.select(col("zone"), col("window_start").cast("string"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val batch3 = graft.pipelines.Labs.lab3Fleet(spark, sfDir)
      .select(col("zone"), col("window_start").cast("string"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val zones = batch3.map(_._1)
    val missing = batch3 -- streamSet
    val extra = streamSet -- batch3
    val ok3 = extra.isEmpty && missing.size <= zones.size && streamSet.nonEmpty
    if (!ok3) failed = true
    println(f"""[labstream] {"lab":"lab3FleetStreaming","sec":$sec3%.2f,"streamSurges":${streamSet.size},"batchSurges":${batch3.size},"missingFinalWindows":${missing.size},"extra":${extra.size},"ok":$ok3}""")

    // ------------------------------------------------------------- lab4
    val t4 = System.nanoTime()
    val q4 = graft.pipelines.Labs.lab4FraudStreaming(spark, sfDir, s"$tmp/l4sink", s"$tmp/l4ckpt",
      policyAnn = nc)
    try q4.processAllAvailable() finally q4.stop()
    val sec4 = (System.nanoTime() - t4) / 1e9
    val enum5 = Set("APPROVE", "APPROVE_PARTIAL", "REQUEST_DOCS", "DENY_INELIGIBLE", "DENY_FRAUD")
    val streamed4 = spark.read.parquet(s"$tmp/l4sink")
      .select(col("claim_id"), col("verdict"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val batch4 = graft.pipelines.Labs.lab4Fraud(spark, sfDir)
      .select(col("claim_id"), col("verdict"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val common = streamed4.keySet intersect batch4.keySet
    // with ANN policy context the prompts differ from the context-free batch
    // twin by design — the deterministic-verdict parity only holds exact-path
    val verdictDiffs = if (ann) 0 else common.count(id => streamed4(id) != batch4(id))
    val enumOk = streamed4.values.forall(enum5)
    val ok4 = streamed4.nonEmpty && verdictDiffs == 0 && enumOk &&
      (!ann || streamed4.keySet == batch4.keySet)
    if (!ok4) failed = true
    println(f"""[labstream] {"lab":"lab4FraudStreaming","ann":$ann,"sec":$sec4%.2f,"streamJudged":${streamed4.size},"batchJudged":${batch4.size},"commonClaims":${common.size},"verdictDiffs":$verdictDiffs,"ok":$ok4}""")

    spark.stop()
    if (failed) sys.exit(1)
  }
}
