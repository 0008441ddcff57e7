package graft

import org.apache.spark.sql.functions._

import graft.pipelines.Labs

/** Prompt-parity regression guards, one per lab whose streaming twin builds a
  * judge/generate prompt (r8 verdict directive #6 — the lab4 streaming prompt
  * silently omitted the claim narrative and 8/10 deterministic verdicts
  * diverged; that is a bug CLASS). The builders are centralized in
  * [[Labs.Prompts]] so twins cannot drift by construction; these specs guard
  * the pipelines END-TO-END: every model in the labs is a deterministic
  * function of the prompt, so output byte-equality on the shared key set is a
  * prompt-equality witness, and the broken-fixture test proves the witness
  * actually trips on a one-byte drift. Lab2's streaming twin is embed-only
  * (no prompt — its embed parity is Lab2StreamingSpec's).
  *
  * Centralizing surfaced two live instances of the class, both fixed with
  * the builders: lab1's streaming prompt omitted the nation, lab3's omitted
  * the time-of-day bucket AND the retrieved context.
  */
class LabPromptParitySpec extends SparkSpec {

  private def drain(q: org.apache.spark.sql.streaming.StreamingQuery): Unit =
    try q.processAllAvailable() finally q.stop()

  test("lab1: streaming verdicts byte-equal batch on the shared order set") {
    val tmp = java.nio.file.Files.createTempDirectory("l1pp").toString
    drain(Labs.lab1PriceMatchStreaming(spark, sfDir, s"$tmp/sink", s"$tmp/ckpt"))
    val streamed = spark.read.parquet(s"$tmp/sink").select("order_id", "verdict")
    val batch = Labs.lab1PriceMatch(spark, sfDir).select("order_id", "verdict")
    val joined = streamed.as("s").join(batch.as("b"), Seq("order_id"))
    val common = joined.count()
    val diffs = joined.filter(col("s.verdict") =!= col("b.verdict")).count()
    assert(common > 0, "twins must share orders for the guard to bite")
    assert(diffs == 0, s"$diffs/$common shared orders diverged — the streaming prompt drifted")
  }

  test("lab3: streaming reasons byte-equal batch on the shared surge set") {
    val tmp = java.nio.file.Files.createTempDirectory("l3pp").toString
    drain(Labs.lab3FleetStreaming(spark, sfDir, s"$tmp/sink", s"$tmp/ckpt"))
    // batch emits TIMESTAMP_NTZ, streaming TIMESTAMP — join on the string form
    val streamed = spark.read.parquet(s"$tmp/sink")
      .select(col("zone"), col("window_start").cast("string").as("w"), col("reason"))
    val batch = Labs.lab3Fleet(spark, sfDir)
      .select(col("zone"), col("window_start").cast("string").as("w"), col("reason"))
    val joined = streamed.as("s").join(batch.as("b"), Seq("zone", "w"))
    val common = joined.count()
    val diffs = joined.filter(col("s.reason") =!= col("b.reason")).count()
    assert(common > 0, "twins must share surges for the guard to bite")
    assert(diffs == 0, s"$diffs/$common shared surges diverged — the streaming prompt drifted")
  }

  test("lab4: streaming verdicts byte-equal batch on the shared claim set") {
    val tmp = java.nio.file.Files.createTempDirectory("l4pp").toString
    drain(Labs.lab4FraudStreaming(spark, sfDir, s"$tmp/sink", s"$tmp/ckpt"))
    val streamed = spark.read.parquet(s"$tmp/sink").select("claim_id", "verdict")
    val batch = Labs.lab4Fraud(spark, sfDir).select("claim_id", "verdict")
    val joined = streamed.as("s").join(batch.as("b"), Seq("claim_id"))
    val common = joined.count()
    val diffs = joined.filter(col("s.verdict") =!= col("b.verdict")).count()
    assert(common > 0, "twins must share claims for the guard to bite")
    assert(diffs == 0, s"$diffs/$common shared claims diverged — the streaming prompt drifted")
  }

  test("the guard is non-vacuous: a one-byte prompt drift flips deterministic verdicts") {
    import graft.agent.{AgentDefinition, AgentRuntime, ScriptedChatModel}
    // the lab4 judge's exact configuration: verdict = hash(prompt) mod 5
    val judge = AgentDefinition(
      name = "fraud_judge_fixture",
      model = ScriptedChatModel("scripted-judge", Seq.empty,
        verdictFor = p => Seq("APPROVE", "APPROVE_PARTIAL", "REQUEST_DOCS",
          "DENY_INELIGIBLE", "DENY_FRAUD")(math.floorMod(p.hashCode, 5))),
      systemPrompt = "Review the claim against the 9-point checklist.",
      tools = Map.empty)
    val claims = core.Tables(spark, sfDir, "events").limit(20).select(
      col("event_id").as("claim_id"), col("event_type").as("claim_city"),
      col("value").as("claim_amount"), col("props").as("narrative"))
    val base = Labs.Prompts.lab4Base(col("claim_id"), col("claim_city"),
      col("claim_amount"), col("narrative"))
    def verdicts(prompt: org.apache.spark.sql.Column) =
      AgentRuntime.runOnColumn(claims.withColumn("prompt", prompt), judge, "prompt")
        .withColumn("verdict", regexp_extract(col("agent_response"), "VERDICT:\\s*(\\w+)", 1))
        .select("claim_id", "verdict")
    val clean = verdicts(base)
    val drifted = verdicts(concat(base, lit(" ")))  // the deliberately-broken twin
    val flips = clean.as("c").join(drifted.as("d"), Seq("claim_id"))
      .filter(col("c.verdict") =!= col("d.verdict")).count()
    assert(flips > 0,
      "a drifted prompt must flip at least one deterministic verdict, or the parity guards prove nothing")
  }
}
