package graft

import org.apache.spark.sql.functions._

class StreamingLabsSpec extends SparkSpec {

  test("streaming lab1 enriches and judges orders per micro-batch") {
    val tmp = java.nio.file.Files.createTempDirectory("lab1s").toString
    val q = graft.pipelines.Labs.lab1PriceMatchStreaming(spark, sfDir, s"$tmp/sink", s"$tmp/ckpt")
    try q.processAllAvailable() finally q.stop()
    val out = spark.read.parquet(s"$tmp/sink")
    assert(out.count() > 0)
    assert(out.filter(col("agent_status") =!= "SUCCESS").count() == 0)
    assert(out.select("verdict").collect().forall(r => Set("MATCH", "NO_MATCH")(r.getString(0))))
    assert(out.columns.contains("customer_name") && out.columns.contains("nation_name"))
  }

  test("streaming lab4 joins spikes back to claims and judges a bounded queue") {
    val tmp = java.nio.file.Files.createTempDirectory("lab4s").toString
    val q = graft.pipelines.Labs.lab4FraudStreaming(spark, sfDir, s"$tmp/sink", s"$tmp/ckpt")
    try q.processAllAvailable() finally q.stop()
    val enum5 = Set("APPROVE", "APPROVE_PARTIAL", "REQUEST_DOCS", "DENY_INELIGIBLE", "DENY_FRAUD")
    val out = spark.read.parquet(s"$tmp/sink")
    assert(out.count() > 0, "streaming lab4 must emit judged claims")
    assert(out.select("verdict").collect().forall(r => enum5(r.getString(0))))
  }
}
