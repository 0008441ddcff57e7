package graft

import org.apache.spark.sql.functions._

import graft.agent._

class Lab2StreamingSpec extends SparkSpec {

  test("streaming embed-insert produces store-ready rows matching the batch embedder") {
    val tmp = java.nio.file.Files.createTempDirectory("lab2s").toString
    val q = graft.pipelines.Labs.lab2EmbedStreaming(spark, sfDir, s"$tmp/sink", s"$tmp/ckpt")
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.read.parquet(s"$tmp/sink")
    val docs = graft.core.Tables(spark, sfDir, "documents")
    assert(streamed.count() == docs.count())
    // embeddings must match the batch path bit-for-bit (same deterministic model)
    val batch = graft.ml.MlPredict.embed(docs, "local-embed-64", "text")
      .select(col("doc_id"), col("embedding"))
    val joined = streamed.alias("s").join(batch.alias("b"), "doc_id")
      .filter(expr("s.embedding <> b.embedding"))
    assert(joined.count() == 0, "streamed embeddings must equal batch embeddings")
    // and the sink is directly loadable as a vector store
    val store = graft.vector.VectorStore.bruteForce(streamed, "doc_id", "chunk", "embedding")
    assert(store.search(streamed.head().getSeq[Float](2).toArray, 1).head.score > 0.999)
  }
}

class ConcurrentAgentSpec extends SparkSpec {

  test("runOnColumnConcurrent matches the sequential agent stage") {
    import spark.implicits._
    val agent = AgentDefinition("t",
      ScriptedChatModel("m", Seq("http_get"), p => if (p.hashCode % 2 == 0) "YES" else "NO"),
      "sys", Map("http_get" -> ScriptedTools.HttpGetTool()))
    val df = (1 to 30).map(i => (i.toLong, s"check item $i")).toDF("id", "prompt").repartition(2)
    val seq = AgentRuntime.runOnColumn(df, agent, "prompt")
      .select("id", "agent_status", "agent_response").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1).toSeq
    val conc = AgentRuntime.runOnColumnConcurrent(df, agent, "prompt", concurrency = 6)
      .select("id", "agent_status", "agent_response").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1).toSeq
    assert(conc == seq)
    assert(conc.forall(_._2 == "SUCCESS"))
  }
}
