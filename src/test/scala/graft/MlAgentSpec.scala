package graft

import org.apache.spark.sql.functions._

import graft.agent._
import graft.ml._
import graft.vector.{BruteForceStore, KnnJoin, VectorSearchAgg, VectorStore}

class MlSpec extends SparkSpec {
  test("LocalHashEmbedding is deterministic, normalized, fixed-dim") {
    val m = LocalHashEmbedding("m", dim = 16)
    val a = m.embed("the quick brown fox")
    val b = m.embed("the quick brown fox")
    assert(a.toSeq == b.toSeq)
    assert(a.length == 16)
    val norm = math.sqrt(a.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-6)
    assert(m.embed("something else entirely").toSeq != a.toSeq)
  }

  test("MlPredict.embed and generate add columns") {
    import spark.implicits._
    val df = Seq((1L, "hello world"), (2L, "foo bar baz")).toDF("id", "text")
    val e = MlPredict.embed(df, "local-embed-64", "text")
    assert(e.columns.contains("embedding"))
    assert(e.select(size(col("embedding"))).collect().forall(_.getInt(0) == 64))
    val g = MlPredict.generate(df, "local-textgen", "text")
    val responses = g.select("response").collect().map(_.getString(0))
    assert(responses.forall(_.startsWith("[local-textgen]")))
  }

  test("generateBatched matches generate") {
    import spark.implicits._
    val df = (1 to 10).map(i => (i.toLong, s"doc number $i")).toDF("id", "text")
    val a = MlPredict.generate(df, "local-textgen", "text").select("id", "response").collect().toSeq
    val b = MlPredict.generateBatched(df, "local-textgen", "text", batchSize = 3)
      .select("id", "response").collect().toSeq
    assert(a.map(r => (r.getLong(0), r.getString(1))).sortBy(_._1) ==
      b.map(r => (r.getLong(0), r.getString(1))).sortBy(_._1))
  }
}

class VectorStoreSpec extends SparkSpec {
  test("BruteForceStore ranks by cosine with id tie-break") {
    val store = new BruteForceStore(Array(
      (1L, "a", Array(1f, 0f)),
      (2L, "b", Array(0f, 1f)),
      (3L, "c", Array(1f, 0.1f))))
    val res = store.search(Array(1f, 0f), 2)
    assert(res.map(_.doc_id) == Seq(1L, 3L))
    assert(math.abs(res.head.score - 1.0) < 1e-12)
    // k <= 0 is the empty result, not an NPE against the empty heap's peek()
    // (advisor round-7 finding; the pre-heap sortBy/take contract)
    assert(store.search(Array(1f, 0f), 0) == Seq.empty)
    assert(store.search(Array(1f, 0f), -3) == Seq.empty)
  }

  test("VectorSearchAgg returns ARRAY<ROW(doc_id, chunk, score)> shape") {
    import spark.implicits._
    val corpus = Seq((10L, "c10", Array(1f, 0f)), (11L, "c11", Array(0f, 1f)))
      .toDF("doc_id", "chunk", "embedding")
    val store = VectorStore.bruteForce(corpus, "doc_id", "chunk", "embedding")
    val queries = Seq((1L, Array(0.9f, 0.1f))).toDF("qid", "embedding")
    val out = VectorSearchAgg(spark, queries, store, "embedding", 2)
    val row = out.select(element_at(col("search_results"), 1)).head().getStruct(0)
    assert(row.getAs[Long]("doc_id") == 10L)
    assert(row.getAs[String]("chunk") == "c10")
    assert(row.getAs[Double]("score") > 0.9)
  }

  test("KnnJoin agrees with BruteForceStore on testdata") {
    val emb = graft.core.Tables(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 5).select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corpus = emb.select(col("vec_id").as("nid"), col("embedding").as("nvec"))
    val knn = KnnJoin(queries, corpus, 3).orderBy("qid", "rank")
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid")))
    val store = VectorStore.bruteForce(
      emb.select(col("vec_id"), concat(lit("c"), col("vec_id")).as("chunk"), col("embedding")),
      "vec_id", "chunk", "embedding")
    val expected = emb.filter(col("vec_id") < 5).select("vec_id", "embedding").collect().flatMap { r =>
      val qid = r.getLong(0)
      store.search(r.getSeq[Float](1).toArray, 4).filter(_.doc_id != qid).take(3).map(d => (qid, d.doc_id))
    }
    assert(knn.toSeq == expected.toSeq)
  }
}

class AgentSpec extends SparkSpec {
  private def mkAgent(script: Seq[String], tools: Map[String, Tool]) = AgentDefinition(
    "t", ScriptedChatModel("m", script, _ => "OK"), "sys", tools)

  test("agent loop calls tools then finishes with SUCCESS") {
    val agent = mkAgent(Seq("http_get"), Map("http_get" -> ScriptedTools.HttpGetTool()))
    val res = AgentRuntime.run(agent, "check price for widget")
    assert(res.status == "SUCCESS")
    assert(res.response.contains("VERDICT: OK"))
    assert(res.response.contains("<html>"))
  }

  test("consecutive tool failures end with FAILED") {
    val agent = mkAgent(Seq("bad", "bad"), Map("bad" -> ScriptedTools.FailingTool("bad")))
    val res = AgentRuntime.run(agent, "prompt")
    assert(res.status == "FAILED")
  }

  test("maxIterations cap yields MAX_ITERATIONS") {
    // script longer than maxIterations → loop never reaches a final answer
    val agent = mkAgent(Seq.fill(20)("http_get"), Map("http_get" -> ScriptedTools.HttpGetTool()))
      .copy(maxIterations = 3)
    val res = AgentRuntime.run(agent, "prompt")
    assert(res.status == "MAX_ITERATIONS")
  }

  test("runOnColumn appends status/response and distributes") {
    import spark.implicits._
    val df = (1 to 6).map(i => (i.toLong, s"order $i")).toDF("id", "prompt")
    val agent = mkAgent(Seq.empty, Map.empty)
    val out = AgentRuntime.runOnColumn(df, agent, "prompt")
    assert(out.columns.toSeq.takeRight(2) == Seq("agent_status", "agent_response"))
    assert(out.filter(col("agent_status") === "SUCCESS").count() == 6)
  }
}
