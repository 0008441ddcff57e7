package graft

import java.net.InetSocketAddress
import java.util.concurrent.Executors
import java.util.concurrent.atomic.AtomicInteger

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll

import graft.agent.AgentCatalog
import graft.sql.SqlFrontend

/** The reference's own walkthrough SQL is the fixture (the reference tests the
  * same way — testing/e2e/test_sql_extraction.py:13-32): statements are
  * extracted verbatim from LAB1-Walkthrough.md and executed through
  * [[SqlFrontend]], with the remote sides (OpenAI-compatible model endpoint,
  * MCP streamable-HTTP server) played by in-process stubs.
  */
class SqlFrontendSpec extends SparkSpec with BeforeAndAfterAll {

  private val mapper = new ObjectMapper()
  private var server: HttpServer = _
  private var base: String = _
  private val mcpCalls = new java.util.concurrent.ConcurrentHashMap[String, AtomicInteger]()

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new InetSocketAddress(0), 0)
    server.setExecutor(Executors.newFixedThreadPool(8))
    // OpenAI-compatible chat endpoint (CREATE MODEL target)
    server.createContext("/v1/chat/completions", (ex: HttpExchange) => {
      val body = mapper.readTree(ex.getRequestBody.readAllBytes())
      val msgs = body.path("messages")
      val userPrompt = (0 until msgs.size())
        .find(i => msgs.path(i).path("role").asText() == "user")
        .map(i => msgs.path(i).path("content").asText()).getOrElse("")
      // scripted agent behavior over the wire: first turn calls http_get,
      // second turn closes with a verdict (same protocol as ScriptedChatModel)
      val toolTurns = (0 until msgs.size()).count(i => msgs.path(i).path("role").asText() == "tool")
      val content =
        if (userPrompt.startsWith("Price-match") && toolTurns == 0) "TOOL:http_get competitor-url"
        else if (userPrompt.startsWith("Price-match")) "Analysis complete. Decision: PRICE_MATCH"
        else if (userPrompt.startsWith("COMPETITOR URL") && toolTurns == 0) "TOOL:http_get competitor-url"
        else if (userPrompt.startsWith("COMPETITOR URL"))
          "Competitor Price:\n19.99\n\nDecision:\nPRICE_MATCH\n\nSummary:\nPrice matched and email sent."
        else if (userPrompt.contains("send_email tool") && toolTurns == 0) "TOOL:send_email {\"to\":\"test\"}"
        else if (userPrompt.contains("send_email tool")) "Email sent successfully."
        else s"stub-answer: ${userPrompt.take(40)}"
      val root = mapper.createObjectNode()
      val msg = root.putArray("choices").addObject().putObject("message")
      msg.put("role", "assistant"); msg.put("content", content)
      val bytes = mapper.writeValueAsString(root).getBytes("UTF-8")
      ex.sendResponseHeaders(200, bytes.length); ex.getResponseBody.write(bytes); ex.close()
    })
    // MCP streamable-HTTP endpoint (CREATE TOOL target): JSON-RPC tools/call
    server.createContext("/mcp", (ex: HttpExchange) => {
      val body = mapper.readTree(ex.getRequestBody.readAllBytes())
      assert(body.path("method").asText() == "tools/call")
      val tool = body.path("params").path("name").asText()
      mcpCalls.computeIfAbsent(tool, _ => new AtomicInteger(0)).incrementAndGet()
      val root = mapper.createObjectNode()
      root.put("jsonrpc", "2.0"); root.put("id", body.path("id").asInt())
      val item = root.putObject("result").putArray("content").addObject()
      item.put("type", "text"); item.put("text", s"$tool-result price=19.99")
      val bytes = mapper.writeValueAsString(root).getBytes("UTF-8")
      ex.sendResponseHeaders(200, bytes.length); ex.getResponseBody.write(bytes); ex.close()
    })
    // Atlas-like vector search endpoint (CREATE TABLE connector=mongodb target):
    // exact cosine over a tiny in-memory collection, honoring limit
    server.createContext("/vectordb", (ex: HttpExchange) => {
      val body = mapper.readTree(ex.getRequestBody.readAllBytes())
      lastVectorRequest = body
      val q = (0 until body.path("queryVector").size()).map(i => body.path("queryVector").path(i).asDouble())
      val corpus = Seq((10L, "doc-ten", Seq(1.0, 0.0)), (11L, "doc-eleven", Seq(0.6, 0.8)),
        (12L, "doc-twelve", Seq(0.0, 1.0)))
      def cos(a: Seq[Double], b: Seq[Double]) = {
        val dot = a.zip(b).map { case (x, y) => x * y }.sum
        dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      }
      val root = mapper.createObjectNode()
      val arr = root.putArray("results")
      corpus.map { case (id, chunk, v) => (id, chunk, cos(q, v)) }
        .sortBy { case (id, _, s) => (-s, id) }
        .take(body.path("limit").asInt())
        .foreach { case (id, chunk, s) =>
          val o = arr.addObject(); o.put("doc_id", id); o.put("chunk", chunk); o.put("score", s)
        }
      val bytes = mapper.writeValueAsString(root).getBytes("UTF-8")
      ex.sendResponseHeaders(200, bytes.length); ex.getResponseBody.write(bytes); ex.close()
    })
    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  @volatile private var lastVectorRequest: com.fasterxml.jackson.databind.JsonNode = _

  override def afterAll(): Unit = { server.stop(0); super.afterAll() }

  private lazy val walkthrough =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/LAB1-Walkthrough.md")), "UTF-8")

  private def sqlBlocks: Seq[String] =
    "(?s)```sql\\s*(.*?)```".r.findAllMatchIn(walkthrough).map(_.group(1).trim).toSeq

  test("walkthrough CREATE TOOL + CREATE AGENT execute verbatim over a live MCP stub") {
    // the terraform-provisioned connection the walkthrough assumes
    SqlFrontend.execute(spark,
      s"CREATE CONNECTION `remote-mcp-connection` WITH ('type'='MCP_SERVER', 'endpoint'='$base/mcp')")
    // the model the agent DDL names, served by the OpenAI-compatible stub
    SqlFrontend.execute(spark,
      "CREATE CONNECTION bedrock_conn WITH ('type'='bedrock', 'endpoint'='" + base + "/v1')")
    SqlFrontend.execute(spark,
      "CREATE MODEL remote_mcp_model INPUT (prompt STRING) OUTPUT (response STRING) " +
        "WITH ('provider'='bedrock', 'task'='text_generation', 'bedrock.connection'='bedrock_conn')")

    val createTool = sqlBlocks.find(_.toUpperCase.startsWith("CREATE TOOL"))
      .getOrElse(fail("walkthrough must contain CREATE TOOL"))
    val createAgent = sqlBlocks.find(_.toUpperCase.startsWith("CREATE AGENT"))
      .getOrElse(fail("walkthrough must contain CREATE AGENT"))
    SqlFrontend.execute(spark, createTool)
    SqlFrontend.execute(spark, createAgent)

    val agent = AgentCatalog.resolve("price_match_agent")
    assert(agent.tools.keySet == Set("http_get", "send_email"), s"got ${agent.tools.keySet}")
    assert(agent.maxIterations == 10 && agent.maxConsecutiveFailures == 2)
    assert(agent.systemPrompt.contains("price matching assistant"))

    // run the agent: model turn 1 → MCP http_get over real HTTP → final verdict
    mcpCalls.clear()
    val res = graft.agent.AgentRuntime.run(agent, "Price-match check for order 42 at price 29.95")
    assert(res.status == "SUCCESS", s"agent must close: $res")
    assert(res.response.contains("PRICE_MATCH"))
    assert(mcpCalls.containsKey("http_get") && mcpCalls.get("http_get").get() == 1,
      s"the MCP stub must have served the tool call, saw $mcpCalls")
  }

  test("walkthrough LATERAL TABLE(ML_PREDICT(...)) test query runs after rewrite") {
    SqlFrontend.execute(spark,
      "CREATE CONNECTION bedrock_conn2 WITH ('type'='bedrock', 'endpoint'='" + base + "/v1')")
    SqlFrontend.execute(spark,
      "CREATE MODEL llm_textgen_model INPUT (prompt STRING) OUTPUT (response STRING) " +
        "WITH ('provider'='bedrock', 'task'='text_generation', 'bedrock.connection'='bedrock_conn2')")
    val q = sqlBlocks.find(b => b.toUpperCase.contains("LATERAL TABLE(ML_PREDICT"))
      .getOrElse(fail("walkthrough must contain the LATERAL ML_PREDICT test query"))
    val rows = SqlFrontend.execute(spark, q).collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[String]("question").contains("Colorado"))
    assert(rows(0).getAs[String]("response").startsWith("stub-answer:"))
  }

  test("SET / DESCRIBE / DROP and CTAS round-trip through the registries") {
    import spark.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").createOrReplaceTempView("src_tbl")
    SqlFrontend.execute(spark, "CREATE TABLE derived_tbl AS SELECT id, upper(v) AS vv FROM src_tbl")
    assert(spark.sql("SELECT * FROM derived_tbl").count() == 2)
    val desc = SqlFrontend.execute(spark, "DESCRIBE derived_tbl").collect()
    assert(desc.map(_.getString(0)).toSet == Set("id", "vv"))
    SqlFrontend.execute(spark, "SET 'sql.state-ttl' = '1 h'")
    assert(graft.sources.TableRegistry.get("sql.state-ttl").contains("1 h"))
    SqlFrontend.execute(spark, "DROP TABLE derived_tbl")
    assert(!graft.sources.TableRegistry.exists("derived_tbl"))
  }

  test("CREATE TABLE connector=mongodb registers a live remote vector store honoring numCandidates") {
    SqlFrontend.execute(spark,
      s"CREATE CONNECTION `mongodb-connection` WITH ('type'='MONGODB', 'endpoint'='$base/vectordb')")
    // the reference's lab2 DDL shape (terraform/lab2-vector-search/main.tf:215)
    SqlFrontend.execute(spark,
      "CREATE TABLE IF NOT EXISTS documents_vectordb_lab2 ( document_id STRING, chunk STRING, " +
        "embedding ARRAY<FLOAT> ) WITH ( 'connector' = 'mongodb', " +
        "'mongodb.connection' = 'mongodb-connection', 'mongodb.database' = 'graftdb', " +
        "'mongodb.collection' = 'docs', 'mongodb.index' = 'emb_idx', " +
        "'mongodb.embedding_column' = 'embedding', 'mongodb.numCandidates' = '500' )")

    val store = graft.vector.VectorTableCatalog.resolve("documents_vectordb_lab2")
    val hits = store.search(Array(1f, 0f), 2)
    assert(hits.map(_.doc_id) == Seq(10L, 11L), s"got $hits")
    assert(hits.head.chunk == "doc-ten" && hits.head.score > 0.99)
    // the table's configured ANN breadth travels on every request
    assert(lastVectorRequest.path("numCandidates").asInt() == 500)
    assert(lastVectorRequest.path("limit").asInt() == 2)
    assert(lastVectorRequest.path("index").asText() == "emb_idx")
    assert(lastVectorRequest.path("path").asText() == "embedding")

    // same trait → drives VECTOR_SEARCH_AGG unchanged
    import spark.implicits._
    val queries = Seq((1L, Seq(0.0f, 1.0f))).toDF("query_id", "embedding")
    val out = graft.vector.VectorSearchAgg(spark, queries, store, "embedding", 1)
      .selectExpr("search_results[0].doc_id AS d").as[Long].head()
    assert(out == 12L)
  }

  test("lab1 price_match_results CTAS with AI_RUN_AGENT runs verbatim over the stubs") {
    // prerequisites the walkthrough assumes: connection, model, tool, agent
    SqlFrontend.execute(spark,
      s"CREATE CONNECTION `remote-mcp-connection` WITH ('type'='MCP_SERVER', 'endpoint'='$base/mcp')")
    SqlFrontend.execute(spark,
      "CREATE CONNECTION bedrock_conn3 WITH ('type'='bedrock', 'endpoint'='" + base + "/v1')")
    SqlFrontend.execute(spark,
      "CREATE MODEL remote_mcp_model INPUT (prompt STRING) OUTPUT (response STRING) " +
        "WITH ('provider'='bedrock', 'task'='text_generation', 'bedrock.connection'='bedrock_conn3')")
    SqlFrontend.execute(spark, sqlBlocks.find(_.toUpperCase.startsWith("CREATE TOOL")).get)
    SqlFrontend.execute(spark, sqlBlocks.find(_.toUpperCase.startsWith("CREATE AGENT")).get)

    import spark.implicits._
    Seq((1L, "blue kayak", "kai@example.com", 129.99),
        (2L, "red canoe", "ada@example.com", 349.50))
      .toDF("order_id", "product_name", "customer_email", "order_price")
      .createOrReplaceTempView("enriched_orders")

    val ctas = sqlBlocks.find(b => b.toUpperCase.contains("AI_RUN_AGENT") &&
        b.toUpperCase.startsWith("CREATE TABLE"))
      .getOrElse(fail("walkthrough must contain the price_match_results CTAS"))
    mcpCalls.clear()
    SqlFrontend.execute(spark, ctas)
    val out = spark.table("price_match_results").orderBy("order_id").collect()
    assert(out.length == 2)
    assert(out.forall(_.getAs[String]("agent_status") == "SUCCESS"))
    assert(out.forall(_.getAs[String]("decision") == "PRICE_MATCH"))
    // SQL TRIM strips spaces, not the newline the section format carries
    assert(out.head.getAs[String]("competitor_price").trim == "19.99")
    assert(out.forall(_.getAs[String]("raw_response").nonEmpty))
    // each order's agent loop hit the MCP stub for its http_get
    assert(mcpCalls.get("http_get").get() >= 2, s"saw $mcpCalls")
  }

  test("lab1 AI_TOOL_INVOKE test query runs verbatim and invokes the tool over MCP") {
    SqlFrontend.execute(spark,
      s"CREATE CONNECTION `remote-mcp-connection` WITH ('type'='MCP_SERVER', 'endpoint'='$base/mcp')")
    SqlFrontend.execute(spark,
      "CREATE CONNECTION bedrock_conn4 WITH ('type'='bedrock', 'endpoint'='" + base + "/v1')")
    SqlFrontend.execute(spark,
      "CREATE MODEL remote_mcp_model INPUT (prompt STRING) OUTPUT (response STRING) " +
        "WITH ('provider'='bedrock', 'task'='text_generation', 'bedrock.connection'='bedrock_conn4')")
    SqlFrontend.execute(spark, sqlBlocks.find(_.toUpperCase.startsWith("CREATE TOOL")).get)

    val q = sqlBlocks.find(_.toUpperCase.contains("AI_TOOL_INVOKE"))
      .getOrElse(fail("walkthrough must contain the AI_TOOL_INVOKE test query"))
    mcpCalls.clear()
    val row = SqlFrontend.execute(spark, q).collect()
    assert(row.length == 1)
    assert(row(0).getAs[String]("response") == "Email sent successfully.")
    assert(mcpCalls.get("send_email").get() == 1, s"saw $mcpCalls")
  }

  test("lab3 completed_actions CTAS (un-aliased AI_RUN_AGENT, constraint block) runs verbatim") {
    // the walkthrough's agent, stood in by a deterministic chat producing the
    // three labeled sections its REGEXP_EXTRACTs parse
    graft.agent.AgentCatalog.register(graft.agent.AgentDefinition(
      name = "boat_dispatch_agent",
      model = new graft.ml.ChatModel {
        val name = "dispatch-stub"
        def chat(system: String, messages: Seq[graft.ml.Message]): String =
          "Dispatch Summary:\nDispatched 3 boats to the surge zone.\n\n" +
            "Dispatch JSON:\n{\"boats\": 3}\n\nAPI Response:\n{\"status\": \"ok\"}"
      },
      systemPrompt = "", tools = Map.empty))
    import spark.implicits._
    Seq(("Z-7", "2024-03-01 12:00:00", 42L, "storm surge"))
      .toDF("pickup_zone", "window_time", "request_count", "anomaly_reason")
      .createOrReplaceTempView("anomalies_enriched")

    val md = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/LAB3-Walkthrough.md")), "UTF-8")
    // fences anchored to line starts: the SQL itself contains inline ```json
    // inside its regex literals
    val ctas = "(?sm)^```sql\\s*\\n(.*?)^```".r.findAllMatchIn(md).map(_.group(1).trim)
      .find(b => b.toUpperCase.contains("AI_RUN_AGENT") && b.toUpperCase.startsWith("CREATE TABLE"))
      .getOrElse(fail("LAB3 walkthrough must contain the completed_actions CTAS"))
    SqlFrontend.execute(spark, ctas)
    val out = spark.table("completed_actions").collect()
    assert(out.length == 1)
    assert(out(0).getAs[String]("dispatch_summary").contains("Dispatched 3 boats"))
    assert(out(0).getAs[String]("dispatch_json").trim == "{\"boats\": 3}")
    assert(out(0).getAs[String]("api_response").trim == "{\"status\": \"ok\"}")
    assert(out(0).getAs[String]("raw_response").nonEmpty)
  }

  test("lab2 search_results CTAS with VECTOR_SEARCH_AGG runs verbatim from terraform") {
    SqlFrontend.execute(spark,
      s"CREATE CONNECTION `mongodb-connection` WITH ('type'='MONGODB', 'endpoint'='$base/vectordb')")
    SqlFrontend.execute(spark,
      "CREATE TABLE IF NOT EXISTS documents_vectordb_lab2 ( document_id STRING, chunk STRING, " +
        "embedding ARRAY<FLOAT> ) WITH ( 'connector' = 'mongodb', " +
        "'mongodb.connection' = 'mongodb-connection', 'mongodb.numCandidates' = '500' )")
    import spark.implicits._
    Seq(("what is doc ten", Seq(1.0f, 0.0f)), ("what is doc twelve", Seq(0.0f, 1.0f)))
      .toDF("query", "embedding").createOrReplaceTempView("queries_embed")

    // the exact statement the reference submits (no terraform interpolation in it)
    val tf = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/terraform/lab2-vector-search/main.tf")), "UTF-8")
    val stmt = "statement = \"(CREATE TABLE IF NOT EXISTS search_results[^\"]*)\"".r
      .findFirstMatchIn(tf).map(_.group(1))
      .getOrElse(fail("terraform must contain the search_results CTAS"))

    SqlFrontend.execute(spark, stmt)
    val out = spark.table("search_results").orderBy("query").collect()
    assert(out.length == 2)
    val first = out.head // "what is doc ten" → nearest is doc 10
    assert(first.getAs[Long]("document_id_1") == 10L && first.getAs[String]("chunk_1") == "doc-ten")
    assert(first.getAs[Double]("score_1") > first.getAs[Double]("score_3"),
      "ranks must order by descending score")
    assert(out(1).getAs[Long]("document_id_1") == 12L)
  }

  test("INSERT INTO appends through the registry") {
    import spark.implicits._
    Seq((1L, "x")).toDF("id", "v").createOrReplaceTempView("ins_src")
    SqlFrontend.execute(spark, "CREATE TABLE ins_tgt AS SELECT id, v FROM ins_src")
    SqlFrontend.execute(spark, "INSERT INTO ins_tgt SELECT id + 1 AS id, 'y' AS v FROM ins_src")
    assert(spark.table("ins_tgt").count() == 2)
  }

  test("statement splitter respects quoted semicolons") {
    val stmts = SqlFrontend.splitStatements("SET 'a' = 'x;y'; SELECT 1")
    assert(stmts == Seq("SET 'a' = 'x;y'", "SELECT 1"))
  }
}
