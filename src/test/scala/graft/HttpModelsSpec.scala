package graft

import java.net.InetSocketAddress
import java.util.concurrent.Executors
import java.util.concurrent.atomic.AtomicInteger

import scala.concurrent.duration.DurationInt

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

import graft.ml._

/** HTTP providers against an in-process OpenAI-compatible stub
  * (VERDICT round-2 item 4): latency injection, bounded retries/backoff,
  * timeout honoring, order preservation through the bounded-concurrency
  * mapPartitions, and per-row FAILED surfacing.
  */
class HttpModelsSpec extends SparkSpec with BeforeAndAfterAll {

  private val mapper = new ObjectMapper()
  private var server: HttpServer = _
  private var base: String = _
  private val inFlight = new AtomicInteger(0)
  private val maxInFlight = new AtomicInteger(0)
  private val attempts = new java.util.concurrent.ConcurrentHashMap[String, AtomicInteger]()

  private def prompt(ex: HttpExchange): String = {
    val body = mapper.readTree(ex.getRequestBody.readAllBytes())
    body.path("messages").path(body.path("messages").size() - 1).path("content").asText()
  }

  private def respond(ex: HttpExchange, status: Int, json: String): Unit = {
    val bytes = json.getBytes("UTF-8")
    ex.sendResponseHeaders(status, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def chatJson(content: String): String = {
    val root = mapper.createObjectNode()
    val choice = root.putArray("choices").addObject()
    val msg = choice.putObject("message")
    msg.put("role", "assistant")
    msg.put("content", content)
    mapper.writeValueAsString(root)
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new InetSocketAddress(0), 0)
    server.setExecutor(Executors.newFixedThreadPool(32))
    server.createContext("/chat/completions", (ex: HttpExchange) => {
      val cur = inFlight.incrementAndGet()
      maxInFlight.updateAndGet(m => math.max(m, cur))
      try {
        val p = prompt(ex)
        val n = attempts.computeIfAbsent(p, _ => new AtomicInteger(0)).incrementAndGet()
        p match {
          case s if s.contains("latency") => Thread.sleep(50); respond(ex, 200, chatJson(s"echo:$s"))
          case s if s.contains("flaky")   =>
            if (n == 1) respond(ex, 503, "busy") else respond(ex, 200, chatJson(s"echo:$s"))
          case s if s.contains("boom")    => respond(ex, 500, "kaput")
          case s if s.contains("hang")    => Thread.sleep(2000); respond(ex, 200, chatJson(s"echo:$s"))
          case s                          => respond(ex, 200, chatJson(s"echo:$s"))
        }
      } finally inFlight.decrementAndGet()
    })
    server.createContext("/embeddings", (ex: HttpExchange) => {
      val body = mapper.readTree(ex.getRequestBody.readAllBytes())
      val texts = body.path("input")
      val root = mapper.createObjectNode()
      val data = root.putArray("data")
      // deliberately answer in REVERSE order — the client must realign by index
      (texts.size() - 1) to 0 by -1 foreach { i =>
        val item = data.addObject()
        item.put("index", i)
        val emb = item.putArray("embedding")
        emb.add(texts.get(i).asText().length.toFloat); emb.add(i.toFloat)
      }
      respond(ex, 200, mapper.writeValueAsString(root))
    })
    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = {
    server.stop(0)
    super.afterAll()
  }

  private def cfg = HttpConfig(base, "stub-model", timeout = 1.second, maxRetries = 2, backoffBaseMs = 20L)

  test("N rows through the latency-injecting stub: order preserved, pool saturated") {
    import spark.implicits._
    maxInFlight.set(0)
    ModelCatalog.registerTextGen(OpenAiTextGen("http-gen", cfg))
    val prompts = (1 to 24).map(i => s"latency prompt $i")
    val df = prompts.toDF("text").coalesce(1)
    val out = MlPredict.generateConcurrent(df, "http-gen", "text", concurrency = 8)
      .select("text", "response").as[(String, String)].collect()
    assert(out.map(_._1).toSeq == prompts, "input order must be preserved")
    assert(out.forall { case (p, r) => r == s"echo:$p" })
    assert(maxInFlight.get() > 1, s"pool must overlap requests (saw max ${maxInFlight.get()} in flight)")
  }

  test("transient 503 is retried with backoff and succeeds") {
    val gen = OpenAiTextGen("http-gen", cfg)
    val p = "flaky please"
    assert(gen.generate(p) == s"echo:$p")
    assert(attempts.get(p).get() == 2, "exactly one retry after the 503")
  }

  test("hard failures become FAILED rows through FailsafeTextGen, good rows unaffected") {
    import spark.implicits._
    ModelCatalog.registerTextGen(FailsafeTextGen(OpenAiTextGen("http-gen", cfg)))
    val df = Seq("fine a", "boom b", "fine c").toDF("text").coalesce(1)
    val out = MlPredict.generateConcurrent(df, "http-gen", "text", concurrency = 2)
      .select("response").as[String].collect()
    assert(out(0) == "echo:fine a" && out(2) == "echo:fine c")
    assert(out(1).startsWith("FAILED: "), s"500 row must surface as FAILED, got: ${out(1)}")
    // all 3 attempts burned (1 + 2 retries) before giving up
    assert(attempts.get("boom b").get() == 3)
  }

  test("requests slower than the timeout fail after bounded retries") {
    val fast = cfg.copy(timeout = 200.millis, maxRetries = 1)
    val e = intercept[RuntimeException] { OpenAiTextGen("http-gen", fast).generate("hang on") }
    assert(e.getMessage.contains("2 attempts"))
  }

  test("embeddings realign by response index (stub answers in reverse)") {
    val emb = OpenAiEmbedding("http-emb", cfg, dim = 2)
    val vs = emb.embedBatch(Seq("a", "bb", "ccc"))
    // stub embedding = [len(text), index]
    assert(vs(0).toSeq == Seq(1f, 0f) && vs(1).toSeq == Seq(2f, 1f) && vs(2).toSeq == Seq(3f, 2f))
  }

  test("chat sends system + history and reads the assistant message") {
    val chat = OpenAiChat("http-chat", cfg)
    val r = chat.chat("be brief", Seq(Message("user", "plain hello")))
    assert(r == "echo:plain hello")
  }
}
