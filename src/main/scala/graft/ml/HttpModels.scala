package graft.ml

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import scala.concurrent.duration.{DurationInt, FiniteDuration}

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** OpenAI-compatible HTTP model providers (reference: `CREATE MODEL` with
  * Bedrock / AzureOpenAI / OpenAI endpoints, terraform/core/main.tf:461-563;
  * per-call timeout 30 s, LAB1-Walkthrough.md:146).
  *
  * Providers are Serializable values executed INSIDE tasks; the HttpClient and
  * ObjectMapper live in the [[Http]] companion (per-JVM statics, never
  * serialized). Each request is bounded by `timeout`; transient failures
  * (connect errors, HTTP 408/429/5xx) are retried with exponential backoff up
  * to `maxRetries`, then surfaced as an exception — callers that want
  * per-row error rows instead of task failure wrap with [[FailsafeTextGen]]
  * (the agent runtime already catches per-row).
  *
  * The wire shapes are the public OpenAI API ones (`/chat/completions`,
  * `/embeddings`), which Bedrock access gateways and Azure OpenAI both speak.
  */
final case class HttpConfig(endpoint: String, model: String,
                            apiKey: Option[String] = None,
                            timeout: FiniteDuration = 30.seconds,
                            maxRetries: Int = 3,
                            backoffBaseMs: Long = 200L)

private[graft] object Http {
  // one client + mapper per JVM (thread-safe; HttpClient pools connections)
  lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(10)).build()
  lazy val mapper: ObjectMapper = new ObjectMapper()

  private def retryable(status: Int): Boolean =
    status == 408 || status == 429 || status >= 500

  /** POST JSON, return parsed body. Bounded retries with exponential backoff
    * on transient failures; non-retryable HTTP errors throw immediately.
    */
  def postJson(cfg: HttpConfig, path: String, body: JsonNode): JsonNode =
    sendJson(cfg, path, Some(body))

  /** GET JSON with the same retry machinery (reads are always idempotent). */
  def getJson(cfg: HttpConfig, path: String): JsonNode = sendJson(cfg, path, None)

  private def sendJson(cfg: HttpConfig, path: String, body: Option[JsonNode]): JsonNode = {
    val builder = HttpRequest.newBuilder()
      .uri(URI.create(cfg.endpoint.stripSuffix("/") + path))
      .timeout(Duration.ofMillis(cfg.timeout.toMillis))
      .header("Content-Type", "application/json")
    cfg.apiKey.foreach(k => builder.header("Authorization", s"Bearer $k"))
    val req = body match {
      case Some(b) => builder.POST(HttpRequest.BodyPublishers.ofString(mapper.writeValueAsString(b))).build()
      case None    => builder.GET().build()
    }

    var attempt = 0
    var lastErr: Throwable = null
    while (attempt <= cfg.maxRetries) {
      if (attempt > 0) Thread.sleep(cfg.backoffBaseMs << (attempt - 1)) // 200, 400, 800…
      try {
        val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
        if (resp.statusCode() / 100 == 2) return mapper.readTree(resp.body())
        if (!retryable(resp.statusCode()))
          throw new RuntimeException(s"model '${cfg.model}' HTTP ${resp.statusCode()}: ${resp.body().take(200)}")
        lastErr = new RuntimeException(s"model '${cfg.model}' transient HTTP ${resp.statusCode()}")
      } catch {
        case e: java.io.IOException => lastErr = e // connect/timeout — retryable
      }
      attempt += 1
    }
    throw new RuntimeException(
      s"model '${cfg.model}' failed after ${cfg.maxRetries + 1} attempts: ${lastErr.getMessage}", lastErr)
  }
}

/** `/chat/completions` text generation (single user message per prompt). */
final case class OpenAiTextGen(name: String, cfg: HttpConfig) extends TextGenModel {
  override def generate(prompt: String): String = {
    val m = Http.mapper
    val body = m.createObjectNode()
    body.put("model", cfg.model)
    val msgs = body.putArray("messages")
    val u = msgs.addObject(); u.put("role", "user"); u.put("content", prompt)
    val resp = Http.postJson(cfg, "/chat/completions", body)
    resp.path("choices").path(0).path("message").path("content").asText()
  }
}

/** `/chat/completions` chat for the agent runtime (system + history). */
final case class OpenAiChat(name: String, cfg: HttpConfig) extends ChatModel {
  override def chat(system: String, messages: Seq[Message]): String = {
    val m = Http.mapper
    val body = m.createObjectNode()
    body.put("model", cfg.model)
    val msgs = body.putArray("messages")
    val s = msgs.addObject(); s.put("role", "system"); s.put("content", system)
    messages.foreach { msg =>
      val o = msgs.addObject(); o.put("role", msg.role); o.put("content", msg.content)
    }
    val resp = Http.postJson(cfg, "/chat/completions", body)
    resp.path("choices").path(0).path("message").path("content").asText()
  }
}

/** `/embeddings`; `embedBatch` ships one request per partition-batch and
  * realigns by the response `index` field (the API may reorder `data`).
  */
final case class OpenAiEmbedding(name: String, cfg: HttpConfig, dim: Int) extends EmbeddingModel {
  override def embed(text: String): Array[Float] = embedBatch(Seq(text)).head

  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] = {
    val m = Http.mapper
    val body = m.createObjectNode()
    body.put("model", cfg.model)
    val input = body.putArray("input")
    texts.foreach(input.add)
    val resp = Http.postJson(cfg, "/embeddings", body)
    val data = resp.path("data")
    require(data.size() == texts.size,
      s"model '$name' returned ${data.size()} embeddings for ${texts.size} inputs")
    val out = new Array[Array[Float]](texts.size)
    data.forEach { item =>
      val idx = item.path("index").asInt()
      // a permuted-but-valid index set is what the field exists for; anything
      // else (out of range, duplicate) must fail HERE with model context, not
      // as a bare AIOOBE or a silent null embedding row downstream
      require(idx >= 0 && idx < out.length,
        s"model '$name' returned index $idx for a batch of ${texts.size}")
      require(out(idx) == null, s"model '$name' returned index $idx twice")
      val emb = item.path("embedding")
      val v = new Array[Float](emb.size())
      var i = 0
      while (i < emb.size()) { v(i) = emb.get(i).floatValue(); i += 1 }
      out(idx) = v
    }
    out.toSeq
  }
}

/** Turns provider exceptions into `FAILED: <reason>` rows instead of failing
  * the task — the shape the reference surfaces for agent/model errors
  * ((status, response) pairs, LAB1-Walkthrough.md:201-214).
  */
final case class FailsafeTextGen(inner: TextGenModel, prefix: String = "FAILED: ") extends TextGenModel {
  override def name: String = inner.name
  override def generate(prompt: String): String =
    try inner.generate(prompt)
    catch { case e: Exception => prefix + Option(e.getMessage).getOrElse(e.getClass.getSimpleName) }
}
