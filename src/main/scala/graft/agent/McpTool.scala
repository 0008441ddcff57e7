package graft.agent

import scala.concurrent.duration.{DurationInt, FiniteDuration}

import graft.ml.{Http, HttpConfig}

/** MCP tool over streamable HTTP (reference: `CREATE CONNECTION ... type =
  * MCP_SERVER, transport-type = 'STREAMABLE_HTTP'`,
  * terraform/lab1-tool-calling/main.tf:65-73; `CREATE TOOL ... 'type'='mcp',
  * 'request_timeout'='30'`, LAB1-Walkthrough.md:141-148).
  *
  * Wire shape is MCP's JSON-RPC 2.0 `tools/call`:
  * `{"jsonrpc":"2.0","id":1,"method":"tools/call","params":{"name":…,
  * "arguments":{"input":…}}}` → `result.content[0].text`. The HTTP plumbing
  * (bounded retries, backoff, per-request timeout) is the shared [[Http]]
  * client; `request_timeout` maps onto the request deadline.
  *
  * Serializable: tools execute inside tasks (the agent loop runs in
  * mapPartitions); only the endpoint + config ship in the closure.
  */
/** NOTE on retries: tools are side-effecting (lab1's set includes
  * `send_email`), so the default is NO transport-level retry — a lost
  * response must not re-send the email. The agent loop already handles tool
  * failure at the protocol level (ERROR observation → model decides, bounded
  * by max_consecutive_failures), which is the reference's own recovery path.
  * Set `maxRetries` explicitly for tools known to be idempotent.
  */
final case class McpHttpTool(name: String, endpoint: String,
                             requestTimeout: FiniteDuration = 30.seconds,
                             maxRetries: Int = 0,
                             description: String = "remote MCP tool") extends Tool {

  private def cfg = HttpConfig(endpoint, model = s"mcp:$name",
    timeout = requestTimeout, maxRetries = maxRetries, backoffBaseMs = 100L)

  override def invoke(args: String): String = {
    val m = Http.mapper
    val body = m.createObjectNode()
    body.put("jsonrpc", "2.0")
    body.put("id", 1)
    body.put("method", "tools/call")
    val params = body.putObject("params")
    params.put("name", name)
    params.putObject("arguments").put("input", args)
    val resp = Http.postJson(cfg, "", body)
    val err = resp.path("error")
    if (!err.isMissingNode && !err.isNull)
      throw new RuntimeException(s"MCP tool '$name' error: ${err.path("message").asText()}")
    resp.path("result").path("content").path(0).path("text").asText()
  }
}
