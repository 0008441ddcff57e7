package graft.agent

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{StringType, StructType}

import graft.ml.{ChatModel, Message}

/** AI_RUN_AGENT / AI_TOOL_INVOKE (reference: CREATE AGENT
  * LAB1-Walkthrough.md:155-180, LAB3-Walkthrough.md:396-448,
  * LAB4-Walkthrough.md:330-384; invocation returns (status, response),
  * LAB1-Walkthrough.md:255).
  *
  * The agent loop is a black-box row transform: it runs inside tasks via
  * mapPartitions — one loop per input row, partition-parallel, no driver
  * involvement. Caps mirror the reference: `max_iterations` (10) and
  * `max_consecutive_failures` (2), tool timeout is the tool's concern.
  *
  * Tool-call wire protocol (model ↔ runtime): a model response starting with
  * `TOOL:<name> <json-ish args>` invokes that tool; anything else is the final
  * answer. Deterministic scripted models in [[ScriptedChatModel]] drive the
  * correctness suite; HTTP-backed chat models plug in behind the same trait.
  */
trait Tool extends Serializable {
  def name: String
  def description: String
  def invoke(args: String): String
}

final case class AgentDefinition(name: String,
                                 model: ChatModel,
                                 systemPrompt: String,
                                 tools: Map[String, Tool],
                                 maxIterations: Int = 10,
                                 maxConsecutiveFailures: Int = 2)

final case class AgentResult(status: String, response: String)

object AgentRuntime {

  private val ToolCallRe = "(?s)^TOOL:(\\S+)\\s*(.*)$".r

  def run(agent: AgentDefinition, userPrompt: String): AgentResult = {
    var messages = Vector(Message("user", userPrompt))
    var consecutiveFailures = 0
    var iter = 0
    while (iter < agent.maxIterations) {
      iter += 1
      val reply = agent.model.chat(agent.systemPrompt, messages)
      reply match {
        case ToolCallRe(toolName, args) =>
          messages :+= Message("assistant", reply)
          agent.tools.get(toolName) match {
            case Some(tool) =>
              val obs =
                try { val r = tool.invoke(args.trim); consecutiveFailures = 0; r }
                catch {
                  case e: Exception =>
                    consecutiveFailures += 1
                    if (consecutiveFailures >= agent.maxConsecutiveFailures)
                      return AgentResult("FAILED", s"tool '$toolName' failed ${consecutiveFailures}x: ${e.getMessage}")
                    s"ERROR: ${e.getMessage}"
                }
              messages :+= Message("tool", obs)
            case None =>
              consecutiveFailures += 1
              if (consecutiveFailures >= agent.maxConsecutiveFailures)
                return AgentResult("FAILED", s"unknown tool '$toolName'")
              messages :+= Message("tool", s"ERROR: unknown tool '$toolName'")
          }
        case finalAnswer =>
          return AgentResult("SUCCESS", finalAnswer)
      }
    }
    AgentResult("MAX_ITERATIONS", messages.lastOption.map(_.content).getOrElse(""))
  }

  /** Single-shot tool-calling (AI_TOOL_INVOKE, LAB1-Walkthrough.md:80-91):
    * one model turn, at most one tool execution, one concluding turn.
    */
  def invokeOnce(agent: AgentDefinition, prompt: String): AgentResult =
    run(agent.copy(maxIterations = 2), prompt)

  /** DataFrame stage: adds `<prefix>_status` and `<prefix>_response` columns.
    * mapPartitions (not a UDF) so per-partition setup — HTTP clients, tool
    * connections — happens once per task, and batching/concurrency can be
    * tuned without touching the plan.
    */
  def runOnColumn(df: DataFrame, agent: AgentDefinition, promptCol: String,
                  prefix: String = "agent"): DataFrame = {
    val schema: StructType = df.schema
      .add(s"${prefix}_status", StringType)
      .add(s"${prefix}_response", StringType)
    val idx = df.schema.fieldIndex(promptCol)
    df.mapPartitions { it =>
      it.map { r =>
        val res = run(agent, Option(r.getString(idx)).getOrElse(""))
        Row.fromSeq(r.toSeq :+ res.status :+ res.response)
      }
    }(Encoders.row(schema))
  }

  /** Bounded-concurrency variant of [[runOnColumn]]: `concurrency` agent loops
    * in flight per task, order-preserving (sliding window, pool released via
    * task-completion listener, per-run timeout). Agent runs are latency-bound
    * (model + tool round-trips, 30 s/call in the reference) — overlapping them
    * is the difference between a partition of N rows costing N·latency and
    * ~N/concurrency·avg-latency. A model/tool exception becomes a FAILED row,
    * not a task failure. Shared machinery: core.ConcurrentPartitions.
    */
  def runOnColumnConcurrent(df: DataFrame, agent: AgentDefinition, promptCol: String,
                            prefix: String = "agent", concurrency: Int = 8,
                            timeout: scala.concurrent.duration.FiniteDuration =
                              graft.core.ConcurrentPartitions.DefaultTimeout): DataFrame = {
    val schema: StructType = df.schema
      .add(s"${prefix}_status", StringType)
      .add(s"${prefix}_response", StringType)
    val idx = df.schema.fieldIndex(promptCol)
    graft.core.ConcurrentPartitions.mapConcurrent(df, schema, concurrency, timeout) { r =>
      val res =
        try run(agent, Option(r.getString(idx)).getOrElse(""))
        catch { case e: Exception => AgentResult("FAILED", s"agent error: ${e.getMessage}") }
      Seq(res.status, res.response)
    }
  }
}

// ------------------------------------------------------------------ catalogs

object ToolCatalog {
  private val tools = scala.collection.concurrent.TrieMap[String, Tool]()
  def register(t: Tool): Unit = tools.put(t.name, t)
  def resolve(name: String): Tool = tools.getOrElse(name, sys.error(s"no tool '$name'"))
  def get(name: String): Option[Tool] = tools.get(name)
  def resolveAll(names: Seq[String]): Map[String, Tool] = names.map(n => n -> resolve(n)).toMap
  def names: Seq[String] = tools.keys.toSeq.sorted
}

object AgentCatalog {
  private val agents = scala.collection.concurrent.TrieMap[String, AgentDefinition]()
  def register(a: AgentDefinition): Unit = agents.put(a.name, a)
  def resolve(name: String): AgentDefinition = agents.getOrElse(name, sys.error(s"no agent '$name'"))
  def get(name: String): Option[AgentDefinition] = agents.get(name)
  def names: Seq[String] = agents.keys.toSeq.sorted
}

/** Connection registry (CREATE CONNECTION analog — MCP/MongoDB/Bedrock/… are
  * just config bags resolved by provider code).
  */
object ConnectionCatalog {
  final case class Connection(name: String, connType: String, endpoint: String, options: Map[String, String] = Map.empty)
  private val conns = scala.collection.concurrent.TrieMap[String, Connection]()
  def register(c: Connection): Unit = conns.put(c.name, c)
  def resolve(name: String): Connection = conns.getOrElse(name, sys.error(s"no connection '$name'"))
  def names: Seq[String] = conns.keys.toSeq.sorted
}

// --------------------------------------------------- deterministic test impls

/** Scripted tools standing in for the reference's MCP tools (http_get,
  * http_post, send_email — LAB1-Walkthrough.md:141-148, LAB3-Walkthrough.md:385-392).
  * Deterministic: output is a pure function of the arguments.
  */
object ScriptedTools {
  final case class HttpGetTool(pages: Map[String, String] = Map.empty) extends Tool {
    val name = "http_get"
    val description = "fetch a web page"
    def invoke(args: String): String =
      pages.getOrElse(args, s"<html>page:${args.hashCode.abs % 1000} price=$$${(args.hashCode.abs % 9000 + 1000) / 100.0}</html>")
  }
  final case class HttpPostTool() extends Tool {
    val name = "http_post"
    val description = "POST to a dispatch endpoint"
    def invoke(args: String): String = s"""{"status":"dispatched","request":${args.length}}"""
  }
  final case class SendEmailTool() extends Tool {
    val name = "send_email"
    val description = "send an email"
    def invoke(args: String): String = s"email sent (${args.length} chars)"
  }
  final case class FailingTool(name: String) extends Tool {
    val description = "always fails"
    def invoke(args: String): String = throw new RuntimeException("tool unavailable")
  }
}

/** Deterministic chat model: calls each allowed tool once (in `script` order),
  * then produces a templated final answer embedding a verdict line — giving
  * downstream regex extraction something stable to parse (the reference
  * parses `**VERDICT**`-style sections, LAB1-Walkthrough.md:202-204,
  * LAB4-Walkthrough.md:405-408).
  */
final case class ScriptedChatModel(name: String, script: Seq[String], verdictFor: String => String)
  extends ChatModel {
  override def chat(system: String, messages: Seq[Message]): String = {
    val toolTurns = messages.count(_.role == "tool")
    if (toolTurns < script.length) {
      val toolName = script(toolTurns)
      val userPrompt = messages.find(_.role == "user").map(_.content).getOrElse("")
      s"TOOL:$toolName ${userPrompt.take(48)}"
    } else {
      val userPrompt = messages.find(_.role == "user").map(_.content).getOrElse("")
      val observations = messages.filter(_.role == "tool").map(_.content).mkString(" | ")
      s"Analysis complete. VERDICT: ${verdictFor(userPrompt)}\nEvidence: ${observations.take(120)}"
    }
  }
}
