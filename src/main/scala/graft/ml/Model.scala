package graft.ml

import scala.util.hashing.MurmurHash3

/** Model abstractions for ML_PREDICT (reference: CREATE MODEL,
  * terraform/core/main.tf:461,495,529,563; invocation LAB1-Walkthrough.md:70,
  * terraform/lab2-vector-search/main.tf:253,331).
  *
  * Providers are row-local and Serializable: they execute inside tasks
  * (UDF or mapPartitions), never on the driver — at 100 TB the model-call
  * stage is embarrassingly partition-parallel with no driver bottleneck.
  * Remote (HTTP) providers implement the batch methods so `mapPartitions`
  * can amortise round-trips; local deterministic models serve the
  * correctness suite (SURVEY.md §7.4 item 7).
  */
trait TextGenModel extends Serializable {
  def name: String
  def generate(prompt: String): String
  def generateBatch(prompts: Seq[String]): Seq[String] = prompts.map(generate)
}

trait EmbeddingModel extends Serializable {
  def name: String
  def dim: Int
  def embed(text: String): Array[Float]
  def embedBatch(texts: Seq[String]): Seq[Array[Float]] = texts.map(embed)
}

/** Chat interface used by the agent runtime (AI_RUN_AGENT / AI_TOOL_INVOKE). */
case class Message(role: String, content: String)

trait ChatModel extends Serializable {
  def name: String
  def chat(system: String, messages: Seq[Message]): String
}

/** Deterministic feature-hash embedding: each token lands in a signed bucket,
  * vector L2-normalised. Stable across JVMs (MurmurHash3 with fixed seed).
  */
final case class LocalHashEmbedding(name: String, dim: Int = 64, seed: Int = 42) extends EmbeddingModel {
  override def embed(text: String): Array[Float] = {
    val v = new Array[Float](dim)
    var i = 0
    val toks = text.trim.split("\\s+")
    while (i < toks.length) {
      val h = MurmurHash3.stringHash(toks(i), seed)
      val idx = math.floorMod(h, dim)
      v(idx) += (if ((h >>> 31) == 1) -1f else 1f)
      i += 1
    }
    val n = math.sqrt(v.map(x => x.toDouble * x).sum)
    if (n > 0) v.map(x => (x / n).toFloat) else v
  }
}

/** Deterministic template text generation: echoes a bounded summary of the
  * prompt. Stands in for Bedrock/AzureOpenAI textgen in the correctness suite.
  */
final case class LocalTemplateTextGen(name: String) extends TextGenModel {
  override def generate(prompt: String): String = {
    val toks = prompt.trim.split("\\s+")
    val head = toks.take(12).mkString(" ")
    s"[$name] summary(${toks.length} tokens): $head"
  }
}

/** Registry for models resolved by name (the `CREATE MODEL` catalog analog). */
object ModelCatalog {
  private val embedders = scala.collection.concurrent.TrieMap[String, EmbeddingModel](
    "local-embed-64" -> LocalHashEmbedding("local-embed-64"))
  private val textgens = scala.collection.concurrent.TrieMap[String, TextGenModel](
    "local-textgen" -> LocalTemplateTextGen("local-textgen"))
  private val chats = scala.collection.concurrent.TrieMap[String, ChatModel]()

  def registerEmbedding(m: EmbeddingModel): Unit = embedders.put(m.name, m)
  def registerTextGen(m: TextGenModel): Unit = textgens.put(m.name, m)
  def registerChat(m: ChatModel): Unit = chats.put(m.name, m)
  /** Driver-side immutable snapshots for capture in executor-bound closures
    * (the TrieMap itself is JVM-local; see GraftExtensions.registerModelUdfs). */
  def textGenSnapshot: Map[String, TextGenModel] = textgens.toMap
  def embeddingSnapshot: Map[String, EmbeddingModel] = embedders.toMap
  /** The task kinds a name is registered under (DESCRIBE MODEL surface). */
  def kindsOf(name: String): Seq[String] =
    (if (textgens.contains(name)) Seq("text_generation") else Nil) ++
      (if (embedders.contains(name)) Seq("embedding") else Nil) ++
      (if (chats.contains(name)) Seq("chat") else Nil)
  def names: Seq[String] = (textgens.keys ++ embedders.keys ++ chats.keys).toSeq.distinct.sorted
  def embedding(name: String): EmbeddingModel = embedders.getOrElse(name, sys.error(s"no embedding model '$name'"))
  def textGen(name: String): TextGenModel = textgens.getOrElse(name, sys.error(s"no textgen model '$name'"))
  def chat(name: String): ChatModel = chats.getOrElse(name, sys.error(s"no chat model '$name'"))
}
