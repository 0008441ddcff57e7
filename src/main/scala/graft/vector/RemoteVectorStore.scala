package graft.vector

import scala.concurrent.duration.{DurationInt, FiniteDuration}

import graft.ml.{Http, HttpConfig}

/** Remote vector table client (S4/S5 — MongoDB Atlas / CosmosDB external
  * vector tables, reference: `CREATE TABLE documents_vectordb_lab2 ... WITH
  * ('connector'='mongodb', 'mongodb.collection'=…, 'mongodb.index'=…,
  * 'mongodb.embedding_column'=…, 'mongodb.numCandidates'='500')`,
  * terraform/lab2-vector-search/main.tf:215; CosmosDB variant
  * terraform/lab4-pubsec-fraud-agents/main.tf:164-181).
  *
  * Speaks the Atlas `$vectorSearch` parameter vocabulary over JSON HTTP
  * (`index`, `path`, `queryVector`, `numCandidates`, `limit`) and expects
  * `{"results":[{"doc_id":…,"chunk":…,"score":…}]}` back. `numCandidates` —
  * the ANN search breadth the reference configures per table — is honored on
  * every request (clamped to ≥ k, as Atlas requires).
  *
  * Plugs in behind [[VectorStore]], so `VectorSearchAgg` runs identically over
  * a broadcast store, the distributed knn, or a remote collection; executes
  * inside tasks (Serializable config; shared per-JVM [[Http]] client).
  */
final case class RemoteVectorStore(endpoint: String,
                                   database: String,
                                   collection: String,
                                   index: String,
                                   embeddingColumn: String = "embedding",
                                   numCandidates: Int = 500,
                                   timeout: FiniteDuration = 30.seconds) extends VectorStore {

  private def cfg = HttpConfig(endpoint, model = s"vectordb:$database.$collection", timeout = timeout)

  override def search(query: Array[Float], k: Int): Seq[ScoredDoc] = {
    val m = Http.mapper
    val body = m.createObjectNode()
    body.put("database", database)
    body.put("collection", collection)
    body.put("index", index)
    body.put("path", embeddingColumn)
    val qv = body.putArray("queryVector")
    query.foreach(qv.add)
    body.put("limit", k)
    body.put("numCandidates", math.max(numCandidates, k))
    val resp = Http.postJson(cfg, "", body)
    val results = resp.path("results")
    (0 until results.size()).map { i =>
      val r = results.path(i)
      ScoredDoc(r.path("doc_id").asLong(), r.path("chunk").asText(), r.path("score").asDouble())
    }
  }
}

/** Vector-table registry: `CREATE TABLE ... 'connector'='mongodb'` lands here
  * so `VECTOR_SEARCH_AGG(tableName, …)` can resolve the store by name.
  */
object VectorTableCatalog {
  private val stores = scala.collection.concurrent.TrieMap[String, VectorStore]()
  def register(name: String, store: VectorStore): Unit = stores.put(name, store)
  def resolve(name: String): VectorStore = stores.getOrElse(name, sys.error(s"no vector table '$name'"))
  def drop(name: String): Unit = stores.remove(name)
}
