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

  private def rawResults(query: Array[Float], k: Int): com.fasterxml.jackson.databind.JsonNode = {
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
    Http.postJson(cfg, "", body).path("results")
  }

  override def search(query: Array[Float], k: Int): Seq[ScoredDoc] = {
    val results = rawResults(query, k)
    (0 until results.size()).map { i =>
      val r = results.path(i)
      ScoredDoc(r.path("doc_id").asLong(), r.path("chunk").asText(), r.path("score").asDouble())
    }
  }

  /** Sink side (S6 — the reference's mongodb/cosmosdb sink connector writing
    * embedded documents into the vector collection,
    * terraform/lab2-vector-search/main.tf:238-263): POST a batch of documents
    * as JSON. Executes inside tasks (foreachPartition), so inserts are
    * partition-parallel with per-batch bounding; the server is expected to
    * upsert by `doc_id`.
    */
  def insert(docs: Seq[ScoredDocUpsert]): Int = {
    if (docs.isEmpty) return 0
    val m = Http.mapper
    val body = m.createObjectNode()
    body.put("database", database)
    body.put("collection", collection)
    val arr = body.putArray("documents")
    docs.foreach { d =>
      val o = arr.addObject()
      o.put("doc_id", d.doc_id)
      o.put("chunk", d.chunk)
      val e = o.putArray(embeddingColumn)
      d.embedding.foreach(e.add)
    }
    Http.postJson(cfg, "/insert", body).path("inserted").asInt(docs.size)
  }

  /** Schema-driven search: results shaped by the table's DECLARED columns
    * (lab4's fema_policies_vectordb carries pages / section_reference / title
    * / fraud_categories / … beyond (id, chunk, score) —
    * terraform/lab4-pubsec-fraud-agents/main.tf:164-181). Each declared field
    * is pulled from the JSON result by name and converted per its type.
    */
  def searchRows(query: Array[Float], k: Int,
                 schema: org.apache.spark.sql.types.StructType): Seq[org.apache.spark.sql.Row] = {
    import org.apache.spark.sql.types._
    val results = rawResults(query, k)
    (0 until results.size()).map { i =>
      val r = results.path(i)
      val vals = schema.fields.map { f =>
        val node = r.path(f.name)
        if (node.isMissingNode || node.isNull) null
        else f.dataType match {
          case StringType  => node.asText()
          case IntegerType => node.asInt()
          case LongType    => node.asLong()
          case FloatType   => node.floatValue()
          case DoubleType  => node.asDouble()
          case BooleanType => node.asBoolean()
          case ArrayType(StringType, _) => (0 until node.size()).map(j => node.path(j).asText())
          case ArrayType(FloatType, _)  => (0 until node.size()).map(j => node.path(j).floatValue())
          case ArrayType(DoubleType, _) => (0 until node.size()).map(j => node.path(j).asDouble())
          case other => throw new IllegalArgumentException(s"unsupported vector-table field type: $other")
        }
      }
      org.apache.spark.sql.Row.fromSeq(vals.toIndexedSeq)
    }
  }
}

/** One document headed for a remote vector collection. Ids are strings — the
  * reference's vector tables declare `document_id STRING`
  * (terraform/lab2-vector-search/main.tf:215); numeric ids stringify.
  */
final case class ScoredDocUpsert(doc_id: String, chunk: String, embedding: Array[Float])

/** Vector-table registry: `CREATE TABLE ... 'connector'='mongodb'` lands here
  * so `VECTOR_SEARCH_AGG(tableName, …)` can resolve the store by name. A
  * declared column schema (minus the embedding column, plus `score`) rides
  * along when the DDL provides one — the SQL rewrite then returns results in
  * exactly the declared shape.
  */
object VectorTableCatalog {
  private val stores = scala.collection.concurrent.TrieMap[String, VectorStore]()
  private val schemas = scala.collection.concurrent.TrieMap[String, org.apache.spark.sql.types.StructType]()
  def register(name: String, store: VectorStore,
               resultSchema: Option[org.apache.spark.sql.types.StructType] = None): Unit = {
    stores.put(name, store)
    resultSchema.foreach(schemas.put(name, _))
  }
  def resolve(name: String): VectorStore = stores.getOrElse(name, sys.error(s"no vector table '$name'"))
  def resultSchema(name: String): Option[org.apache.spark.sql.types.StructType] = schemas.get(name)
  def drop(name: String): Unit = { stores.remove(name); schemas.remove(name) }
}
