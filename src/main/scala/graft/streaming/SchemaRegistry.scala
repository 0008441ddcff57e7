package graft.streaming

import scala.concurrent.duration.{DurationInt, FiniteDuration}

import graft.ml.{Http, HttpConfig}

/** Confluent Schema Registry client, minimal surface (reference: every
  * publisher registers its Avro schema and frames messages with the returned
  * id — scripts/publish_lab3_data.py:33-35, scripts/lab4_datagen.py:84-95;
  * wire endpoints are the public REST API: POST /subjects/{s}/versions,
  * GET /schemas/ids/{id}).
  *
  * Both directions are cached per client (the registry is immutable per
  * (subject, schema) pair), so steady-state publishing/consuming performs no
  * HTTP at all — the id travels in the Confluent frame and resolves locally.
  */
final case class SchemaRegistryClient(baseUrl: String,
                                      timeout: FiniteDuration = 10.seconds) {
  import SchemaRegistryClient.{idBySchema, schemaById}

  private def cfg = HttpConfig(baseUrl, model = "schema-registry", timeout = timeout)

  /** Register (idempotently) and return the schema id for a subject. */
  def register(subject: String, schemaJson: String): Int =
    idBySchema.getOrElseUpdate((baseUrl, subject, schemaJson), {
      val m = Http.mapper
      val body = m.createObjectNode()
      body.put("schema", schemaJson)
      val resp = Http.postJson(cfg, s"/subjects/$subject/versions", body)
      val id = resp.path("id").asInt(-1)
      require(id >= 0, s"schema registry returned no id for subject '$subject'")
      schemaById.put((baseUrl, id), schemaJson)
      id
    })

  /** Resolve a schema by the id carried in a Confluent frame. */
  def getById(id: Int): String =
    schemaById.getOrElseUpdate((baseUrl, id), {
      val resp = Http.getJson(cfg, s"/schemas/ids/$id")
      val schema = resp.path("schema").asText("")
      require(schema.nonEmpty, s"schema registry has no schema for id $id")
      schema
    })
}

object SchemaRegistryClient {
  // JVM-level caches keyed by registry url: task-deserialized client
  // instances share them, so an executor fetches each schema id ONCE, not
  // once per task/micro-batch partition (the registry is immutable per id)
  private val idBySchema = scala.collection.concurrent.TrieMap.empty[(String, String, String), Int]
  private val schemaById = scala.collection.concurrent.TrieMap.empty[(String, Int), String]
}

object SchemaRegistry {

  /** Publish-side composition: derive the Avro schema from the frame, register
    * it under `subject` (ONCE, on the driver), and emit Confluent-framed Avro
    * with the registry-assigned id — the exact wire contract of the
    * reference's AvroSerializer publishers.
    */
  def toAvroValueRegistered(df: org.apache.spark.sql.DataFrame, keyCol: Option[String],
                            subject: String, client: SchemaRegistryClient,
                            timestampMillis: Boolean = false): (Int, org.apache.spark.sql.DataFrame) = {
    val schemaJson = AvroSerde.avroSchema(df.schema, timestampMillis = timestampMillis).toString
    val id = client.register(subject, schemaJson)
    (id, AvroSerde.toAvroValue(df, keyCol, id, timestampMillis))
  }

  /** Consume-side composition: each frame's schema id resolves to its WRITER
    * schema through the registry (cached per executor after the first hit),
    * and the Avro reader applies standard schema resolution against the
    * target — so topics whose producers evolved their schema (new nullable
    * fields with defaults, dropped fields) decode into one target shape, the
    * exact contract of the reference's AvroDeserializer consumers.
    */
  def fromAvroValueResolving(df: org.apache.spark.sql.DataFrame,
                             targetSchema: org.apache.spark.sql.types.StructType,
                             client: SchemaRegistryClient,
                             timestampMillis: Boolean = false): org.apache.spark.sql.DataFrame = {
    val readerJson = AvroSerde.avroSchema(targetSchema, timestampMillis = timestampMillis).toString
    val codecByWriter = scala.collection.concurrent.TrieMap.empty[Int, AvroSerde.RowCodec]
    AvroSerde.decodeFrames(df, targetSchema, id =>
      codecByWriter.getOrElseUpdate(id,
        new AvroSerde.RowCodec(targetSchema, readerJson, writerJson = Some(client.getById(id)))))
  }
}
