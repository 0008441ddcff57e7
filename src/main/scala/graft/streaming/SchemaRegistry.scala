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

  @transient private lazy val idBySchema =
    scala.collection.concurrent.TrieMap.empty[(String, String), Int]
  @transient private lazy val schemaById =
    scala.collection.concurrent.TrieMap.empty[Int, String]

  private def cfg = HttpConfig(baseUrl, model = "schema-registry", timeout = timeout)

  /** Register (idempotently) and return the schema id for a subject. */
  def register(subject: String, schemaJson: String): Int =
    idBySchema.getOrElseUpdate((subject, schemaJson), {
      val m = Http.mapper
      val body = m.createObjectNode()
      body.put("schema", schemaJson)
      val resp = Http.postJson(cfg, s"/subjects/$subject/versions", body)
      val id = resp.path("id").asInt(-1)
      require(id >= 0, s"schema registry returned no id for subject '$subject'")
      schemaById.put(id, schemaJson)
      id
    })

  /** Resolve a schema by the id carried in a Confluent frame. */
  def getById(id: Int): String =
    schemaById.getOrElseUpdate(id, {
      val resp = Http.getJson(cfg, s"/schemas/ids/$id")
      val schema = resp.path("schema").asText("")
      require(schema.nonEmpty, s"schema registry has no schema for id $id")
      schema
    })
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
    import org.apache.spark.sql.functions.{col, struct, udf}
    val readerJson = AvroSerde.avroSchema(targetSchema, timestampMillis = timestampMillis).toString
    val dec = udf(new org.apache.spark.sql.api.java.UDF1[org.apache.spark.sql.Row, org.apache.spark.sql.Row] {
      @transient private lazy val codecByWriter =
        scala.collection.concurrent.TrieMap.empty[Int, AvroSerde.RowCodec]
      override def call(framed: org.apache.spark.sql.Row): org.apache.spark.sql.Row = {
        val (id, body) = KafkaIO.confluentUnframe(framed.getAs[Array[Byte]](0))
        val codec = codecByWriter.getOrElseUpdate(id,
          new AvroSerde.RowCodec(targetSchema, readerJson, writerJson = Some(client.getById(id))))
        codec.decode(body)
      }
    }, targetSchema)
    df.select(dec(struct(col("value"))).as("r")).select("r.*")
  }
}
