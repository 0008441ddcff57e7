package graft.streaming

import java.io.ByteArrayOutputStream
import java.time.{LocalDateTime, ZoneOffset}

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.api.java.{UDF1, UDF2}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Native Avro wire-format payload serde for the Kafka path (S1/S2).
  *
  * The reference publishes every topic as Confluent-framed Avro — magic byte
  * 0x00 + big-endian schema id + Avro-binary body (reference:
  * scripts/publish_lab3_data.py:96-122, scripts/lab4_datagen.py:100-147,
  * testing/helpers/kafka_helper.py:70-86). [[KafkaIO.confluentFrame]] handles
  * the envelope; this object encodes/decodes the body itself, with no
  * spark-avro dependency (only avro-core, which ships in every Spark distro).
  *
  * Schema mapping covers the shapes the reference actually puts on the wire:
  * primitives (string/int/long/float/double/boolean/bytes), nullable fields as
  * `["null", T]` unions with default null (lab4 claims schema), timestamps as
  * long + `timestamp-millis`/`timestamp-micros` logical types (Spark
  * timestamps are µs; millis-typed wire values are widened on read and
  * truncated on write, matching the reference's epoch-millis convention), and
  * `ARRAY<FLOAT>` embeddings.
  *
  * Executor-side state: the codec ships the schema as its JSON string (Avro
  * `Schema` predates Serializable) and re-parses lazily per JVM.
  */
object AvroSerde {

  /** Spark StructType → Avro record schema. Nullable fields become
    * `["null", T]` unions with default null, mirroring the reference's
    * Flink-generated schemas (scripts/lab4_datagen.py:100-123).
    */
  def avroSchema(st: StructType, name: String = "value",
                 namespace: String = "org.apache.flink.avro.generated.record",
                 timestampMillis: Boolean = false): Schema = {
    val fields = st.fields.map { f =>
      val base = avroType(f.dataType, s"${name}_${f.name}", namespace, timestampMillis)
      val typ =
        if (f.nullable) Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), base))
        else base
      val default = if (f.nullable) org.apache.avro.JsonProperties.NULL_VALUE else null
      new Schema.Field(f.name, typ, null, default)
    }
    Schema.createRecord(name, null, namespace, false, fields.toSeq.asJava)
  }

  private def avroType(dt: DataType, name: String, ns: String, tsMillis: Boolean): Schema = dt match {
    case StringType  => Schema.create(Schema.Type.STRING)
    case IntegerType => Schema.create(Schema.Type.INT)
    case LongType    => Schema.create(Schema.Type.LONG)
    case FloatType   => Schema.create(Schema.Type.FLOAT)
    case DoubleType  => Schema.create(Schema.Type.DOUBLE)
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case BinaryType  => Schema.create(Schema.Type.BYTES)
    case DateType    => LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case TimestampType =>
      val lt = if (tsMillis) LogicalTypes.timestampMillis() else LogicalTypes.timestampMicros()
      lt.addToSchema(Schema.create(Schema.Type.LONG))
    case TimestampNTZType =>
      val lt = if (tsMillis) LogicalTypes.localTimestampMillis() else LogicalTypes.localTimestampMicros()
      lt.addToSchema(Schema.create(Schema.Type.LONG))
    case ArrayType(elem, containsNull) =>
      val e = avroType(elem, s"${name}_item", ns, tsMillis)
      Schema.createArray(
        if (containsNull) Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), e)) else e)
    case st: StructType => avroSchema(st, name, ns, tsMillis)
    case other => throw new IllegalArgumentException(s"unsupported Spark type for Avro serde: $other")
  }

  /** Row ↔ Avro-binary codec for one schema. Serializable; closes over JSON
    * schema text + the Spark schema only. When `writerJson` is given (consume
    * side with a registry-resolved writer schema), decoding applies standard
    * Avro schema RESOLUTION: bytes written with the writer schema are read
    * into the reader schema — new nullable fields take their defaults,
    * removed fields are skipped.
    */
  final class RowCodec(val sparkSchema: StructType, val schemaJson: String,
                       val writerJson: Option[String] = None) extends Serializable {

    @transient private lazy val schema: Schema = new Schema.Parser().parse(schemaJson)
    @transient private lazy val writerSchema: Option[Schema] =
      writerJson.map(new Schema.Parser().parse(_))
    @transient private lazy val writer = new GenericDatumWriter[GenericRecord](schema)
    @transient private lazy val reader = writerSchema match {
      case Some(w) =>
        // record NAMES only gate matching, fields drive resolution — alias the
        // reader to whatever name the producer registered so real-world
        // subjects (e.g. 'ClaimRecord') resolve instead of AvroTypeException
        if (w.getType == Schema.Type.RECORD && schema.getType == Schema.Type.RECORD &&
            w.getFullName != schema.getFullName)
          schema.addAlias(w.getName, w.getNamespace)
        new GenericDatumReader[GenericRecord](w, schema)
      case None => new GenericDatumReader[GenericRecord](schema)
    }

    def encode(row: Row): Array[Byte] = {
      val rec = toRecord(row, sparkSchema, schema)
      val out = new ByteArrayOutputStream(64)
      val enc = EncoderFactory.get().binaryEncoder(out, null)
      writer.write(rec, enc)
      enc.flush()
      out.toByteArray
    }

    def decode(bytes: Array[Byte]): Row = {
      val dec = DecoderFactory.get().binaryDecoder(bytes, null)
      val rec = reader.read(null, dec)
      fromRecord(rec, sparkSchema, schema, writerSchema)
    }

    /** The WRITER's schema for a field (at ANY nesting depth): resolution
      * passes raw longs through, so timestamp logical types (millis vs
      * micros) must be interpreted per the schema the bytes were WRITTEN
      * with — a millis writer decoded with a micros reader would land in
      * 1970. Fields absent from the writer came from reader defaults → None
      * (reader schema applies).
      */
    private def writerField(wOpt: Option[Schema], name: String): Option[Schema] =
      wOpt
        .flatMap(w => Option(if (w.getType == Schema.Type.RECORD) w.getField(name) else null))
        .map(f => nonNull(f.schema()))

    private def toRecord(row: Row, st: StructType, sch: Schema): GenericRecord = {
      val rec = new GenericData.Record(sch)
      var i = 0
      while (i < st.length) {
        val f = st.fields(i)
        val v = if (row.isNullAt(i)) null else toDatum(row.get(i), f.dataType, nonNull(sch.getFields.get(i).schema()))
        rec.put(i, v)
        i += 1
      }
      rec
    }

    private def nonNull(s: Schema): Schema =
      if (s.getType == Schema.Type.UNION) s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get else s

    private def toDatum(v: Any, dt: DataType, sch: Schema): AnyRef = (dt, v) match {
      case (StringType, s: String)   => s
      case (IntegerType, i: Int)     => Int.box(i)
      case (LongType, l: Long)       => Long.box(l)
      case (FloatType, f: Float)     => Float.box(f)
      case (DoubleType, d: Double)   => Double.box(d)
      case (BooleanType, b: Boolean) => Boolean.box(b)
      case (BinaryType, b: Array[Byte]) => java.nio.ByteBuffer.wrap(b)
      case (DateType, d: java.sql.Date) => Int.box(d.toLocalDate.toEpochDay.toInt)
      case (TimestampType, t: java.sql.Timestamp) =>
        val micros = t.getTime * 1000L + (t.getNanos % 1000000L) / 1000L
        Long.box(if (isMillis(sch)) micros / 1000L else micros)
      case (TimestampNTZType, t: LocalDateTime) =>
        val micros = t.toEpochSecond(ZoneOffset.UTC) * 1000000L + t.getNano / 1000L
        Long.box(if (isMillis(sch)) micros / 1000L else micros)
      case (ArrayType(elem, _), xs: scala.collection.Seq[_]) =>
        val es = nonNull(sch.getElementType)
        xs.map(x => if (x == null) null else toDatum(x, elem, es)).asJava
      case (st: StructType, r: Row) => toRecord(r, st, sch)
      case (other, x) => throw new IllegalArgumentException(s"cannot encode $x as $other")
    }

    private def isMillis(s: Schema): Boolean = s.getLogicalType match {
      case _: LogicalTypes.TimestampMillis | _: LogicalTypes.LocalTimestampMillis => true
      case _ => false
    }

    private def fromRecord(rec: GenericRecord, st: StructType, sch: Schema,
                           wOpt: Option[Schema]): Row = {
      val vals = new Array[Any](st.length)
      var i = 0
      while (i < st.length) {
        val f = st.fields(i)
        val raw = rec.get(i)
        val fieldSch = nonNull(sch.getFields.get(i).schema())
        vals(i) =
          if (raw == null) null
          else fromDatum(raw, f.dataType, fieldSch, writerField(wOpt, f.name))
        i += 1
      }
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(vals, st)
    }

    /** `wOpt` = the writer's schema for this value, threaded through EVERY
      * nesting level (records, arrays) so millis-vs-micros interpretation is
      * always the writer's — a nested timestamp-millis field decoded per the
      * reader's micros type would be silently 1000× off.
      */
    private def fromDatum(v: AnyRef, dt: DataType, sch: Schema, wOpt: Option[Schema]): Any = (dt, v) match {
      case (StringType, s) => s.toString // Utf8 or String
      case (IntegerType, i: java.lang.Integer) => i.intValue()
      case (LongType, l: java.lang.Long)       => l.longValue()
      case (FloatType, f: java.lang.Float)     => f.floatValue()
      case (DoubleType, d: java.lang.Double)   => d.doubleValue()
      case (BooleanType, b: java.lang.Boolean) => b.booleanValue()
      case (BinaryType, b: java.nio.ByteBuffer) =>
        val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
      case (DateType, i: java.lang.Integer) => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i.longValue()))
      case (TimestampType, l: java.lang.Long) =>
        val micros = if (isMillis(wOpt.getOrElse(sch))) l * 1000L else l.longValue()
        val t = new java.sql.Timestamp(Math.floorDiv(micros, 1000L))
        t.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
        t
      case (TimestampNTZType, l: java.lang.Long) =>
        val micros = if (isMillis(wOpt.getOrElse(sch))) l * 1000L else l.longValue()
        LocalDateTime.ofEpochSecond(Math.floorDiv(micros, 1000000L),
          (Math.floorMod(micros, 1000000L) * 1000L).toInt, ZoneOffset.UTC)
      case (ArrayType(elem, _), xs: java.util.Collection[_]) =>
        val es = nonNull(sch.getElementType)
        val wes = wOpt.filter(_.getType == Schema.Type.ARRAY).map(w => nonNull(w.getElementType))
        xs.asScala.map(x => if (x == null) null else fromDatum(x.asInstanceOf[AnyRef], elem, es, wes)).toSeq
      case (st: StructType, r: GenericRecord) => fromRecord(r, st, sch, wOpt)
      case (other, x) => throw new IllegalArgumentException(s"cannot decode ${x.getClass} as $other")
    }
  }

  def codec(st: StructType, timestampMillis: Boolean = false): RowCodec =
    new RowCodec(st, avroSchema(st, timestampMillis = timestampMillis).toString)

  // ------------------------------------------------------------- DataFrame API

  /** All columns → one Confluent-framed Avro `value` column (plus optional
    * string `key`), mirroring [[KafkaIO.toJsonValue]].
    */
  def toAvroValue(df: DataFrame, keyCol: Option[String], schemaId: Int,
                  timestampMillis: Boolean = false): DataFrame = {
    val st = df.schema
    val c = codec(st, timestampMillis)
    val enc = udf(new UDF1[Row, Array[Byte]] {
      override def call(r: Row): Array[Byte] = KafkaIO.confluentFrame(schemaId, c.encode(r))
    }, BinaryType)
    val value = enc(struct(df.columns.map(col): _*)).as("value")
    keyCol match {
      case Some(k) => df.select(col(k).cast("string").as("key"), value)
      case None    => df.select(value)
    }
  }

  /** Confluent-framed Avro `value` column → typed columns (the inverse of
    * [[toAvroValue]]), mirroring [[KafkaIO.fromJsonValue]].
    */
  def fromAvroValue(df: DataFrame, st: StructType, timestampMillis: Boolean = false): DataFrame = {
    val c = codec(st, timestampMillis)
    decodeFrames(df, st, _ => c)
  }

  /** Shared frame-decoding plumbing: unframe, look up a codec for the frame's
    * schema id, decode. Null Kafka values (compaction tombstones) yield a
    * null row — all-null columns downstream — instead of an executor NPE.
    */
  private[streaming] def decodeFrames(df: DataFrame, st: StructType,
                                      codecFor: Int => RowCodec): DataFrame = {
    val dec = udf(new UDF1[Row, Row] {
      override def call(framed: Row): Row = {
        val bytes = framed.getAs[Array[Byte]](0)
        if (bytes == null) null
        else {
          val (id, body) = KafkaIO.confluentUnframe(bytes)
          codecFor(id).decode(body)
        }
      }
    }, st)
    df.select(dec(struct(col("value"))).as("r")).select("r.*")
  }
}
