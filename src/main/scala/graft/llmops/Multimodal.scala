package graft.llmops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque `BINARY` columns with typed
  * metadata, processed per-partition in bounded batches.
  *
  * The decode kernels themselves are STUBBED (image/audio codecs are not in
  * this environment) behind [[MediaCodec]] — deterministic fakes that preserve
  * the real contract: batch-in/batch-out, fixed output schema, bounded memory.
  * The Spark-side plumbing (schema, partitioning, batch shape) is real and
  * tested; swapping in a real codec touches only MediaCodec.
  *
  * Scale design: media bytes never pass through a shuffle — feature extraction
  * happens in the scan stage (mapPartitions directly over the source), and only
  * compact features/metadata flow downstream.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image | audio | video
    StructField("content", BinaryType, nullable = true),
    StructField("meta", MapType(StringType, StringType), nullable = true)))

  /** Decode/feature kernels. Replace the fakes with real codecs in production. */
  trait MediaCodec extends Serializable {
    def imageFeatures(bytes: Array[Byte]): (Int, Int, Array[Float]) // (width, height, feature vec)
    def audioDurationMs(bytes: Array[Byte]): Long
    def videoFrameSample(bytes: Array[Byte], everyNthFrame: Int): Seq[Array[Byte]]
  }

  /** Deterministic fake: "decodes" dimensions and features from a stable hash
    * of the payload. Keeps every pipeline around it testable end-to-end.
    */
  object FakeCodec extends MediaCodec {
    private def h(bytes: Array[Byte], salt: Int): Long =
      java.util.Arrays.hashCode(bytes).toLong * 31 + salt
    def imageFeatures(bytes: Array[Byte]): (Int, Int, Array[Float]) = {
      val w = (math.floorMod(h(bytes, 1), 1920) + 1).toInt
      val ht = (math.floorMod(h(bytes, 2), 1080) + 1).toInt
      val feat = Array.tabulate(8)(i => (math.floorMod(h(bytes, 10 + i), 2000) / 1000.0f) - 1f)
      (w, ht, feat)
    }
    def audioDurationMs(bytes: Array[Byte]): Long = math.floorMod(h(bytes, 3), 600000L)
    def videoFrameSample(bytes: Array[Byte], everyNthFrame: Int): Seq[Array[Byte]] =
      (0 until 3).map(i => Array[Byte]((h(bytes, 20 + i) % 127).toByte))
  }

  /** Image feature extraction: binary in, (width, height, features) appended.
    * mapPartitions in batches — the real-codec path would decode `batchSize`
    * images at a time (bounded memory) per task.
    */
  def extractImageFeatures(df: DataFrame, contentCol: String, codec: MediaCodec = FakeCodec,
                           batchSize: Int = 16): DataFrame = {
    val schema = df.schema
      .add("width", IntegerType).add("height", IntegerType)
      .add("features", ArrayType(FloatType))
    val idx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val bytes = r.getAs[Array[Byte]](idx)
          val (w, h, feat) = codec.imageFeatures(if (bytes == null) Array.emptyByteArray else bytes)
          Row.fromSeq(r.toSeq :+ w :+ h :+ feat.toSeq)
        }
      }
    }(Encoders.row(schema))
  }

  /** Synthesize a deterministic media table from the documents table (test
    * fixture: payload bytes derived from doc text).
    */
  def syntheticMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("media_type"),
      encode(col(textCol), "UTF-8").as("content"),
      map(lit("source"), lit("synthetic")).as("meta"))
}
