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
  * compact features/metadata flow downstream. ONE sanctioned exception: when
  * the source layout is non-splittable (single parquet row group — see
  * [[graft.core.Parallelism.defend]]), the kernels round-robin the payload
  * once before decoding; serial decode of a 1-split source is strictly worse
  * than one redistribution pass, and on healthy layouts the defense is a no-op.
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
    /** Bounded-box resize: returns (resized bytes, new width, new height). */
    def imageResize(bytes: Array[Byte], maxW: Int, maxH: Int): (Array[Byte], Int, Int)
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
    def imageResize(bytes: Array[Byte], maxW: Int, maxH: Int): (Array[Byte], Int, Int) = {
      // fake resize preserves the REAL contract: aspect-ratio-preserving
      // bounded box, output no larger than input, deterministic bytes
      val (w, ht, _) = imageFeatures(bytes)
      val scale = math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / ht))
      val (nw, nh) = (math.max(1, (w * scale).toInt), math.max(1, (ht * scale).toInt))
      val outLen = math.max(1, math.min(bytes.length, (bytes.length * scale).toInt))
      (bytes.take(outLen), nw, nh)
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
    val in = graft.core.Parallelism.defend(df)
    in.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          // NULL media stays NULL-marked: fabricating dims for missing bytes
          // would erase the `content IS NULL` dead-letter signal downstream
          if (r.isNullAt(idx)) Row.fromSeq(r.toSeq :+ null :+ null :+ null)
          else {
            val (w, h, feat) = codec.imageFeatures(r.getAs[Array[Byte]](idx))
            Row.fromSeq(r.toSeq :+ w :+ h :+ feat.toSeq)
          }
        }
      }
    }(Encoders.row(schema))
  }

  /** Bounded-box image resize: binary in, binary out plus the new dimensions.
    * Same batch discipline as [[extractImageFeatures]]; the resized bytes
    * REPLACE the content column (the common "thumbnail for the embedding
    * model" shape — never carry both payloads through the pipeline).
    */
  def resizeImages(df: DataFrame, contentCol: String, maxW: Int, maxH: Int,
                   codec: MediaCodec = FakeCodec, batchSize: Int = 16): DataFrame = {
    require(maxW >= 1 && maxH >= 1, s"bad bounding box ${maxW}x$maxH")
    val schema = df.schema.add("width", IntegerType).add("height", IntegerType)
    val idx = df.schema.fieldIndex(contentCol)
    val in = graft.core.Parallelism.defend(df)
    in.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          // NULL payload passes through NULL (see extractImageFeatures)
          if (r.isNullAt(idx)) Row.fromSeq(r.toSeq :+ null :+ null)
          else {
            val (out, w, h) = codec.imageResize(r.getAs[Array[Byte]](idx), maxW, maxH)
            Row.fromSeq(r.toSeq.updated(idx, out) :+ w :+ h)
          }
        }
      }
    }(Encoders.row(schema))
  }

  /** Audio feature extraction: duration appended, batch-bounded like the
    * image path (a real codec parses headers/frames per batch).
    */
  def extractAudioFeatures(df: DataFrame, contentCol: String, codec: MediaCodec = FakeCodec,
                           batchSize: Int = 16): DataFrame = {
    val schema = df.schema.add("duration_ms", LongType)
    val idx = df.schema.fieldIndex(contentCol)
    val in = graft.core.Parallelism.defend(df)
    in.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          if (r.isNullAt(idx)) Row.fromSeq(r.toSeq :+ null)
          else Row.fromSeq(r.toSeq :+ codec.audioDurationMs(r.getAs[Array[Byte]](idx)))
        }
      }
    }(Encoders.row(schema))
  }

  /** Video frame sampling: each video row explodes into its sampled frames —
    * (original columns minus the video payload) + (frame_idx, frame BINARY).
    * The video bytes are consumed IN the scan stage and never emitted: only
    * the (much smaller) frames flow downstream, preserving the family's
    * media-never-shuffles rule.
    */
  def sampleVideoFrames(df: DataFrame, contentCol: String, everyNthFrame: Int,
                        codec: MediaCodec = FakeCodec, batchSize: Int = 16): DataFrame = {
    require(everyNthFrame >= 1, s"everyNthFrame must be >= 1, got $everyNthFrame")
    val idx = df.schema.fieldIndex(contentCol)
    val kept = df.schema.fields.zipWithIndex.filter(_._2 != idx)
    val schema = StructType(kept.map(_._1))
      .add("frame_idx", IntegerType).add("frame", BinaryType)
    val in = graft.core.Parallelism.defend(df)
    in.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.flatMap { r =>
          // NULL video has nothing to sample: zero frame rows, not fabricated ones
          if (r.isNullAt(idx)) Seq.empty[Row]
          else {
            val base = kept.map { case (_, i) => r.get(i) }.toSeq
            codec.videoFrameSample(r.getAs[Array[Byte]](idx), everyNthFrame)
              .zipWithIndex.map { case (frame, i) => Row.fromSeq(base :+ i :+ frame) }
          }
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
