package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.llmops.Dedup

/** Continuous near-duplicate INGESTION dedup: each micro-batch of documents
  * is deduplicated within itself (LSH pairs → components → min-id keeper)
  * and against every document KEPT so far, then the survivors land in the
  * sink and their signatures append to a persistent store. The shape a
  * 100 TB training-data pipeline runs in front of its landing zone — dedup
  * before you store, not after.
  *
  * Online semantics (documented, spec-pinned): a greedy first-seen-wins
  * maximal independent set. A new doc is dropped iff it verifies (exact
  * n-gram Jaccard ≥ threshold) against a previously KEPT doc or loses inside
  * its own batch. This differs from batch [[Dedup.resolveKeepers]] on
  * transitive chains (a~b, b~c, a≁c: batch keeps only `a`; the stream keeps
  * `a` and `c` because `b` was never stored) — the standard online-dedup
  * contract, since re-clustering history per batch would be O(corpus).
  *
  * Store layout (at-least-once safe, the [[StreamingRollup]] discipline):
  *  - `store/sigs_b<id>` (band, bucket, doc_id) and `store/sh_b<id>`
  *    (doc_id, sh) — APPEND-ONLY per-batch dirs, written with
  *    mode=overwrite so a re-delivered batch rewrites its own dirs
  *    byte-for-byte instead of duplicating;
  *  - `sink/batch_<id>` — the kept rows of that batch, same idempotence;
  *  - `store/_APPLIED` — atomic pointer to the last fully-applied batch id;
  *    [[applyBatch]] no-ops at-or-below it, and state reads list only dirs
  *    STRICTLY BELOW the current batch, so a torn dir from a crashed attempt
  *    is invisible until its re-delivery overwrites it.
  *
  * Scale notes: candidate generation joins the batch's banded buckets
  * against the store scan; store files are written repartitioned by bucket
  * and sorted BUCKET-MAJOR (bucket, band) — the pushed filter prunes on
  * bucket alone, so bucket must be the monotone column for row-group
  * min/max stats to prune the scan to
  * the buckets the batch actually touches (the batch's bucket set is pushed
  * as an `isin` filter when small). Per batch the work is
  * O(|batch| + touched buckets), never a corpus rescan; the store itself is
  * append-only. In a production deployment the store would be a bucketed
  * table or KV index — this layout is that access path over plain parquet.
  */
object StreamingNearDup {

  private val PTR = "_APPLIED"

  /** Test-only fault injection (RecoverySpec): invoked immediately before
    * the atomic pointer move — the claimed crash window, with the sink and
    * signature/shingle state dirs already written but the commit pointer
    * not yet moved. No-op in production.
    */
  private[graft] var crashBeforePointer: () => Unit = () => ()
  /** Above this many distinct buckets the isin pushdown costs more than the
    * pruned scan saves — fall back to the plain join (row groups still prune
    * on the sorted layout's min/max).
    */
  private val IsinPushdownMax = 20000

  case class Config(shingleSize: Int = 3, numHashes: Int = 16, numBands: Int = 4,
                    threshold: Double = 0.5) {
    require(numHashes % numBands == 0, s"numHashes ($numHashes) must divide into numBands ($numBands)")
    require(threshold > 0 && threshold <= 1, s"threshold out of (0,1]: $threshold")
  }

  /** Start the standing ingestion-dedup query over a stream of documents.
    * `idCol` must be globally unique and non-null (it names the kept rows).
    */
  def start(stream: DataFrame, textCol: String, idCol: String,
            storeDir: String, sinkDir: String, checkpointDir: String,
            cfg: Config = Config()): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch.sparkSession, batch, textCol, idCol, storeDir, sinkDir, batchId, cfg)
        ()
      }
      .start()

  /** Dedup ONE batch against itself and the store — idempotent on `batchId`.
    * Public so batch-side backfills run the exact code path the stream does.
    */
  def applyBatch(spark: SparkSession, batch: DataFrame, textCol: String, idCol: String,
                 storeDir: String, sinkDir: String, batchId: Long,
                 cfg: Config = Config()): Unit = synchronized {
    val root = new java.io.File(storeDir)
    root.mkdirs()
    if (appliedBatch(storeDir).exists(_ >= batchId)) return // re-delivery: done

    // ---- 1. within-batch dedup: LSH pairs -> components -> min-id keeper
    val inPairs = Dedup.minHashLsh(batch, textCol, idCol,
      cfg.shingleSize, cfg.numHashes, cfg.numBands, cfg.threshold)
    val batchKept = batch.join(
        Dedup.resolveKeepers(batch.select(col(idCol)), idCol, inPairs)
          .filter(col("keep")).select(col("id").as(idCol)),
        Seq(idCol), "left_semi")
      .localCheckpoint() // consumed by banding, sets, anti-join, and the sink write

    // ---- 2. against-store dedup: bucket-join candidates, exact verification
    // banded buckets AND shingle sets are checkpointed over batchKept so the
    // signature/shingle UDF work runs ONCE — step 3 reuses both (filtered to
    // the survivors) instead of recomputing them over `kept`
    val newBanded = Dedup.bandedBuckets(batchKept, textCol, idCol,
      cfg.shingleSize, cfg.numHashes, cfg.numBands).localCheckpoint()
    val newSets = Dedup.shingleSets(batchKept, textCol, idCol, cfg.shingleSize)
      .localCheckpoint()
    val priorSigDirs = stateDirs(root, "sigs_b", batchId)
    val dropIds: DataFrame =
      if (priorSigDirs.isEmpty) spark.emptyDataFrame.withColumn("doc_id", lit(0L)).limit(0)
      else {
        val store0 = spark.read.parquet(priorSigDirs: _*)
        // prune the store scan to the batch's buckets: pushed isin when the
        // set is small, sorted-layout row-group pruning either way
        val buckets = newBanded.select("bucket").distinct()
          .limit(IsinPushdownMax + 1).collect().map(_.getInt(0))
        val store = if (buckets.length <= IsinPushdownMax)
          store0.filter(col("bucket").isin(buckets.map(Integer.valueOf).toSeq: _*))
        else store0
        val candidates = newBanded.select(col("band"), col("bucket"), col("doc_id").as("new_id"))
          .join(store.select(col("band"), col("bucket"), col("doc_id").as("old_id")),
            Seq("band", "bucket"))
          .select("new_id", "old_id").distinct()
        val oldSets = spark.read.parquet(stateDirs(root, "sh_b", batchId): _*)
        candidates
          .join(newSets.select(col("doc_id").as("new_id"), col("sh").as("__sa")), "new_id")
          .join(oldSets.select(col("doc_id").as("old_id"), col("sh").as("__sb")), "old_id")
          .withColumn("__common", Dedup.sortedIntersectSize(col("__sa"), col("__sb")).cast("double"))
          .withColumn("jaccard",
            col("__common") / (size(col("__sa")) + size(col("__sb")) - col("__common")).cast("double"))
          .filter(col("jaccard") >= cfg.threshold)
          .select(col("new_id").as("doc_id")).distinct()
      }
    val kept = batchKept.join(dropIds.select(col("doc_id").as(idCol)), Seq(idCol), "left_anti")
      .localCheckpoint()

    // ---- 3. land survivors + append their state (overwrite = re-delivery-safe)
    // state comes from the checkpointed step-2 artifacts semi-joined to the
    // survivors — the per-row signature/shingle work is never re-run. Sort
    // bucket-major: the read path prunes on bucket alone, so bucket must be
    // the monotone column for row-group min/max pruning (a band-major sort
    // re-widens the bucket range at every band boundary).
    val keptIds = kept.select(col(idCol).as("doc_id"))
    kept.write.mode("overwrite").parquet(s"$sinkDir/batch_$batchId")
    newBanded.join(keptIds, Seq("doc_id"), "left_semi")
      .repartition(col("bucket")).sortWithinPartitions("bucket", "band")
      .write.mode("overwrite").parquet(s"$storeDir/sigs_b$batchId")
    newSets.join(keptIds, Seq("doc_id"), "left_semi")
      .write.mode("overwrite").parquet(s"$storeDir/sh_b$batchId")

    // ---- 4. atomic pointer swap (readers never see a half-applied batch)
    crashBeforePointer()
    val tmp = new java.io.File(root, s".$PTR.tmp")
    val out = new java.io.PrintWriter(tmp)
    try out.print(batchId.toString) finally out.close()
    java.nio.file.Files.move(tmp.toPath, new java.io.File(root, PTR).toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** All kept documents so far, read through the pointer (torn or future
    * batch dirs are invisible).
    */
  def keptDocs(spark: SparkSession, storeDir: String, sinkDir: String): DataFrame = {
    val applied = appliedBatch(storeDir).getOrElse(
      throw new IllegalStateException(s"no applied batches at $storeDir"))
    val dirs = Option(new java.io.File(sinkDir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("batch_"))
      .filter(_.getName.stripPrefix("batch_").toLong <= applied)
      .map(_.getPath).toSeq
    spark.read.parquet(dirs: _*)
  }

  private def appliedBatch(storeDir: String): Option[Long] = {
    val ptr = new java.io.File(storeDir, PTR)
    if (!ptr.exists()) None
    else Some(new String(java.nio.file.Files.readAllBytes(ptr.toPath)).trim.toLong)
  }

  private def stateDirs(root: java.io.File, prefix: String, below: Long): Seq[String] =
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(prefix))
      .filter(_.getName.stripPrefix(prefix).toLong < below)
      .map(_.getPath).toSeq
}
