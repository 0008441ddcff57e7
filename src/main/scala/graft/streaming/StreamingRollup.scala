package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.MaterializedAgg

/** Continuous maintenance of a [[MaterializedAgg]] rollup from a stream —
  * the standing form of the reference's CTAS-over-a-topic aggregations
  * (every lab keeps such a rollup RUNNING; this is the engine-side state
  * discipline that makes it restartable).
  *
  * Each micro-batch folds into the saved state with [[MaterializedAgg.merge]]
  * — |keys| + |batch| rows of work, never a rescan of history — and the new
  * state lands as a VERSIONED directory (`state_v<batchId>`) plus an atomic
  * pointer rewrite. Two failure facts drive that layout:
  *
  *  - foreachBatch re-delivers a batch after a crash (at-least-once): the
  *    pointer records the last APPLIED batch id, and [[applyBatch]] is a
  *    no-op for any batch at-or-below it — merge + re-merge of the same
  *    delta would double-count sums, the one thing a rollup must never do;
  *  - a reader must never see a half-written state: readers go through the
  *    pointer, which only ever names a fully-written directory (write dir,
  *    fsync, then swap the pointer — the Compaction rewrite-then-swap rule).
  *
  * Old versions are pruned to `keepVersions` (enough to debug a bad batch,
  * bounded so 10⁶ batches don't accumulate 10⁶ dirs).
  */
object StreamingRollup {

  private val PTR = "_LATEST"

  /** Start the standing maintenance query (append stream in, processing-time
    * trigger). `stateDir` may already hold a rollup — the stream continues it.
    */
  def start(stream: DataFrame, spec: MaterializedAgg.Spec, stateDir: String,
            checkpointDir: String, keepVersions: Int = 3): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch.sparkSession, batch, spec, stateDir, batchId, keepVersions)
        ()
      }
      .start()

  /** Fold ONE delta batch into the saved state — idempotent on `batchId`:
    * re-delivery of an applied batch changes nothing. Public so batch-side
    * backfills can share the exact code path the stream runs.
    */
  def applyBatch(spark: SparkSession, batch: DataFrame, spec: MaterializedAgg.Spec,
                 stateDir: String, batchId: Long, keepVersions: Int = 3): Unit = synchronized {
    val root = new java.io.File(stateDir)
    root.mkdirs()
    val applied = latestVersion(stateDir)
    if (applied.exists(_ >= batchId)) return // re-delivered batch: already folded
    val next = applied match {
      case Some(v) =>
        val saved = spark.read.parquet(s"$stateDir/state_v$v")
        MaterializedAgg.merge(saved, batch, spec)
      case None =>
        MaterializedAgg.init(batch, spec)
    }
    val dir = s"$stateDir/state_v$batchId"
    next.write.mode("overwrite").parquet(dir)
    // pointer swap: write-new + atomic rename, so a concurrent reader sees
    // either the old or the new version, never a torn pointer
    val tmp = new java.io.File(root, s".$PTR.tmp")
    val out = new java.io.PrintWriter(tmp)
    try out.print(batchId.toString) finally out.close()
    java.nio.file.Files.move(tmp.toPath, new java.io.File(root, PTR).toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // prune old versions beyond keepVersions (the just-written one counts)
    val versions = root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("state_v"))
      .map(_.getName.stripPrefix("state_v").toLong).sorted.reverse
    versions.drop(keepVersions).foreach { v =>
      deleteRecursively(new java.io.File(root, s"state_v$v"))
    }
  }

  /** Read the current rollup (user-facing values) through the pointer. */
  def current(spark: SparkSession, spec: MaterializedAgg.Spec, stateDir: String): DataFrame = {
    val v = latestVersion(stateDir).getOrElse(
      throw new IllegalStateException(s"no rollup state at $stateDir"))
    MaterializedAgg.finish(spark.read.parquet(s"$stateDir/state_v$v"), spec)
  }

  private def latestVersion(stateDir: String): Option[Long] = {
    val ptr = new java.io.File(stateDir, PTR)
    if (!ptr.exists()) None
    else Some(new String(java.nio.file.Files.readAllBytes(ptr.toPath)).trim.toLong)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete()
  }
}
