package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Manifest-based table snapshots — lakehouse-lite time travel over
  * immutable parquet files (the Delta/Iceberg snapshot idea stripped to its
  * load-bearing core: a snapshot IS a file list).
  *
  * Plain-directory tables have no read isolation: an append between a
  * reader's planning and its execution changes the result, and "the table as
  * of yesterday" is gone the moment files land. With immutable data files
  * (every writer in this engine appends new files, never rewrites), a
  * versioned manifest — the file list plus per-file row counts and sizes —
  * makes any historical snapshot reproducible: `readAt` plans EXACTLY the
  * files the manifest names, so later appends are invisible and a snapshot
  * read is stable forever (until a compaction rewrites history — swap the
  * manifest atomically with the data, as Compaction's contract requires).
  *
  * Manifests are tiny (|files| rows) parquet under `<dir>/_manifests/v=N`;
  * `snapshot` lists the directory (no data read), assigns the next version,
  * and returns it. Listing and version assignment are driver-side — the same
  * bounded-metadata discipline as [[ZoneMapIndex]].
  */
object Manifest {

  private def manifestRoot(dir: String) = s"$dir/_manifests"

  /** RECURSIVE data-file listing with the hidden-segment filter — the same
    * idiom as `ZoneMapIndex.buildIncremental`: a partitioned layout keeps
    * data in subdirectories, and a top-level-only `listStatus` would
    * silently record an empty/partial manifest for it (r5 advisor finding).
    */
  private def dataFiles(fs: org.apache.hadoop.fs.FileSystem,
                        path: org.apache.hadoop.fs.Path): Seq[(String, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val it = fs.listFiles(path, true)
    // listFiles returns SCHEME-QUALIFIED paths ('file:/...'); strip the
    // qualified root or the hidden-segment check runs on the ancestor
    // directories too and a data dir under ~/.cache would list as empty
    val rootPrefix = fs.makeQualified(path).toString
    while (it.hasNext) {
      val st = it.next()
      val name = st.getPath.getName
      val rel = st.getPath.toString.stripPrefix(rootPrefix)
      val inHidden = rel.contains("/_") || rel.contains("/.")
      if (st.isFile && !name.startsWith("_") && !name.startsWith(".") && !inHidden)
        out += ((st.getPath.toString, st.getLen))
    }
    out.toSeq
  }

  /** Record the directory's current file set as the next manifest version.
    * Returns the version number assigned.
    */
  def snapshot(spark: SparkSession, dir: String): Long = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = dataFiles(fs, path)
    require(files.nonEmpty, s"Manifest.snapshot: no data files in $dir")
    val v = latestVersion(spark, dir).map(_ + 1L).getOrElse(0L)
    import spark.implicits._
    files.toSeq.toDF("file", "bytes")
      .coalesce(1)
      .write.mode("errorifexists").parquet(s"${manifestRoot(dir)}/v=$v")
    v
  }

  /** Highest recorded version, if any snapshot exists. */
  def latestVersion(spark: SparkSession, dir: String): Option[Long] = {
    val root = new org.apache.hadoop.fs.Path(manifestRoot(dir))
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) None
    else fs.listStatus(root).filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.startsWith("v="))
      .map(_.stripPrefix("v=").toLong)
      .reduceOption(_ max _)
  }

  /** The file list of a recorded version. */
  def files(spark: SparkSession, dir: String, version: Long): Seq[String] =
    spark.read.parquet(s"${manifestRoot(dir)}/v=$version")
      .select("file").collect().map(_.getString(0)).toSeq

  /** Read the table exactly as of `version`: later appends are invisible,
    * and the read keeps working identically however many files land after.
    */
  def readAt(spark: SparkSession, dir: String, version: Long): DataFrame = {
    val fs = files(spark, dir, version)
    require(fs.nonEmpty, s"manifest v=$version of $dir is empty")
    spark.read.parquet(fs: _*)
  }

  /** The table as of the newest manifest — the committed view. Files present
    * in the directory but in no manifest (crashed attempts, in-flight
    * writes) are invisible, which is the isolation a bare directory read
    * cannot give.
    */
  def readLatest(spark: SparkSession, dir: String): DataFrame = {
    val v = latestVersion(spark, dir)
      .getOrElse(sys.error(s"Manifest.readLatest: no manifest under $dir"))
    readAt(spark, dir, v)
  }

  /** [[snapshot]] carrying [[ZoneMapIndex]]-style per-file min/max stats for
    * `cols` — one data pass (at write time the writer knows these for free;
    * as a retrofit it costs the scan). The manifest then serves BOTH
    * isolation and skipping: [[prunedReadAt]] time-travels to the version
    * AND opens only the files whose zones intersect the predicate — the
    * Delta/Iceberg "snapshot = file list + stats" design in one table.
    */
  def snapshotWithStats(spark: SparkSession, dir: String, cols: Seq[String]): Long = {
    val v = latestVersion(spark, dir).map(_ + 1L).getOrElse(0L)
    ZoneMapIndex.build(spark, dir, cols)
      .coalesce(1)
      .write.mode("errorifexists").parquet(s"${manifestRoot(dir)}/v=$v")
    v
  }

  /** Time-travel + zone-skip in one read: `version`'s file set, cut to the
    * files intersecting every range, exact predicate re-applied. Requires a
    * [[snapshotWithStats]] manifest covering the predicate columns.
    */
  def prunedReadAt(spark: SparkSession, dir: String, version: Long,
                   ranges: Map[String, (Any, Any)]): DataFrame = {
    val manifest = spark.read.parquet(s"${manifestRoot(dir)}/v=$version")
    ranges.keys.foreach { c =>
      require(manifest.columns.contains(s"min_$c"),
        s"manifest v=$version has no stats for '$c' — snapshotWithStats must cover it")
    }
    val kept = ZoneMapIndex.prune(manifest, ranges)
    val residual = ranges.map { case (c, (lo, hi)) =>
      col(c) >= lit(lo) && col(c) <= lit(hi)
    }.reduce(_ && _)
    if (kept.isEmpty) spark.read.parquet(dir).filter(lit(false))
    else spark.read.parquet(kept: _*).filter(residual)
  }

  /** EXACTLY-ONCE streaming table commit for `foreachBatch` over
    * at-least-once delivery: append `batch`'s files, then publish manifest
    * `v=batchId` = (previous manifest's files) ∪ (files this append
    * created).
    *
    *  - Idempotent: a re-delivered batchId whose manifest already exists is
    *    a no-op — the duplicate work never happened as far as readers know.
    *  - Crash-safe: a batch that died after writing data but before
    *    publishing its manifest leaves ORPHAN files; they are in no
    *    manifest (the retry's listing-before excludes them from ITS
    *    manifest too), so `readLatest` never sees them. The manifest itself
    *    is staged and renamed — readers never observe a half-written one.
    *  - Single-writer: foreachBatch invocations of one query are serial;
    *    concurrent writers need a lock service this deliberately omits.
    *
    * Returns true when the batch was applied, false on an idempotent skip.
    */
  def appendCommit(batch: DataFrame, dir: String, batchId: Long): Boolean = {
    val spark = batch.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val mdir = new org.apache.hadoop.fs.Path(s"${manifestRoot(dir)}/v=$batchId")
    val fs = mdir.getFileSystem(conf)
    if (fs.exists(mdir)) return false // re-delivered batch: already committed
    require(latestVersion(spark, dir).forall(_ < batchId),
      s"appendCommit: batchId $batchId is not monotone vs existing manifests")

    val dataPath = new org.apache.hadoop.fs.Path(dir)
    def listing(): Set[String] =
      if (!fs.exists(dataPath)) Set.empty
      else dataFiles(fs, dataPath).map(_._1).toSet
    val before = listing()
    batch.write.mode("append").parquet(dir)
    val created = (listing() -- before).toSeq.sorted
    val carried = latestVersion(spark, dir).map(files(spark, dir, _)).getOrElse(Nil)

    import spark.implicits._
    val staging = new org.apache.hadoop.fs.Path(s"${manifestRoot(dir)}/.staging_v=$batchId")
    (carried ++ created).map(f => (f, 0L)).toDF("file", "bytes")
      .coalesce(1).write.mode("overwrite").parquet(staging.toString)
    if (!fs.rename(staging, mdir))
      sys.error(s"appendCommit: failed to publish manifest v=$batchId")
    true
  }
}
