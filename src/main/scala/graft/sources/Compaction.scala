package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Small-file compaction — the OPTIMIZE-style table-maintenance pass.
  *
  * Streaming sinks and fine-grained ingests leave parquet directories with
  * thousands of KB-sized files; at 100 TB that murders scan planning (one
  * task + one footer fetch per file) and pushes the NameNode/listing cost
  * ahead of the I/O. Compaction rewrites a directory into ~`targetFileBytes`
  * files:
  *
  *  - file count is computed from the directory's ACTUAL byte size (listing
  *    only — no data read) rather than a row-count guess, so wide and narrow
  *    tables both land near the target;
  *  - with `sortCols`, files are range-partitioned and sorted
  *    ([[ZOrderLayout]]'s write discipline): every output file covers a tight
  *    min/max range of the sort key, so parquet footer stats prune reads —
  *    compaction doubles as (re-)clustering;
  *  - without `sortCols`, a plain round-robin repartition balances bytes.
  *
  * The rewrite goes to a NEW directory: compaction of live tables must be
  * atomic-swap (write, verify, rename), never in-place — the verify step is
  * [[graft.operators.Reconcile.checksum]] over old vs new, and the spec pins
  * that contract. Output `CompactionReport` carries before/after counts for
  * the operational log line.
  */
object Compaction {

  final case class CompactionReport(filesBefore: Long, filesAfter: Long,
                                    bytes: Long, rows: Long)

  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetFileBytes: Long = 128L * 1024 * 1024,
              sortCols: Seq[String] = Nil): CompactionReport = {
    require(targetFileBytes > 0, s"targetFileBytes must be > 0, got $targetFileBytes")
    val conf = spark.sparkContext.hadoopConfiguration
    val path = new org.apache.hadoop.fs.Path(inDir)
    val fs = path.getFileSystem(conf)
    val entries = fs.listStatus(path).filterNot { s =>
      val n = s.getPath.getName
      n.startsWith("_") || n.startsWith(".")
    }
    // a partitionBy layout has data in SUBDIRECTORIES: sizing from top-level
    // files would read bytes=0 and collapse the table into one task/file —
    // fail loudly; compact each leaf partition directory instead
    val subdirs = entries.filter(_.isDirectory)
    require(subdirs.isEmpty,
      s"Compaction.compact: $inDir contains subdirectories " +
        s"(${subdirs.take(3).map(_.getPath.getName).mkString(", ")}…) — a partitioned " +
        "layout must be compacted per leaf partition directory")
    val files = entries.filter(_.isFile)
    require(files.nonEmpty, s"Compaction.compact: no data files in $inDir")
    val bytes = files.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val df = spark.read.parquet(inDir)
    val shaped =
      if (sortCols.nonEmpty)
        df.repartitionByRange(nOut, sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
      else df.repartition(nOut)
    shaped.write.mode("overwrite").parquet(outDir)
    val outFiles = fs.listStatus(new org.apache.hadoop.fs.Path(outDir)).count { s =>
      val n = s.getPath.getName
      s.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
    CompactionReport(files.length.toLong, outFiles.toLong, bytes,
      spark.read.parquet(outDir).count())
  }
}
