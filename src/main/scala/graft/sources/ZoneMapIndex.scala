package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level zone maps: a per-file (min, max, count) stats table over chosen
  * columns, and a read path that consults it to open only the files a range
  * predicate can touch.
  *
  * Parquet already keeps footer min/max, but the footer lives INSIDE the
  * file: at 100 TB / millions of files, "read every footer to decide what to
  * skip" is itself a full metadata scan per query. An externalized zone-map
  * table (what Delta/Iceberg keep in their manifests, Snowflake in its
  * metadata layer) makes pruning a driver-side lookup over |files| tiny rows
  * — zero object-store requests for skipped files. Pairs with
  * [[ZOrderLayout]]/[[graft.operators.Layout.zValue]]: clustered layouts are
  * what make per-file ranges tight enough to prune on EVERY clustered
  * column.
  *
  * `build` is one scan with a map-side-combined agg to |files| rows — at
  * write time you'd fold it into the writer (the stats are free there); as a
  * retrofit it costs one pass. Pruning re-applies the exact predicate after
  * the file cut, so correctness never depends on the index being complete —
  * a stale/partial index can only lose pruning, never rows (the spec pins
  * result-equality against the full scan).
  */
object ZoneMapIndex {

  /** One row per parquet file: `file`, `n_rows`, and `min_<c>`/`max_<c>` for
    * every indexed column.
    */
  def build(spark: SparkSession, dir: String, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "ZoneMapIndex.build needs at least one column")
    val aggs = count(lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    spark.read.parquet(dir)
      .groupBy(col("_metadata.file_path").as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Incremental maintenance: stat ONLY files the existing index has not
    * seen (ingest appended new files; old ones are immutable) and return the
    * merged index. The unseen set comes from an explicit listing diff and
    * the scan is constructed over exactly those paths — already-indexed
    * files are never opened (a `_metadata.file_path` predicate is NOT
    * guaranteed to prune the file index, so it is not relied on). This is
    * the write-time shape: each ingest batch folds its own files' stats in,
    * and `build` remains the one-off retrofit.
    */
  def buildIncremental(spark: SparkSession, dir: String, cols: Seq[String],
                       existing: DataFrame): DataFrame = {
    val known = existing.select("file").collect().map(_.getString(0)).toSet
    // explicit listing diff, not a _metadata filter: metadata predicates are
    // not guaranteed to prune the file index, and a listing is the cheap op
    // here (the index itself exists to avoid opening files)
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // RECURSIVE listing: partitioned layouts keep data in subdirectories,
    // and a top-level-only diff would silently treat every nested file as
    // already indexed (returning a stale index that loses rows, not just
    // pruning)
    val unseen = scala.collection.mutable.ArrayBuffer.empty[String]
    val it = fs.listFiles(path, true)
    while (it.hasNext) {
      val st = it.next()
      val name = st.getPath.getName
      val inHidden = st.getPath.toString.contains("/_") || st.getPath.toString.contains("/.")
      if (st.isFile && !name.startsWith("_") && !name.startsWith(".") && !inHidden &&
        !known.contains(st.getPath.toString))
        unseen += st.getPath.toString
    }
    if (unseen.isEmpty) existing
    else {
      val aggs = count(lit(1)).as("n_rows") +:
        cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
      val fresh = spark.read.parquet(unseen.toIndexedSeq: _*)
        .groupBy(col("_metadata.file_path").as("file"))
        .agg(aggs.head, aggs.tail: _*)
      existing.unionByName(fresh)
    }
  }

  /** Files whose zones intersect EVERY `col -> (lo, hi)` range (inclusive;
    * a file survives unless `max < lo` or `min > hi`). Driver-side over the
    * |files|-row index — bounded by design.
    */
  def prune(index: DataFrame, ranges: Map[String, (Any, Any)]): Seq[String] = {
    require(ranges.nonEmpty, "ZoneMapIndex.prune needs at least one range")
    val keep = ranges.map { case (c, (lo, hi)) =>
      !(col(s"max_$c") < lit(lo) || col(s"min_$c") > lit(hi))
    }.reduce(_ && _)
    index.filter(keep).select("file").collect().map(_.getString(0)).toSeq
  }

  /** Scan only the surviving files, then re-apply the exact range predicate
    * (zones are necessary, not sufficient). Empty survivor set short-circuits
    * to an empty frame with the directory's schema — no file is opened.
    */
  def prunedRead(spark: SparkSession, dir: String, index: DataFrame,
                 ranges: Map[String, (Any, Any)]): DataFrame = {
    val files = prune(index, ranges)
    val residual = ranges.map { case (c, (lo, hi)) =>
      col(c) >= lit(lo) && col(c) <= lit(hi)
    }.reduce(_ && _)
    val base =
      if (files.isEmpty) spark.read.parquet(dir).filter(lit(false))
      else spark.read.parquet(files: _*)
    base.filter(residual)
  }
}
