package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Session + table loading helpers.
  *
  * Scale notes: loaders are plain parquet scans, so Catalyst column pruning and
  * predicate pushdown reach the file source (check `.explain("formatted")` for
  * `PushedFilters` / `ReadSchema`). Nothing here materialises on the driver.
  */
object Graft {

  /** Opinionated local session — [[Sessions.local]] is the one definition of
    * the config set (r16); the scaladoc history of each entry (the r7/r15
    * objectHashAggregate lessons, the nanosAsLong execution-time contract,
    * the r13 RocksDB rationale) lives there. On a real cluster the same
    * settings apply except `master`; shuffle partitions should be sized to
    * ~2-3x total cores and re-planned by AQE.
    */
  def session(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession =
    Sessions.local(master, shufflePartitions.toString)
}

/** Loaders for the driver-provided testdata tables (see TESTDATA.md). */
object Tables {

  val all: Seq[String] = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Load one table from a scale-factor directory.
    *
    * `events.ts` in the driver fixture is parquet TIMESTAMP(NANOS), which Spark
    * cannot read natively; we read it as nanos-since-epoch
    * (spark.sql.legacy.parquet.nanosAsLong) and truncate to microseconds.
    * DuckDB's `CAST(ts AS TIMESTAMP)` performs the same ns→µs truncation, so
    * oracle SQL over `events` must wrap `ts` that way. Replicated bench data
    * (scripts/gen_sf1.py) comes back as TIMESTAMP(MICROS) instead — DuckDB's
    * parquet writer downcasts even an explicit TIMESTAMP_NS — so the loader
    * branches on the arriving type rather than assuming nanos. The result is
    * kept timezone-naive (TIMESTAMP_NTZ) to match the naive source column; the
    * whole engine runs with session timezone UTC.
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/events.parquet")
      raw.withColumn("ts", normalizeEventTs(raw.schema))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** The one place that knows how an events `ts` column arrives from parquet.
    *
    * Fixture generators have shipped it two ways: TIMESTAMP(NANOS), which Spark
    * surfaces as a nanos-since-epoch long under
    * `spark.sql.legacy.parquet.nanosAsLong`, and TIMESTAMP(MICROS) which
    * arrives as a native timestamp (NTZ or LTZ depending on `isAdjustedToUTC`).
    * Both normalize to TIMESTAMP_NTZ at microsecond precision — the same
    * truncation DuckDB's `CAST(ts AS TIMESTAMP)` applies, so oracles agree.
    * Batch and streaming readers MUST both go through this helper: the
    * streaming readers know their schema upfront (`rawSchema`), so the branch
    * works identically there.
    */
  def normalizeEventTs(schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.Column =
    schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // TIMESTAMP(NANOS) as long
        timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz")
      case _ => // already a timestamp (micros), NTZ or LTZ
        col("ts").cast("timestamp_ntz")
    }
}
