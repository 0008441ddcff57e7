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

  /** Opinionated local session. On a real cluster the same settings apply except
    * `master`; shuffle partitions should be sized to ~2-3x total cores and
    * re-planned by AQE (`spark.sql.adaptive.coalescePartitions`).
    */
  def session(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // session-wide on purpose (also set lazily by Tables for sessions built
      // elsewhere): TIMESTAMP(NANOS) parquet columns surface as nanos longs
      // instead of failing, and the flag must stay set while any events scan
      // is alive (it is consulted at execution, not plan time). Consequence a
      // caller should know: an unrelated NANOS parquet read in the same
      // session also decodes as LongType rather than erroring.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the engine's bounded typed aggregates (TopKAgg and friends) rely on
      // map-side partial aggregation to keep the shuffle O(groups·k). The
      // default sort-based fallback kicks in at just 128 DISTINCT KEYS per
      // task, silently turning a small-memory hash agg (e.g. 30k query
      // groups × a bounded heap) into a full sort-and-spill of the
      // pre-aggregation input — at sf10 that spilled the 15B-row exact knn
      // candidate stream to disk until the device filled. The hash map's
      // real memory is groups × heap size, which the operators bound by
      // construction, so the threshold can safely sit far above any
      // realistic per-task group count.
      //
      // Trade-off (session-global, so it also covers UNBOUNDED object aggs
      // like collect_list/collect_set/percentile): the valve is raised, not
      // removed — past 4.19M distinct keys per task the sort-spill still
      // engages. Below that, memory is keys × per-group buffer, and the
      // fallback never bounded the per-group buffer anyway (sort-based mode
      // still materialises each group's full collect_list before emitting).
      // Catalog audit of unbounded-agg sites: the percentile/quantile aggs
      // produce |groups|-row outputs with small group counts by construction
      // (Curation.scala); collect_list sites are per-doc / per-vector bounded
      // (chunk rewrites, PQ codebooks, series windows) except the inverted-
      // index postings (Dedup.ngramJaccardPairs), whose per-key buffers are
      // document-frequency-bounded and hot keys are capped via
      // maxDocsPerShingle/CapStats. No catalog query runs a high-cardinality
      // key space with unbounded per-key buffers under this session.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      // RocksDB state store (r13): per-key streaming state lives off-heap on
      // local disk instead of the executor heap — at 100M+ standing keys the
      // heap-backed default provider is the executor-memory ceiling, RocksDB
      // is the scale-safe backend. Session-wide: every stateful operator
      // (anomaly, funnel, MATCH_RECOGNIZE, sessionize) benefits, and the
      // transformWithState operators (TtlAnomaly, StreamingTemporalJoin,
      // StreamingMatchRecognize's default engine) REQUIRE it.
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
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
