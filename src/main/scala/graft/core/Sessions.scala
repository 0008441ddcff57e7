package graft.core

import org.apache.spark.sql.SparkSession

/** THE local-session factory — the single definition of the engine's session
  * config (r16, VERDICT r15 #6). Three near-identical builders used to live
  * in `Graft.session`, `Bench.session` and `Verify`, and the third copy
  * proved the hazard: Verify shipped for a round WITHOUT the
  * objectHashAggregate threshold and q34's sf10 exact search silently
  * degraded its bounded top-k to a 73 GB sort-and-spill. Every main and
  * harness now routes through here; a config that matters to correctness or
  * scale is added ONCE.
  *
  * The shared set, and why each entry is session-wide:
  *   - `shuffle.partitions` sized to the core count (local mode; a cluster
  *     would size to ~2-3x total cores and let AQE coalesce);
  *   - UTC session timezone — the whole engine's timestamp contract;
  *   - AQE on — runtime re-plan (skew-join, partition coalesce) is part of
  *     the 100 TB design;
  *   - `parquet.nanosAsLong` — TIMESTAMP(NANOS) fixture columns surface as
  *     nanos longs (consulted at EXECUTION time, so it must stay set while
  *     any events scan is alive; see [[Tables.normalizeEventTs]]);
  *   - the objectHashAggregate sort-based fallback threshold raised to 4.19M
  *     distinct keys/task — the engine's bounded typed aggregates (TopKAgg
  *     and friends) keep memory at groups × heap size by construction, and
  *     the 128-key default silently turns them into a full sort-and-spill of
  *     the pre-aggregation input (full audit of the unbounded-agg sites in
  *     the scaladoc history at Graft.scala, r7/r15);
  *   - the RocksDB state store provider — per-key streaming state off-heap
  *     (the 100M+ standing-key backend), and the opt-in that routes
  *     transformWithState operators (TtlAnomaly, StreamingMatchRecognize's
  *     default engine);
  *   - UI off (headless harness runs).
  */
object Sessions {

  /** Build (or reuse) the local session. `extra` entries apply LAST, so a
    * caller can add harness-specific knobs (Bench's maxPartitionBytes) or —
    * deliberately visible at the call site — override a shared default.
    */
  def local(master: String = "local[*]", shufflePartitions: String = "32",
            extra: Map[String, String] = Map.empty): SparkSession = {
    val b = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
    val spark = extra.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** The `local[N]`-from-a-core-count form every CLI harness uses
    * (`SPARK_GRAFT_CPUS`): shuffle partitions = core count.
    */
  def localCpus(cpus: String, extra: Map[String, String] = Map.empty): SparkSession =
    local(s"local[$cpus]", cpus, extra)
}
