package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-series grid resampling with forward fill ("gap filling"): per key,
  * a dense fixed-step timestamp grid spanning the key's observed range, each
  * grid point carrying the latest observation at-or-before it. The
  * `time_bucket_gapfill` / Flink temporal-grid staple — metric series with
  * irregular events become the regular series dashboards, joins against other
  * grids, and window models need.
  *
  * Scale shape: the span aggregate is one |keys|-row map-side-combined agg;
  * grid rows are generated ROW-LOCALLY from that tiny result (explode of
  * `sequence`, no shuffle); the fill is [[AsOfJoin]]'s union + keyed running
  * `last` — ONE shuffle of |grid| + |observations|, zero replication (a
  * range-join formulation would replicate each grid point by its key's
  * history). Nothing collects.
  *
  * Per-key grid size is span/step + 1 elements materialized as one array
  * before its explode — pick `stepSeconds` so the densest key stays bounded
  * (a year at 1 s is 31M elements in one row: chunk the span or coarsen the
  * step first; `sequence` itself refuses absurd lengths loudly).
  *
  * Right-side uniqueness per (key, time) is inherited from AsOfJoin's
  * contract: pre-reduce observations (the query-catalog entry reduces with
  * max/max_by) so "the" latest row is well-defined in every engine.
  */
object Resample {

  /** @param payloadCols observation columns carried onto each grid point
    *                    (null until the key's first observation — which the
    *                    min-anchored grid makes non-occurring here, but a
    *                    caller-supplied grid start can create)
    */
  def gridFill(obs: DataFrame, keyCol: String, tsCol: String,
               stepSeconds: Long, payloadCols: Seq[String]): DataFrame = {
    require(stepSeconds > 0, s"stepSeconds must be > 0, got $stepSeconds")
    val spans = obs.groupBy(col(keyCol))
      .agg(min(col(tsCol)).as("__mn"), max(col(tsCol)).as("__mx"))
    val grid = spans.select(col(keyCol),
      explode(sequence(col("__mn"), col("__mx"),
        expr(s"INTERVAL $stepSeconds SECONDS"))).as("grid_ts"))
    AsOfJoin(grid, obs.withColumnRenamed(keyCol, "__obs_k"),
      keyCol, "__obs_k", "grid_ts", tsCol, payloadCols)
  }

  /** Linear-interpolated resampling: the same min-anchored per-key grid, but
    * each grid point between two observations takes the straight-line value
    * `v0 + (v1 − v0) · (g − t0)/(t1 − t0)` instead of a step hold — the form
    * sensor/metric pipelines use when the quantity is continuous.
    *
    * Shape: ONE shuffle (the per-key sort behind `lead`) pairs each
    * observation with its successor; every consecutive interval then emits
    * its aligned grid points ROW-LOCALLY (a micros `sequence`), so no grid
    * row ever shuffles and nothing replicates — the interval that produced a
    * grid point is exactly the interval that knows its two endpoints. The
    * interpolation is a short left-to-right IEEE chain with one division,
    * bit-reproducible against the DuckDB oracle.
    *
    * Ties/duplicates: pre-reduce observations per (key, ts) — the AsOfJoin
    * contract. A single-observation key yields its one anchor point.
    */
  def gridLinear(obs: DataFrame, keyCol: String, tsCol: String, valueCol: String,
                 stepSeconds: Long): DataFrame = {
    require(stepSeconds > 0, s"stepSeconds must be > 0, got $stepSeconds")
    val stepUs = stepSeconds * 1000000L
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("__t0"))
    val paired = obs.select(col(keyCol), unix_micros(col(tsCol).cast("timestamp")).as("__t0"),
        col(valueCol).cast("double").as("__v0"))
      .withColumn("__mn", min(col("__t0")).over(w))
      .withColumn("__t1", lead(col("__t0"), 1).over(w))
      .withColumn("__v1", lead(col("__v0"), 1).over(w))
    // aligned grid points of the interval (t0, t1]; the global anchor g = mn
    // belongs to no predecessor interval and emits from its own row
    val firstAligned = col("__t0") + (lit(stepUs) - pmod(col("__t0") - col("__mn"), lit(stepUs)))
    val empty = array().cast("array<bigint>")
    val gs = paired.select(col(keyCol), col("__t0"), col("__v0"), col("__t1"), col("__v1"),
      explode(concat(
        when(col("__t0") === col("__mn"), array(col("__t0"))).otherwise(empty),
        // guarded: sequence() throws on start > stop with a positive step
        // (an interval shorter than the step contributes no aligned points)
        when(col("__t1").isNotNull && firstAligned <= col("__t1"),
          sequence(firstAligned, col("__t1"), lit(stepUs))).otherwise(empty))).as("__g"))
    // grid points that COINCIDE with an observation carry its raw value, not
    // the interpolation evaluated at ratio 0/1: v0 + (v1−v0)·1.0 is not
    // bit-identical to v1 in IEEE arithmetic, and the cross-engine oracle
    // (whose ASOF lookups collapse to the observation itself there) would
    // hash-diverge on every on-grid observation
    gs.select(col(keyCol), timestamp_micros(col("__g")).as("grid_ts"),
      when(col("__g") === col("__t0"), col("__v0"))
        .when(col("__g") === col("__t1"), col("__v1"))
        .otherwise(col("__v0") + (col("__v1") - col("__v0")) *
          ((col("__g") - col("__t0")).cast("double") / (col("__t1") - col("__t0")).cast("double")))
        .as("value"))
  }
}
