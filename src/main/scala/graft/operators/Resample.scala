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
}
