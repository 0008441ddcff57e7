package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental maintenance of a materialized per-key rollup — the warehouse
  * pattern behind every "daily metrics" table fed by an append-only log
  * (reference: each lab's CTAS aggregation over a topic is exactly such a
  * standing rollup, e.g. LAB3's anomalies_per_zone; this is its BATCH
  * maintenance discipline).
  *
  * The saved state per key is a bag of MERGEABLE partials:
  *   - `n_rows` count, decimal-exact `sum_<c>` (order-independent — a double
  *     sum would drift with partitioning), `min_<c>` / `max_<c>`,
  *   - `hll_<c>` DataSketches HLL binaries for approx distinct counts
  *     (`hll_sketch_agg`), merged with `hll_union_agg` — the only
  *     bounded-memory way a distinct-count survives incremental maintenance;
  *     an exact distinct would need the full value set per key kept forever.
  *
  * [[merge]] shuffles |saved keys| + |delta| rows — the 100 TB history behind
  * `saved` is NEVER rescanned. At 1000 daily batches the alternative
  * (recompute over the union of all history) does 1000× the cumulative IO;
  * this does O(keys) per batch after the first. [[finish]] derives the
  * user-facing values (avg = one IEEE division off the exact decimal sum via
  * its digit string — the decimal→double direct cast measured a 1-ulp
  * cross-engine divergence, see Curation.zScore) and is a pure projection:
  * state stays mergeable forever, finish is free to run after every batch.
  */
object MaterializedAgg {

  /** @param sumDecimal exact-sum carrier type: must hold every input value
    *                    exactly (default fits money-like doubles with 2
    *                    decimal digits) — sums become order-independent.
    */
  case class Spec(keys: Seq[String], sumCols: Seq[String] = Nil,
                  minCols: Seq[String] = Nil, maxCols: Seq[String] = Nil,
                  distinctCols: Seq[String] = Nil,
                  sumDecimal: String = "decimal(25,2)") {
    require(keys.nonEmpty, "MaterializedAgg.Spec needs at least one key")
    def stateCols: Seq[String] =
      Seq("n_rows") ++ sumCols.map("sum_" + _) ++ minCols.map("min_" + _) ++
        maxCols.map("max_" + _) ++ distinctCols.map("hll_" + _)
  }

  /** Bootstrap state from a batch: one map-side-combined shuffle on the keys. */
  def init(batch: DataFrame, spec: Spec): DataFrame = {
    val aggs: Seq[Column] =
      spec.sumCols.map(c => sum(col(c).cast(spec.sumDecimal)).as(s"sum_$c")) ++
        spec.minCols.map(c => min(col(c)).as(s"min_$c")) ++
        spec.maxCols.map(c => max(col(c)).as(s"max_$c")) ++
        spec.distinctCols.map(c => hll_sketch_agg(col(c)).as(s"hll_$c"))
    batch.groupBy(spec.keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
  }

  /** Fold a delta batch into saved state: union of two partial-state tables,
    * re-merged per key. Only |saved| + |delta-keys| rows move.
    */
  def merge(saved: DataFrame, delta: DataFrame, spec: Spec): DataFrame = {
    val want = (spec.keys ++ spec.stateCols).toSet
    val have = saved.columns.toSet
    require(want.subsetOf(have),
      s"saved state is missing columns ${(want -- have).toSeq.sorted.mkString(", ")} — " +
        "was it built by init() with the same Spec?")
    val aggs: Seq[Column] =
      spec.sumCols.map(c => sum(col(s"sum_$c")).as(s"sum_$c")) ++
        spec.minCols.map(c => min(col(s"min_$c")).as(s"min_$c")) ++
        spec.maxCols.map(c => max(col(s"max_$c")).as(s"max_$c")) ++
        spec.distinctCols.map(c => hll_union_agg(col(s"hll_$c"), lit(false)).as(s"hll_$c"))
    saved.select((spec.keys ++ spec.stateCols).map(col): _*)
      .unionByName(init(delta, spec).select((spec.keys ++ spec.stateCols).map(col): _*))
      .groupBy(spec.keys.map(col): _*)
      .agg(sum(col("n_rows")).as("n_rows"), aggs: _*)
  }

  /** User-facing values from state — pure projection, no shuffle. */
  def finish(state: DataFrame, spec: Spec): DataFrame = {
    val outs: Seq[Column] =
      spec.sumCols.flatMap { c =>
        val sd = col(s"sum_$c").cast("string").cast("double")
        Seq(sd.as(s"sum_$c"), (sd / col("n_rows").cast("double")).as(s"avg_$c"))
      } ++
        spec.minCols.map(c => col(s"min_$c")) ++
        spec.maxCols.map(c => col(s"max_$c")) ++
        spec.distinctCols.map(c => hll_sketch_estimate(col(s"hll_$c")).as(s"distinct_$c"))
    state.select(spec.keys.map(col) ++ Seq(col("n_rows")) ++ outs: _*)
  }
}
