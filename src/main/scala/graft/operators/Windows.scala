package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tumbling-window aggregation (reference: TUMBLE TVF, LAB3-Walkthrough.md:99-111,
  * LAB4-Walkthrough.md:127-141).
  *
  * Spark plan: one shuffle keyed on (window, keys) with map-side partial
  * aggregation — the optimal shape for this operator at any scale. The window
  * struct is epoch-aligned, matching Flink's TUMBLE and DuckDB's `time_bucket`.
  *
  * `window_time` (Flink's window event-time attribute) is `window_end - 1ms`
  * (SURVEY.md §7.4 item 4); exposed for interval joins ordered on it.
  */
object Tumble {

  def apply(df: DataFrame, tsCol: String, width: String, keys: Column*)(aggs: (String, Column)*): DataFrame = {
    val grouped = df
      .groupBy(window(col(tsCol), width) +: keys: _*)
      .agg(aggs.head._2.as(aggs.head._1), aggs.tail.map { case (n, c) => c.as(n) }: _*)
    grouped
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .withColumn("window_time", col("window.end") - expr("INTERVAL 1 MILLISECOND"))
      .drop("window")
  }
}

/** Event-time interval join (reference: LAB4-Walkthrough.md:231-235 — equi-key
  * plus a bounded time range).
  *
  * Plan shape: an equi-join on `key` (shuffle or broadcast hash join — Catalyst
  * picks, AQE can switch at runtime) with the range condition applied as a
  * post-join filter. At 100 TB the equi-key carries the partitioning, so state
  * and shuffle scale with key cardinality, not the time range.
  */
object IntervalJoin {

  /** left.key = right.key AND left.ts BETWEEN right.ts + lower AND right.ts + upper */
  def apply(left: DataFrame, right: DataFrame, leftKey: String, rightKey: String,
            leftTs: String, rightTs: String, lowerBound: String, upperBound: String): DataFrame = {
    val cond = left(leftKey) === right(rightKey) &&
      left(leftTs) >= right(rightTs) + expr(s"INTERVAL $lowerBound") &&
      left(leftTs) <= right(rightTs) + expr(s"INTERVAL $upperBound")
    left.join(right, cond, "inner")
  }
}

/** Dimension-enrichment join (reference Lab1: orders ⋈ customers ⋈ products,
  * LAB1-Walkthrough.md:119-131). Dimensions are broadcast — the fact side never
  * shuffles, which is the correct plan when dims fit in executor memory
  * (customers=100, products=17 in the reference; up to ~100 MB in practice).
  */
object EnrichmentJoin {

  def apply(fact: DataFrame, dims: Seq[(DataFrame, String)]): DataFrame =
    dims.foldLeft(fact) { case (acc, (dim, key)) => acc.join(broadcast(dim), key) }
}
