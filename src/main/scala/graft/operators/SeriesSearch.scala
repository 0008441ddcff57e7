package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series subsequence similarity search: the top-k length-`w` windows
  * (across every key's series) most similar to a query pattern, by
  * z-normalized Euclidean distance — "find the hours that look like this
  * incident shape" over the metric streams the anomaly family watches
  * (the UCR-suite / streaming-similarity-search problem family).
  *
  * Plan shape: one key-partitioned window builds each position's length-w
  * value array (ROWS CURRENT..w-1 FOLLOWING collect_list — rows carry w
  * doubles, the deliberate w× amplification of materialized subsequences);
  * the scorer is pure codegen'd Column folds (aggregate/transform over the
  * BOUND window attribute — no UDF, no catalyst→Scala serialization, and
  * every fold is LEFT-TO-RIGHT so a DuckDB oracle reproduces the doubles
  * bit-for-bit, the q93 discipline); global top-k via orderBy+limit =
  * TakeOrderedAndProject (O(k) per partition map-side, never a full sort).
  *
  * Null metric points are dropped from the series up front (a null cannot
  * be z-scored; collect_list would silently skip it and shift every window
  * crossing it — excluding the row keeps the window set well-defined and
  * documented). Flat windows (sd = 0) have no z-shape and are skipped.
  *
  * The query pattern is compared AS GIVEN (pre-normalize it if scale
  * invariance on the query side is wanted). At real scale with long
  * windows, the MASS/FFT trick replaces the per-window fold; this operator
  * is the exact small-w form.
  */
object SeriesSearch {

  /** Top-k windows. Output: (rank, key, start_tie, dist) — `start_tie` is
    * the tie-break column's value at the window's first row.
    */
  def topKWindows(series: DataFrame, keyCol: String, tsCol: String, tieCol: String,
                  valueCol: String, pattern: Array[Double], k: Int): DataFrame = {
    val w = pattern.length
    require(w >= 2, s"pattern must have >= 2 points, got $w")
    require(k >= 1, s"k must be >= 1, got $k")
    val frame = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol)).rowsBetween(Window.currentRow, w - 1)
    val pat = array(pattern.map(lit).toIndexedSeq: _*)
    val wd = lit(w.toDouble)
    // every fold references only BOUND attributes (__win/__mu/__sd are each
    // used more than once, so CollapseProject cannot inline them into the
    // lambdas — the lambda-CSE rule)
    val windows = series
      .filter(col(valueCol).isNotNull)
      .withColumn("__win", collect_list(col(valueCol).cast("double")).over(frame))
      .filter(size(col("__win")) === w)
      .withColumn("__mu",
        aggregate(col("__win"), lit(0.0), (acc, x) => acc + x) / wd)
      .withColumn("__sd", sqrt(
        aggregate(transform(col("__win"), x => (x - col("__mu")) * (x - col("__mu"))),
          lit(0.0), (acc, x) => acc + x) / wd))
      .filter(col("__sd") > 0.0)
      .withColumn("dist",
        aggregate(
          zip_with(col("__win"), pat,
            (x, q) => ((x - col("__mu")) / col("__sd") - q) * ((x - col("__mu")) / col("__sd") - q)),
          lit(0.0), (acc, x) => acc + x))
      .select(col(keyCol).as("key"), col(tieCol).as("start_tie"), col("dist"))
    // global top-k via orderBy+limit = TakeOrderedAndProject; deterministic
    // (dist, key, tie) tie-break. Ranks are a window over the k survivors.
    val top = windows.orderBy(col("dist"), col("key"), col("start_tie")).limit(k)
    top.withColumn("rank",
        row_number().over(Window.orderBy(col("dist"), col("key"), col("start_tie"))).cast("long"))
      .select(col("rank"), col("key"), col("start_tie"), col("dist"))
  }
}
