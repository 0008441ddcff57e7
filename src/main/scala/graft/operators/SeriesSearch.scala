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
  * doubles, the deliberate w× amplification of materialized subsequences),
  * a row-local scorer z-normalizes the window and folds the distance
  * LEFT-TO-RIGHT (deterministic — the q93 ordered-fold discipline, so a
  * DuckDB oracle reproduces it bit-for-bit), and the bounded [[TopK]]
  * aggregator ships O(k) rows per partition. Flat windows (sd = 0) have no
  * z-shape and are skipped, not scored as 0/0.
  *
  * The query pattern is compared AS GIVEN (pre-normalize it if scale
  * invariance on the query side is wanted) — keeping the engine free of a
  * driver-side normalization whose floating-point steps an oracle could
  * not see. At real scale with long windows, the MASS/FFT trick replaces
  * the per-window fold; this operator is the exact small-w form.
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
    val q = pattern // serialized into the UDF closure
    val dist = udf { (win: Seq[Double]) =>
      // left-to-right folds throughout: bit-reproducible across engines
      var s = 0.0
      var i = 0
      while (i < q.length) { s += win(i); i += 1 }
      val mean = s / q.length
      var v = 0.0
      i = 0
      while (i < q.length) { val d = win(i) - mean; v += d * d; i += 1 }
      val sd = math.sqrt(v / q.length)
      if (sd == 0.0) None
      else {
        var d2 = 0.0
        i = 0
        while (i < q.length) {
          val d = (win(i) - mean) / sd - q(i)
          d2 += d * d
          i += 1
        }
        Some(d2)
      }
    }
    val windows = series
      .withColumn("__win", collect_list(col(valueCol).cast("double")).over(frame))
      .filter(size(col("__win")) === w)
      .withColumn("dist", dist(col("__win")))
      .filter(col("dist").isNotNull)
      .select(col(keyCol).as("key"), col(tieCol).as("start_tie"), col("dist"))
    // global top-k via orderBy+limit = TakeOrderedAndProject: O(k) per
    // partition map-side, never a full sort (the L1/L2 plan family);
    // deterministic (dist, key, tie) tie-break. Ranks are a window over the
    // k survivors only.
    val top = windows.orderBy(col("dist"), col("key"), col("start_tie")).limit(k)
    top.withColumn("rank",
        row_number().over(Window.orderBy(col("dist"), col("key"), col("start_tie"))).cast("long"))
      .select(col("rank"), col("key"), col("start_tie"), col("dist"))
  }
}
