package graft.anomaly

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ML_DETECT_ANOMALIES (reference: LAB3-Walkthrough.md:119-132,
  * LAB4-Walkthrough.md:150-163,185-190) re-expressed Spark-first.
  *
  * Behavioral contract reproduced from the reference:
  *   - per-key, event-time-ordered history capped at `maxTrainingSize`;
  *   - no detection until `minTrainingSize` history rows exist (warm-up);
  *   - output struct (forecast_value, upper_bound, lower_bound, is_anomaly);
  *   - `is_anomaly` ⇔ value outside [lower, upper];
  *   - band width driven by `confidencePercentage`.
  *
  * Forecast model: trailing-history mean with a symmetric z·stddev confidence
  * band (the reference's ARIMA engine is closed; the contract above is what its
  * labs rely on — warm-up gating, band, surge-above-upper filter).
  *
  * Batch integration below is pure window functions (avg/stddev_samp/count over
  * a rows-frame) — fully codegen'd, one shuffle on the partition keys, and
  * oracle-checkable against identical SQL in DuckDB.
  */
object AnomalyDetector {

  /** `enableStl` mirrors the reference's `'enableStl' = FALSE` config key
    * (LAB4-Walkthrough.md:185-190). Every observed reference call sets it
    * FALSE; the seasonal-decomposition path is unimplemented here, so TRUE is
    * rejected fast and loudly rather than silently ignored.
    */
  case class Config(minTrainingSize: Int, maxTrainingSize: Int, confidencePercentage: Double,
                    enableStl: Boolean = false) {
    require(minTrainingSize >= 2, "need >=2 history rows for a stddev")
    require(!enableStl,
      "enableStl=TRUE (STL seasonal decomposition) is not implemented; every reference call site sets FALSE (LAB4-Walkthrough.md:185-190)")
    val z: Double = Gaussian.invCdf(0.5 + confidencePercentage / 200.0)
  }

  /** Batch (bounded) detection: adds forecast_value, upper_bound, lower_bound,
    * is_anomaly columns. `orderCols` must be a deterministic total order within
    * each key (add a row id as tie-break if the timestamp can repeat).
    */
  def detectBatch(df: DataFrame, valueCol: Column, partitionCols: Seq[Column],
                  orderCols: Seq[Column], cfg: Config): DataFrame = {
    val hist = Window.partitionBy(partitionCols: _*).orderBy(orderCols: _*)
      .rowsBetween(-cfg.maxTrainingSize, -1)
    val v = valueCol.cast("double")
    // mean/stddev from decimal-exact sums (order-independent, bit-reproducible
    // across engines) rather than a streaming estimator like stddev_samp whose
    // float result depends on accumulation order.
    val s1 = sum(v.cast("decimal(27,6)")).over(hist).cast("double")
    val s2 = sum((v * v).cast("decimal(38,8)")).over(hist).cast("double")
    val n = count(v).over(hist).cast("double")
    val forecast = s1 / n
    val sd = sqrt(greatest((s2 - s1 * s1 / n) / (n - 1), lit(0.0)))
    val warm = n >= cfg.minTrainingSize
    val upper = forecast + lit(cfg.z) * sd
    val lower = forecast - lit(cfg.z) * sd
    df.withColumn("forecast_value", when(warm, forecast))
      .withColumn("upper_bound", when(warm, upper))
      .withColumn("lower_bound", when(warm, lower))
      .withColumn("is_anomaly", when(warm, v > upper || v < lower).otherwise(lit(false)))
  }

  /** Pure-Scala single-series twin of detectBatch — the reference implementation
    * the streaming operator is tested against. Input must be time-ordered.
    * Returns (forecast, upper, lower, isAnomaly) per element.
    */
  def detectSeries(values: Seq[Double], cfg: Config): Seq[(Option[Double], Option[Double], Option[Double], Boolean)] = {
    val buf = scala.collection.mutable.Queue.empty[Double]
    values.map { v =>
      val out = if (buf.size >= cfg.minTrainingSize) {
        val n = buf.size
        val mean = buf.sum / n
        val variance = buf.map(x => (x - mean) * (x - mean)).sum / (n - 1)
        val sd = math.sqrt(variance)
        val (lo, hi) = (mean - cfg.z * sd, mean + cfg.z * sd)
        (Some(mean), Some(hi), Some(lo), v > hi || v < lo)
      } else (None, None, None, false)
      buf.enqueue(v)
      if (buf.size > cfg.maxTrainingSize) buf.dequeue()
      out
    }
  }
}

/** Inverse normal CDF, Acklam's rational approximation (public-domain constants,
  * |rel err| < 1.15e-9) — used to turn confidencePercentage into a z-score.
  */
object Gaussian {
  private val a = Array(-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
    1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00)
  private val b = Array(-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
    6.680131188771972e+01, -1.328068155288572e+01)
  private val c = Array(-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
    -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00)
  private val d = Array(7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
    3.754408661907416e+00)

  def invCdf(p: Double): Double = {
    require(p > 0.0 && p < 1.0, s"p out of range: $p")
    val pLow = 0.02425
    if (p < pLow) {
      val q = math.sqrt(-2 * math.log(p))
      (((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
        ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1)
    } else if (p <= 1 - pLow) {
      val q = p - 0.5
      val r = q * q
      (((((a(0) * r + a(1)) * r + a(2)) * r + a(3)) * r + a(4)) * r + a(5)) * q /
        (((((b(0) * r + b(1)) * r + b(2)) * r + b(3)) * r + b(4)) * r + 1)
    } else {
      val q = math.sqrt(-2 * math.log(1 - p))
      -(((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
        ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1)
    }
  }
}
