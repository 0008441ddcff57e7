package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.anomaly.{AnomalyDetector, Gaussian}

class GaussianSpec extends AnyFunSuite {
  test("invCdf matches known z-scores") {
    assert(math.abs(Gaussian.invCdf(0.975) - 1.959963985) < 1e-6)
    assert(math.abs(Gaussian.invCdf(0.9995) - 3.290526731) < 1e-6)
    assert(math.abs(Gaussian.invCdf(0.5)) < 1e-9)
    assert(math.abs(Gaussian.invCdf(0.025) + 1.959963985) < 1e-6)
  }
}

class AnomalyDetectorSpec extends SparkSpec {
  private val cfg = AnomalyDetector.Config(minTrainingSize = 3, maxTrainingSize = 5, confidencePercentage = 95.0)

  test("detectSeries: no output before warm-up, flags an obvious spike") {
    val series = Seq(10.0, 11.0, 10.0, 11.0, 10.0, 100.0, 10.0)
    val out = AnomalyDetector.detectSeries(series, cfg)
    assert(out.take(3).forall(o => o._1.isEmpty && !o._4))
    assert(out(5)._4, "spike at index 5 should be anomalous")
    assert(out(5)._1.isDefined && out(5)._2.isDefined)
    assert(!out(6)._4 || out(6)._4) // post-spike row exists (history now contains the spike)
  }

  test("detectSeries: history is capped at maxTrainingSize") {
    val series = (1 to 20).map(_.toDouble)
    val out = AnomalyDetector.detectSeries(series, cfg)
    // forecast at i uses at most the 5 previous values
    val f = out(10)._1.get
    assert(math.abs(f - (6 to 10).sum / 5.0) < 1e-12)
  }

  test("detectBatch agrees with detectSeries on a single key") {
    import spark.implicits._
    val vals = Seq(10.0, 12.0, 9.0, 11.0, 10.0, 50.0, 10.0, 11.0, 9.0, 10.0)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("seq", "v")
    val got = AnomalyDetector.detectBatch(df, col("v"), Seq(lit(1)), Seq(col("seq")), cfg)
      .orderBy("seq")
      .select("forecast_value", "upper_bound", "lower_bound", "is_anomaly")
      .collect()
    val want = AnomalyDetector.detectSeries(vals, cfg)
    got.zip(want).zipWithIndex.foreach { case ((row, (f, hi, lo, anom)), i) =>
      def approx(a: Option[Double], b: Any): Unit = (a, Option(b)) match {
        case (None, v)          => assert(v.isEmpty || row.isNullAt(0), s"row $i expected null")
        case (Some(x), Some(y)) => assert(math.abs(x - y.asInstanceOf[Double]) < 1e-9, s"row $i: $x vs $y")
        case other              => fail(s"row $i mismatch: $other")
      }
      approx(f, if (row.isNullAt(0)) null else row.getDouble(0))
      approx(hi, if (row.isNullAt(1)) null else row.getDouble(1))
      approx(lo, if (row.isNullAt(2)) null else row.getDouble(2))
      assert(row.getBoolean(3) === anom, s"row $i is_anomaly")
    }
  }
}
