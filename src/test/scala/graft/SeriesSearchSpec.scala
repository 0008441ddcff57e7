package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.SeriesSearch

class SeriesSearchSpec extends SparkSpec {

  private val pat = Array(-1.0, -1.0, 1.0, 3.0, 1.0, -1.0, -1.0, -1.0)

  private def mkSeries(vals: Seq[(String, Int, Double)]) = {
    import spark.implicits._
    vals.map { case (k, i, v) =>
      (k, new Timestamp(1700000000000L + i * 3600000L), v)
    }.toDF("key", "h", "v")
  }

  test("finds planted pattern occurrences regardless of offset and scale (z-normalization)") {
    // deterministic wiggle + two affine plantings of the pattern on
    // different keys: 100 + 5*pat at position 40 of key a, 3 + 0.2*pat at
    // position 70 of key b — z-normalized shape identical, so BOTH must
    // lead the ranking over all wiggle windows
    def wiggle(i: Int) = math.sin(i * 1.7) * 1.3
    val a = (0 until 120).map(i => ("a", i,
      if (i >= 40 && i < 48) 100.0 + 5.0 * pat(i - 40) else 100.0 + wiggle(i)))
    val b = (0 until 120).map(i => ("b", i,
      if (i >= 70 && i < 78) 3.0 + 0.2 * pat(i - 70) else 3.0 + wiggle(i + 7)))
    val out = SeriesSearch.topKWindows(mkSeries(a ++ b), "key", "h", "h", "v", pat, k = 4)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(3)))
    val top2 = out.take(2).map(_._2).toSet
    assert(top2 == Set("a", "b"), s"both plantings must lead: ${out.mkString(", ")}")
    assert(out(1)._3 < out(2)._3 - 0.5,
      s"plantings must beat wiggle windows by a clear margin: ${out.mkString(", ")}")
  }

  test("flat windows are skipped, not scored as 0/0") {
    val flat = (0 until 40).map(i => ("c", i, 7.0))
    val out = SeriesSearch.topKWindows(mkSeries(flat), "key", "h", "h", "v", pat, k = 5)
    assert(out.count() == 0, "a constant series has no z-shape to match")
  }
}
