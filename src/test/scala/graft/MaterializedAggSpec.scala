package graft

import org.apache.spark.sql.functions._

import graft.operators.MaterializedAgg
import graft.operators.MaterializedAgg.Spec

class MaterializedAggSpec extends SparkSpec {

  private def events = graft.core.Tables(spark, sfDir, "events")

  test("incremental merge over any batch split equals the one-shot aggregate") {
    val spec = Spec(keys = Seq("event_type"), sumCols = Seq("value"),
      minCols = Seq("value"), maxCols = Seq("value"))
    val oneShot = MaterializedAgg.finish(MaterializedAgg.init(events, spec), spec)

    // three uneven deltas on a hash split — a different partition than q132's
    val parts = (0 until 3).map(i => events.filter(abs(hash(col("event_id"))) % 3 === i))
    val folded = parts.tail.foldLeft(MaterializedAgg.init(parts.head, spec))(
      (st, d) => MaterializedAgg.merge(st, d, spec))
    val inc = MaterializedAgg.finish(folded, spec)

    val a = oneShot.collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    val b = inc.collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(a == b, "incremental finish must be bit-identical to the one-shot aggregate")
  }

  test("HLL distinct state: merged sketches estimate EXACTLY like the one-shot sketch, near exact counts") {
    val spec = Spec(keys = Seq("event_type"), distinctCols = Seq("user_id"))
    val oneShot = MaterializedAgg.finish(MaterializedAgg.init(events, spec), spec)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap

    val even = events.filter(col("event_id") % 2 === 0)
    val odd = events.filter(col("event_id") % 2 === 1)
    val merged = MaterializedAgg.finish(
      MaterializedAgg.merge(MaterializedAgg.init(even, spec), odd, spec), spec)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap

    // HLL register state is insertion-order independent and union is lossless,
    // so the merged estimate is not just close — it is the SAME number
    assert(merged == oneShot, "sketch union must reproduce the one-shot estimate exactly")

    val exact = events.groupBy("event_type").agg(countDistinct("user_id").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, d) =>
      val est = merged(k).toDouble
      assert(math.abs(est - d) / d <= 0.05, s"$k: estimate $est vs exact $d beyond 5%")
    }
  }

  test("merge refuses saved state that does not carry the spec's columns") {
    val spec = Spec(keys = Seq("event_type"), sumCols = Seq("value"))
    val bogus = events.groupBy("event_type").agg(count(lit(1)).as("n_rows"))
    val e = intercept[IllegalArgumentException] {
      MaterializedAgg.merge(bogus, events, spec)
    }
    assert(e.getMessage.contains("sum_value"))
  }
}
