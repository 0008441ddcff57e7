package graft

import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpec {

  test("q70 sketches stay within their error contracts vs the exact answers") {
    val li = graft.core.Tables(spark, sfDir, "lineitem")
    val exact = li.groupBy("l_returnflag").agg(
      countDistinct(col("l_orderkey")).as("orders"),
      countDistinct(col("l_partkey")).as("parts"),
      percentile(col("l_extendedprice"), lit(0.5)).as("median"))
      .collect().map(r => r.getString(0) -> r).toMap
    val approx = graft.queries.Catalog.queries("q70_approx_sketches")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(approx.keySet == exact.keySet)
    for ((flag, a) <- approx) {
      val e = exact(flag)
      // HLL++ default rsd = 5%; 3σ bound
      assert(math.abs(a.getLong(1) - e.getLong(1)).toDouble / e.getLong(1) < 0.15,
        s"$flag approx_orders ${a.getLong(1)} vs ${e.getLong(1)}")
      assert(math.abs(a.getLong(2) - e.getLong(2)).toDouble / e.getLong(2) < 0.15,
        s"$flag approx_parts ${a.getLong(2)} vs ${e.getLong(2)}")
      // percentile_approx(accuracy=10000): rank error ≤ n/10000 → tight here
      assert(math.abs(a.getDouble(3) - e.getDouble(3)) / e.getDouble(3) < 0.02,
        s"$flag median ${a.getDouble(3)} vs ${e.getDouble(3)}")
    }
  }

  test("sketch aggregates plan map-side partials (mergeable, no raw shuffle)") {
    val plan = graft.queries.Catalog.queries("q70_approx_sketches")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // partial_ aggregates before the exchange = per-partition sketches merge,
    // raw rows never cross the wire — the property that makes HLL the 100 TB
    // answer to DISTINCT
    assert(plan.contains("partial_approx_count_distinct"), plan)
  }
}
