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

  test("Misra-Gries heavy hitters: bounds hold and every true heavy item survives") {
    import spark.implicits._
    // planted skew: 2 heavy tokens over a 2000-token cold tail, N = 10000
    val items = Seq.fill(5000)("hot1") ++ Seq.fill(3000)("hot2") ++
      (0 until 2000).map(i => s"cold_$i")
    val n = items.size.toLong
    val m = 50
    val df = scala.util.Random.shuffle(items).toDF("tok").repartition(8)
    val est = graft.operators.FrequentItems.frequent(df, col("tok"), m)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.size <= m)
    val slack = n / (m + 1) // 196
    val truth = Map("hot1" -> 5000L, "hot2" -> 3000L).withDefaultValue(1L)
    est.foreach { case (k, c) =>
      assert(c <= truth(k), s"$k overestimated: $c > ${truth(k)}")
      assert(c >= truth(k) - slack, s"$k undershot the MG bound: $c < ${truth(k)} - $slack")
    }
    assert(est.contains("hot1") && est.contains("hot2"),
      "items with true count > N/(m+1) must survive the merge")
    assert(est("hot1") > est("hot2"))
  }

  test("Misra-Gries aggregates map-side: m counters per partition cross the wire, not rows") {
    import spark.implicits._
    val df = (0 until 1000).map(i => s"t$i").toDF("tok")
    val p = graft.operators.FrequentItems.frequent(df, col("tok"), 10)
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_misragriesagg"), s"map-side partial required:\n$p")
  }
}
