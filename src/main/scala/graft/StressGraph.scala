package graft

import org.apache.spark.sql.functions._

/** Round-5 scale-stress main: the iterative/graph/layout operators at
  * volumes where the naive plans stop working, on generated data.
  *
  *   1. PageRank over a 10M-edge power-law graph with a mega-hub (in-degree
  *      ~500k) — the per-edge damping and dst-keyed partial aggregation must
  *      absorb the hub without a hot reducer melting.
  *   2. Triangle counting on a 3M-edge graph with the same hub — the
  *      degree-ordered orientation's reason to exist: naive wedge generation
  *      at the hub alone would be ~2.5e11 pairs; oriented, every edge points
  *      AT the hub and it generates zero wedges.
  *   3. Total-order sort of 20M rows — the two-pass prefix count against the
  *      single-task row_number window that cannot scale.
  *
  * Run: SPARK_GRAFT_CPUS=32 sbt "runMain graft.StressGraph"
  */
object StressGraph {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = core.Sessions.localCpus(cpus) // the shared factory (r16)

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stress] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // 1. power-law-ish graph: 10M edges over 1M nodes; every 20th edge points
    //    at node 0 (the mega-hub, in-degree ~500k)
    val nEdges = 10000000L
    val nNodes = 1000000L
    val edges = spark.range(nEdges).select(
      pmod(xxhash64(col("id")), lit(nNodes)).as("src"),
      when(pmod(col("id"), lit(20)) === 0, lit(0L))
        .otherwise(pmod(xxhash64(col("id"), lit(1)), lit(nNodes))).as("dst"))
    val ranks = timed(s"pageRank 5 rounds, $nEdges edges / $nNodes nodes, hub in-degree ~500k") {
      operators.Graph.pageRank(edges, "src", "dst", iters = 5)
        .orderBy(col("rank_fp").desc).limit(3).collect()
    }
    println(s"[stress] top ranks: ${ranks.map(r => s"${r.getLong(0)}=${r.getDouble(2)}").mkString(", ")}")
    assert(ranks.head.getLong(0) == 0L, "the mega-hub must rank first")

    // 2. triangles: 3M edges over 50k nodes (dense enough to close wedges),
    //    same hub shape
    val tEdges = spark.range(3000000L).select(
      pmod(xxhash64(col("id")), lit(50000L)).as("src"),
      when(pmod(col("id"), lit(20)) === 0, lit(0L))
        .otherwise(pmod(xxhash64(col("id"), lit(1)), lit(50000L))).as("dst"))
    val tri = timed("triangleCount, 3M edges / 50k nodes, hub degree ~150k") {
      operators.Graph.triangleCount(tEdges, "src", "dst").head().getLong(0)
    }
    println(s"[stress] triangles: $tri")
    assert(tri > 0L)

    // 3. total-order sort: 20M rows, exact global positions
    val big = spark.range(20000000L).select(col("id"),
      pmod(xxhash64(col("id")), lit(1000000L)).as("v"))
    val sorted = timed("totalSort 20M rows (two-pass prefix count)") {
      val out = operators.Layout.totalSort(big, Seq(col("v"), col("id")), numShards = 64)
      out.agg(count(lit(1)), max("global_pos")).head()
    }
    assert(sorted.getLong(0) == 20000000L && sorted.getLong(1) == 20000000L,
      s"gap-free positions expected, got $sorted")
    println(s"[stress] totalSort rows=${sorted.getLong(0)} maxPos=${sorted.getLong(1)}")

    spark.stop()
  }
}
