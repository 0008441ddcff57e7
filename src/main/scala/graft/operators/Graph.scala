package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative graph compute on DataFrames. [[graft.llmops.Dedup]] owns the
  * connectivity family (large-star/small-star CC); this is the
  * value-propagation family — PageRank as the canonical member (crawl-graph
  * quality weighting ahead of corpus curation, the CommonCrawl/OPIC use).
  *
  * Fixed-point integer arithmetic throughout: ranks are longs in units of
  * 1e-15 (`SCALE`), every step is integer multiply/divide, so the result is
  * bit-identical across partitionings, engines, and retries — the same
  * reason the curation oracles use decimals. Error vs real-valued PageRank
  * is <= iters * maxInDegree ulps of 1e-15 — noise for ranking purposes.
  */
object Graph {

  val Scale: Long = 1000000000000000L // 1e15: rank_fp units

  /** PageRank over an edge list, damping 0.85, `iters` synchronous rounds.
    *
    * Per round each node receives `(85 * (rank_src div outdeg_src)) div 100`
    * along every in-edge and adds the teleport base
    * `(15 * (SCALE div N)) div 100` — damping applied per-edge BEFORE the
    * sum keeps every intermediate under 85e15 * inDegree (overflow-safe to
    * ~10^17 edges into one node). Dangling-node mass is dropped (ranks then
    * sum to slightly under SCALE) — the standard simplification; callers
    * needing a stochastic matrix should self-loop sinks first.
    *
    * Scale shape: ranks/outdeg are node-keyed, contributions shuffle once
    * per round keyed on dst (map-side-combined sum), and each round is
    * localCheckpoint-ed so the plan stays one-round deep instead of growing
    * a 2^iters join tree. Edges are reused every round — persist them at
    * real scale (they dominate the work; ranks are |V| rows vs |E|).
    *
    * Returns (node, rank_fp, rank = rank_fp/1e15).
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 5): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint()
    val n = nodes.count() max 1L
    val base = (15L * (Scale / n)) / 100L
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg")).localCheckpoint()

    var ranks = nodes.withColumn("rank_fp", lit(Scale / n))
    for (_ <- 1 to iters) {
      val contrib = e.join(ranks, e("src") === ranks("node"))
        .join(outdeg, "src")
        .select(col("dst"),
          expr("(85 * (rank_fp DIV outdeg)) DIV 100").as("c"))
        .groupBy("dst").agg(sum("c").as("inflow"))
      ranks = nodes.join(contrib, nodes("node") === contrib("dst"), "left")
        .select(col("node"),
          (lit(base) + coalesce(col("inflow"), lit(0L))).as("rank_fp"))
        .localCheckpoint()
    }
    ranks.withColumn("rank", col("rank_fp").cast("double") / lit(Scale.toDouble))
  }
}
