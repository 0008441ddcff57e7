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
    // outdeg rides the edge list (one join, before the loop) — each round
    // then pays exactly one src-keyed join + one dst-keyed partial-agg shuffle
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val eDeg = e.join(outdeg, "src").localCheckpoint()

    // Ranks and contributions are |V|-row tables; below `broadcastMaxNodes`
    // they broadcast into both per-round joins, so the |E|-row edge side
    // NEVER shuffles inside the loop — each round is one map-side-combined
    // partial agg (localCheckpoint does not preserve outputPartitioning, so
    // pre-partitioning the edges cannot achieve this; measured no-op). Above
    // the gate the loop falls back to the shuffled joins — same integer
    // arithmetic, so results are bit-identical either way (sum of longs is
    // order-independent). sf1 445k-edge fixture: ~1.2 -> ~0.6 s/round.
    val bcast = n <= 2000000L
    var ranks = nodes.withColumn("rank_fp", lit(Scale / n))
    for (_ <- 1 to iters) {
      val r = if (bcast) broadcast(ranks) else ranks
      val contrib0 = eDeg.join(r, eDeg("src") === r("node"))
        .select(col("dst"),
          expr("(85 * (rank_fp DIV outdeg)) DIV 100").as("c"))
        .groupBy("dst").agg(sum("c").as("inflow"))
      val contrib = if (bcast) broadcast(contrib0) else contrib0
      ranks = nodes.join(contrib, nodes("node") === contrib("dst"), "left")
        .select(col("node"),
          (lit(base) + coalesce(col("inflow"), lit(0L))).as("rank_fp"))
        .localCheckpoint()
    }
    ranks.withColumn("rank", col("rank_fp").cast("double") / lit(Scale.toDouble))
  }

  /** Exact triangle count over an undirected graph (clustering/cohesion
    * metric; spam-farm detection on crawl graphs).
    *
    * The naive 3-way self-join generates every wedge at every vertex — a
    * power-law hub of degree d contributes O(d²) wedges and one reducer
    * melts. Orienting each edge from its LOWER-degree endpoint to its higher
    * (ties by id) and only generating wedges at edge SOURCES bounds total
    * wedge work by O(|E|^{3/2}) regardless of skew (Schank–Wagner / the
    * standard MapReduce formulation) — the hub never fans out because
    * everything points AT it. Orientation only reorders each triangle's
    * edges, so the count is exact.
    *
    * Plan: canonicalize (dedupe, drop self-loops) → one degree agg →
    * wedge self-join keyed on the wedge apex → one semi-join of wedges
    * against the oriented edge set → count. Two keyed shuffles of id pairs —
    * no payload ever moves.
    */
  def triangleCount(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val canon = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("a"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val deg = canon.select(col("a").as("node")).union(canon.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // orient: from the (deg, id)-smaller endpoint to the larger
    val withDeg = canon
      .join(deg.withColumnRenamed("node", "a").withColumnRenamed("deg", "da"), "a")
      .join(deg.withColumnRenamed("node", "b").withColumnRenamed("deg", "db"), "b")
    val aFirst = col("da") < col("db") || (col("da") === col("db") && col("a") < col("b"))
    val oriented = withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("u"),
      when(aFirst, col("da")).otherwise(col("db")).as("du"),
      when(aFirst, col("b")).otherwise(col("a")).as("v"),
      when(aFirst, col("db")).otherwise(col("da")).as("dv"))
    // wedges at each source u: unordered pair (v, w) in orientation order
    val e1 = oriented.select(col("u"), col("v").as("x"), col("dv").as("dx"))
    val e2 = oriented.select(col("u"), col("v").as("y"), col("dv").as("dy"))
    val wedges = e1.join(e2, "u")
      .filter(col("dx") < col("dy") || (col("dx") === col("dy") && col("x") < col("y")))
      .select(col("x").as("u"), col("y").as("v"))
    // inner (not semi) join: the same closing edge may finish wedges from
    // many apexes — each is its own triangle
    val closed = wedges.join(oriented.select("u", "v"), Seq("u", "v"))
    closed.agg(count(lit(1)).cast("long").as("n_triangles"))
  }
}
