package graft

import org.apache.spark.sql.functions._

import graft.operators.{Behavior, Graph}

class GraphSpec extends SparkSpec {

  /** Driver-side reference: the same fixed-point integer recurrence, computed
    * naively over in-memory maps. */
  private def naivePageRank(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val n = nodes.size.toLong
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val base = (15L * (Graph.Scale / n)) / 100L
    var ranks = nodes.map(_ -> Graph.Scale / n).toMap
    for (_ <- 1 to iters) {
      val inflow = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => (85L * (ranks(s) / outdeg(s))) / 100L }.sum
      }
      ranks = nodes.map(nd => nd -> (base + inflow.getOrElse(nd, 0L))).toMap
    }
    ranks
  }

  test("pageRank matches the driver-side fixed-point reference on a random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val edges = (1 to 400).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (s, d) => s != d }.distinct
    val got = Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", iters = 4)
      .select("node", "rank_fp").as[(Long, Long)].collect().toMap
    assert(got == naivePageRank(edges, 4))
  }

  test("pageRank ranks a hub above spokes and conserves bounded mass") {
    import spark.implicits._
    // star: 9 spokes all point at node 0, 0 points back at node 1. The 0<->1
    // cycle oscillates with amplitude ~.85^k — 40 rounds decay it below the
    // fixed-point gap.
    val edges = ((1L to 9L).map(i => (i, 0L)) :+ (0L, 1L)).toDF("src", "dst")
    val ranks = Graph.pageRank(edges, "src", "dst", iters = 40)
      .select("node", "rank").as[(Long, Double)].collect().toMap
    assert(ranks(0L) > ranks(1L) && ranks(1L) > ranks(2L)) // hub > fed spoke > plain spoke
    assert((2L to 9L).map(ranks).distinct.size == 1)       // symmetric spokes tie exactly
    val total = ranks.values.sum
    assert(total > 0.5 && total <= 1.0 + 1e-9, s"mass $total") // dangling loss only
  }

  test("triangleCount is exact on known graphs and matches a naive reference on random ones") {
    import spark.implicits._
    // K4 has C(4,3) = 4 triangles; pendants, duplicate edges, reversed
    // duplicates and self-loops must not change that
    val k4 = (for (a <- 0 to 3; b <- 0 to 3 if a < b) yield (a.toLong, b.toLong))
    val noisy = k4 ++ k4.map(_.swap) ++ Seq((0L, 0L), (3L, 9L), (9L, 3L))
    assert(Graph.triangleCount(noisy.toDF("src", "dst"), "src", "dst")
      .head().getLong(0) == 4L)

    val rnd = new scala.util.Random(21)
    val edges = (1 to 600).map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
    val canon = edges.filter(e => e._1 != e._2)
      .map(e => (e._1 min e._2, e._1 max e._2)).distinct
    val set = canon.toSet
    val naive = (for {
      (a, b) <- canon; c <- 0L until 30L
      if c > b && set((a, c)) && set((b, c))
    } yield 1).size
    assert(Graph.triangleCount(edges.toDF("src", "dst"), "src", "dst")
      .head().getLong(0) == naive.toLong)
  }

  test("transitionMatrix probabilities are exact count ratios summing to 1 per prev") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), (1L, 4L, "b"),
      (2L, 1L, "a"), (2L, 2L, "c"), (2L, 3L, "a"),
      (3L, 1L, "b"))
      .map { case (u, t, ty) => (u, new java.sql.Timestamp(1700000000000L + t * 1000), ty, u * 10 + t) }
      .toDF("user_id", "ts", "event_type", "event_id")
    val out = Behavior.transitionMatrix(ev, "user_id", "event_type", "ts", "event_id")
      .select("prev_type", "next_type", "n", "prob")
      .as[(String, String, Long, Double)].collect()
    val m = out.map { case (p, x, n, pr) => (p, x) -> ((n, pr)) }.toMap
    // user1: a->b, b->a, a->b ; user2: a->c, c->a ; user3: (no pairs)
    assert(m(("a", "b"))._1 == 2 && m(("a", "c"))._1 == 1)
    assert(m(("a", "b"))._2 == 2.0 / 3.0 && m(("a", "c"))._2 == 1.0 / 3.0)
    val byPrev = out.groupBy(_._1).map { case (_, rs) => rs.map(_._4).sum }
    byPrev.foreach(s => assert(math.abs(s - 1.0) < 1e-12))
  }
}
