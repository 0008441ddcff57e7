package graft

import org.apache.spark.sql.functions._

import graft.llmops.Dedup

class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  /** 3 tight orthogonal groups of 4 vectors + 2 isolated singletons. */
  private def planted = {
    val dim = 8
    def vec(axis: Int, wobble: Int): Array[Float] = {
      val v = Array.fill(dim)(0.0f)
      v(axis) = 1.0f
      v((axis + 4) % dim) = 0.01f * wobble // tiny deterministic perturbation
      v
    }
    val groups = for (g <- 0 until 3; i <- 0 until 4)
      yield ((g * 4 + i).toLong, vec(g, i))
    val isolated = Seq((100L, vec(6, 0)), (101L, vec(7, 0)))
    (groups ++ isolated).toDF("vec_id", "embedding")
  }

  test("planted tight clusters: full within-group recall, nothing across groups") {
    val out = Dedup.semanticDedup(planted, "embedding", "vec_id", threshold = 0.9,
      nClusters = 3, iterations = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val expected = (for (g <- 0 until 3; i <- 0 until 4; j <- (i + 1) until 4)
      yield ((g * 4 + i).toLong, (g * 4 + j).toLong)).toSet
    assert(out == expected)
  }

  test("pairs are a subset of the exact quadratic oracle with identical cosines") {
    val exact = Dedup.embeddingNearDup(planted, "embedding", "vec_id", threshold = 0.9)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val sem = Dedup.semanticDedup(planted, "embedding", "vec_id", threshold = 0.9,
      nClusters = 3, iterations = 4).as[(Long, Long, Double)].collect()
    assert(sem.nonEmpty)
    sem.foreach { case (a, b, c) =>
      assert(exact.contains((a, b)), s"($a,$b) not in exact pair set")
      assert(exact((a, b)) == c, s"cosine mismatch for ($a,$b)")
    }
  }

  test("degenerate giant cluster is capped, counted, never silent") {
    val st = new Dedup.CapStats(spark)
    // one cluster: all 12 grouped vectors collapse when nClusters = 1
    val out = Dedup.semanticDedup(planted, "embedding", "vec_id", threshold = 0.9,
      nClusters = 1, iterations = 1, maxClusterSize = 5, capStats = st)
    assert(out.count() == 0)
    assert(st.droppedBuckets == 1L && st.droppedRows == 14L)
  }

  test("vector-identical clones resolve fully and carry the COMPUTED self-cosine") {
    // the round-6 collapse runs after assignment: clones share a cluster by
    // construction and every clone pair must surface, with cosine equal to
    // the computed cosine(v, v) (not an assumed literal 1.0 — the collapse
    // must preserve last-ulp behavior). Zero-vector clones surface with a
    // NaN cosine: Spark orders NaN ABOVE every double, so `NaN >= t` is
    // true — the same row the direct within-cluster join always emitted
    // (callers screening degenerate vectors filter isnan upstream).
    val base = planted
    val dups = Seq((200L, {
      val v = Array.fill(8)(0.0f); v(0) = 1.0f; v
    }), (201L, { val v = Array.fill(8)(0.0f); v(0) = 1.0f; v }),
      (300L, Array.fill(8)(0.0f)), (301L, Array.fill(8)(0.0f))).toDF("vec_id", "embedding")
    val out = Dedup.semanticDedup(base.union(dups), "embedding", "vec_id",
      threshold = 0.9, nClusters = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out.contains((200L, 201L)), s"clone pair missing: ${out.keys}")
    val selfCos = out((200L, 201L))
    assert(selfCos >= 0.999999 && selfCos <= 1.0)
    assert(out.contains((300L, 301L)) && out((300L, 301L)).isNaN,
      "zero-vector clones keep their NaN-cosine pair (Spark sorts NaN above all doubles)")
  }
}
