package graft

import org.apache.spark.sql.functions._

import graft.llmops.Contrastive

class ContrastiveSpec extends SparkSpec {
  import spark.implicits._

  test("negativeSamples: k per anchor, never the anchor, layout-invariant draw") {
    val corpus = (1L to 200L).map(i => (i, s"d$i")).toDF("id", "payload")
    val anchors = (1L to 10L).toDF("id")
    def draw(parts: Int) =
      Contrastive.negativeSamples(corpus.repartition(parts), "id", anchors, "id", k = 7)
        .select("anchor_id", "neg_id", "rank").as[(Long, Long, Long)]
        .collect().sortBy(r => (r._1, r._3)).toSeq
    val d = draw(3)
    assert(d.size == 70 && d.forall { case (a, n, _) => a != n })
    assert(d.groupBy(_._1).forall(_._2.map(_._3).sorted == (1L to 7L)))
    assert(d == draw(13), "the draw must not depend on the physical layout")
    // distinct anchors draw (mostly) different sets — it's a per-anchor hash
    val sets = d.groupBy(_._1).map(_._2.map(_._2).toSet).toSeq
    assert(sets.distinct.size == sets.size)
  }

  test("hardNegatives: most-similar different-label vectors, label contract enforced") {
    // two clusters: label 0 near (1,0), label 1 near (0,1); anchor in cluster 0.
    // its hard negatives are the label-1 vectors LEANING TOWARD it most.
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(0.9f, 0.1f), 0), (3L, Array(0.95f, 0.05f), 0),
      (10L, Array(0.0f, 1.0f), 1), (11L, Array(0.3f, 0.7f), 1), (12L, Array(0.1f, 0.9f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Contrastive.hardNegatives(vecs, "vec_id", "embedding", "label",
        vecs.filter(col("vec_id") === 1L), "vec_id", "embedding", "label", k = 2)
      .select("neg_id", "rank").as[(Long, Long)].collect().sortBy(_._2).toSeq
    assert(out == Seq((11L, 1L), (12L, 2L)), s"got $out") // 11 leans most toward cluster 0
  }
}
