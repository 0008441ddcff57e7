package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Vectors
import graft.operators.TopK

/** Contrastive-training pair construction: the sampling stages a retrieval /
  * embedding training pipeline runs over the curated corpus.
  *
  *  - [[negativeSamples]]: k uniform "random" negatives per anchor, where
  *    random = a deterministic md5 draw keyed to (anchor, candidate) — the
  *    same engine-portable randomness discipline as the split/shuffle
  *    operators, so epochs are reproducible across runs, layouts, and
  *    engines (and the DuckDB oracle can check the draw bit-for-bit).
  *  - [[hardNegatives]]: the classic ANCE/DPR move — per anchor, the most
  *    similar corpus vectors whose label DIFFERS (similar-but-wrong beats
  *    random-wrong for training signal).
  *
  * Scale shape: both route through the bounded [[TopK]] aggregator —
  * candidate scoring is map-side partial, O(anchors·k) rows shuffle, never
  * a per-anchor sort or a corpus-wide window. The anchors side broadcasts;
  * the corpus streams. Candidate generation is anchors × corpus row-local
  * work — bounded anchor sets by construction (a training batch, not the
  * corpus); for anchor sets at corpus scale, route through [[Dedup]]-style
  * bucketing or the ANN indexes instead of exact scoring.
  */
object Contrastive {

  /** k deterministic uniform negatives per anchor: the k corpus ids with the
    * smallest `md5(anchor:candidate)` 52-bit prefix (exact in a double, so
    * the TopK aggregator's double score reproduces the integer order
    * bit-for-bit), candidate != anchor. Output (anchor_id, neg_id, rank).
    */
  def negativeSamples(corpus: DataFrame, idCol: String, anchors: DataFrame,
                      anchorIdCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val pairs = corpus.select(col(idCol).as("__cid"))
      .join(broadcast(anchors.select(col(anchorIdCol).as("anchor_id"))),
        col("anchor_id") =!= col("__cid"))
      .withColumn("__h", conv(substring(md5(
        concat(col("anchor_id").cast("string"), lit(":"), col("__cid").cast("string"))),
        1, 13), 16, 10).cast("long"))
    // smallest hash = highest -h score; ties (impossible at 52 bits over a
    // real corpus, but still) break on id ascending inside TopKAgg
    val agg = pairs.groupBy("anchor_id")
      .agg(TopK.topK(k)(-col("__h").cast("double"), col("__cid")).as("neg"))
    TopK.explodeRanked(agg, "neg", Seq(col("anchor_id")))
      .select(col("anchor_id"), col("id").as("neg_id"), col("rank"))
  }

  /** k hardest negatives per anchor vector: most cosine-similar corpus
    * vectors with a DIFFERENT label. Output (anchor_id, neg_id, sim, rank).
    */
  def hardNegatives(corpus: DataFrame, idCol: String, vecCol: String, labelCol: String,
                    anchors: DataFrame, anchorIdCol: String, anchorVecCol: String,
                    anchorLabelCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val a = anchors.select(col(anchorIdCol).as("anchor_id"),
      col(anchorVecCol).as("__av"), col(anchorLabelCol).as("__al"))
    val scored = corpus
      .select(col(idCol).as("__cid"), col(vecCol).as("__cv"), col(labelCol).as("__cl"))
      .join(broadcast(a), col("anchor_id") =!= col("__cid") && col("__al") =!= col("__cl"))
      .select(col("anchor_id"), col("__cid"),
        Vectors.cosine(col("__av"), col("__cv")).as("__sim"))
    val agg = scored.groupBy("anchor_id")
      .agg(TopK.topK(k)(col("__sim"), col("__cid")).as("neg"))
    TopK.explodeRanked(agg, "neg", Seq(col("anchor_id")))
      .select(col("anchor_id"), col("id").as("neg_id"), col("score").as("sim"), col("rank"))
  }
}
