package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions._

/** One (score, id) candidate. Ordering: score DESC, id ASC (deterministic ties). */
case class ScoredId(score: Double, id: Long)

/** Bounded per-key top-k as a typed Aggregator.
  *
  * Why not a rank() window: a window function shuffles every candidate row to
  * its key's partition before ranking — O(N) shuffle. An Aggregator gets
  * map-side partial aggregation (ObjectHashAggregate), so each input partition
  * ships at most k rows per key: O(keys·k) shuffle. For a knn over a 100 TB
  * corpus that is the difference between shuffling the corpus and shuffling the
  * answer.
  */
class TopKAgg(k: Int) extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
  private def ord: Ordering[ScoredId] = Ordering.by((s: ScoredId) => (-s.score, s.id))
  override def zero: Seq[ScoredId] = Nil
  override def reduce(b: Seq[ScoredId], a: ScoredId): Seq[ScoredId] =
    if (b.lengthCompare(k) >= 0 && ord.lteq(b.last, a)) b
    else (a +: b).sorted(ord).take(k)
  override def merge(a: Seq[ScoredId], b: Seq[ScoredId]): Seq[ScoredId] =
    (a ++ b).sorted(ord).take(k)
  override def finish(r: Seq[ScoredId]): Seq[ScoredId] = r
  override def bufferEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder[Seq[ScoredId]]()
  override def outputEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder[Seq[ScoredId]]()
}

object TopK {

  /** Untyped UDAF: call as `topK(k)(scoreCol, idCol)` inside `groupBy(...).agg`. */
  def topK(k: Int): UserDefinedFunction = {
    implicit val inEnc: Encoder[ScoredId] = Encoders.product[ScoredId]
    udaf(new TopKAgg(k), inEnc)
  }

  /** Per-group top-k rows as a first-class operator: the bounded-aggregator
    * alternative to `row_number() OVER (PARTITION BY ...) <= k`. The window
    * form shuffles and SORTS every row of every group; this one ships at most
    * k rows per group out of each input partition (map-side partial) and never
    * sorts a whole group. Output: groupCols + (rank 1-based, score, id),
    * deterministic ties (score DESC, id ASC).
    */
  def perGroup(df: DataFrame, groupCols: Seq[String], scoreCol: Column, idCol: Column,
               k: Int): DataFrame =
    explodeRanked(
      df.groupBy(groupCols.map(col): _*).agg(topK(k)(scoreCol, idCol).as("__topk")),
      "__topk", groupCols.map(col))

  /** Expand a top-k array column to (rank, score, id) rows; rank is 1-based. */
  def explodeRanked(df: DataFrame, topkCol: String, keep: Seq[Column]): DataFrame =
    df.select(keep :+ posexplode(col(topkCol)): _*)
      .withColumn("rank", (col("pos") + 1).cast("long"))
      .withColumn("score", col("col.score"))
      .withColumn("id", col("col.id"))
      .drop("pos", "col")
}
