package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra–Gries frequent-items summary as a typed Aggregator — the
  * bounded-memory heavy-hitter path for when the exact count-agg's key space
  * (e.g. the full n-gram vocabulary of a 100 TB corpus) does not fit anywhere.
  *
  * Each partition keeps at most `m` counters (the classic decrement step);
  * partial summaries MERGE by pointwise sum followed by subtracting the
  * (m+1)-th largest count (Agarwal et al., "Mergeable Summaries", PODS'12) —
  * so Spark's ObjectHashAggregate runs it map-side and ships m counters per
  * partition, never the key space. Deterministic totals are NOT guaranteed
  * (estimates depend on arrival order), but the bounds are:
  *
  *   true(x) − N/(m+1)  ≤  estimate(x)  ≤  true(x)
  *
  * for N = total items — hence every x with true(x) > N/(m+1) survives with a
  * positive count. The exact twin ([[graft.llmops.CorpusStats.topNgrams]]) is
  * the oracle the spec checks those bounds against.
  */
class MisraGriesAgg(m: Int) extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {
  require(m >= 1, s"m must be >= 1, got $m")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], a: String): Map[String, Long] =
    b.get(a) match {
      case Some(c) => b.updated(a, c + 1)
      case None if b.size < m => b.updated(a, 1L)
      case None => b.collect { case (k, c) if c > 1 => k -> (c - 1) }
    }

  override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
    val sum = y.foldLeft(x) { case (acc, (k, c)) => acc.updated(k, acc.getOrElse(k, 0L) + c) }
    if (sum.size <= m) sum
    else {
      val thresh = sum.values.toIndexedSeq.sorted(Ordering[Long].reverse)(m) // (m+1)-th largest
      sum.collect { case (k, c) if c > thresh => k -> (c - thresh) }
    }
  }

  override def finish(r: Map[String, Long]): Seq[(String, Long)] =
    r.toSeq.sortBy { case (k, c) => (-c, k) }

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[(String, Long)]] = ExpressionEncoder[Seq[(String, Long)]]()
}

object FrequentItems {

  /** Heavy-hitter estimates for an exploded item column: one row per
    * surviving counter, (item, est_count), est_count descending. `m` bounds
    * both the working memory per task and the shuffle (m rows per partition).
    */
  def frequent(df: DataFrame, itemCol: Column, m: Int): DataFrame = {
    val agg = udaf(new MisraGriesAgg(m), ExpressionEncoder[String]())
    // null items are skipped: Catalyst MapType (the partial buffer) forbids
    // null keys, and a null n-gram carries no frequency signal anyway
    df.select(itemCol.cast("string").as("__item"))
      .filter(col("__item").isNotNull)
      .agg(agg(col("__item")).as("__mg"))
      .select(explode(col("__mg")).as("e"))
      .select(col("e._1").as("item"), col("e._2").as("est_count"))
  }
}
