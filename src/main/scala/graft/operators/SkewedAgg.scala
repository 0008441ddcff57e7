package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-stage salted aggregation for skewed keys.
  *
  * At 100 TB a groupBy on a skewed key (one city with half the events) pins a
  * single reducer. Salting splits each key into `saltBuckets` sub-keys for the
  * first (heavy) aggregation, then merges the partials in a second, tiny
  * aggregation — the classic shape AQE's skew handling applies to joins,
  * expressed for aggregations.
  *
  * Works for decomposable aggregates (sum/count/min/max); the caller supplies
  * both the partial and the merge expression per output column.
  */
object SkewedAgg {

  /** aggs: (outputName, partialAgg on raw rows, mergeAgg over partial column). */
  def apply(df: DataFrame, keys: Seq[Column], saltBuckets: Int)(
      aggs: (String, Column, String => Column)*): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val partial = salted
      .groupBy(keys :+ col("__salt"): _*)
      .agg(aggs.head._2.as(s"__p_${aggs.head._1}"),
        aggs.tail.map { case (n, p, _) => p.as(s"__p_$n") }: _*)
    partial
      .groupBy(keys: _*)
      .agg(aggs.head._3(s"__p_${aggs.head._1}").as(aggs.head._1),
        aggs.tail.map { case (n, _, m) => m(s"__p_$n").as(n) }: _*)
  }
}
