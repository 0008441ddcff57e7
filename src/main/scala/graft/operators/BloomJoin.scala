package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-prefiltered inner equi-join: build a Bloom filter over the (small or
  * pre-reduced) right side's join keys, filter the left side BEFORE its
  * shuffle, then run the exact join. The result is IDENTICAL to the plain
  * join — false positives only let extra rows through to the exact join,
  * which discards them — but the left side's shuffle carries ~selectivity+fpp
  * of its rows instead of all of them. At 100 TB, a fact table joining a
  * 0.1%-selective dim subset is the canonical case: the manual form of
  * Spark's runtime bloom filter (`spark.sql.optimizer.runtime.bloomFilter`),
  * for plans where the optimizer can't prove the selectivity (computed keys,
  * non-DSv2 sources, pre-aggregated right sides).
  *
  * The filter is built with `df.stat.bloomFilter` (a distributed aggregate —
  * only the ~`-8·n·ln(fpp)/ln(2)²`-bit sketch reaches the driver) and
  * broadcast once.
  */
object BloomJoin {

  /** The prefiltered left side (exposed so callers and specs can observe the
    * row-count cut the bloom achieves before the join).
    */
  def prefilter(left: DataFrame, right: DataFrame, leftKey: String, rightKey: String,
                expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.types._
    val integral = Set[DataType](ByteType, ShortType, IntegerType, LongType)
    for ((df, k) <- Seq((left, leftKey), (right, rightKey))) {
      val t = df.schema(k).dataType
      if (!integral(t) && t != StringType)
        throw new IllegalArgumentException(
          s"BloomJoin supports integral or string keys, got $t for '$k'")
    }
    // both sides hash through the SAME representation (long or UTF-8 string);
    // null right keys never enter the sketch (they can't equi-join anyway)
    val keyed = right.select(
      (if (integral(right.schema(rightKey).dataType)) col(rightKey).cast("long")
       else col(rightKey)).as("__k")).filter(col("__k").isNotNull)
    val bloom = keyed.stat.bloomFilter("__k", expectedItems, fpp)
    val bc = left.sparkSession.sparkContext.broadcast(bloom)
    val might = left.schema(leftKey).dataType match {
      case t if integral(t) =>
        udf((k: java.lang.Long) => k != null && bc.value.mightContainLong(k))
          .apply(col(leftKey).cast("long"))
      case StringType =>
        udf((k: String) => k != null && bc.value.mightContainString(k))
          .apply(col(leftKey))
      case other =>
        throw new IllegalArgumentException(
          s"BloomJoin supports integral or string keys, got $other for '$leftKey'")
    }
    left.filter(might)
  }

  def apply(left: DataFrame, right: DataFrame, leftKey: String, rightKey: String,
            expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    require(leftKey != rightKey,
      "rename one side first: identical key names make the join condition ambiguous")
    val pf = prefilter(left, right, leftKey, rightKey, expectedItems, fpp)
    pf.join(right, pf(leftKey) === right(rightKey))
  }
}
