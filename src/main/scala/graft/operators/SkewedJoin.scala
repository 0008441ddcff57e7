package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys in large-large joins.
  *
  * A shuffled hash/sort-merge join sends every row of a hot key to one
  * reducer. Salting spreads the big (skewed) side across `saltBuckets`
  * sub-keys and replicates each small-side row into all buckets, so the hot
  * key's work parallelises `saltBuckets`-ways at the cost of replicating the
  * smaller side ×buckets. AQE's skew-join handles sort-merge splits
  * automatically; this operator is for when you must pre-commit the layout
  * (e.g. writing bucketed tables) or AQE is unavailable.
  *
  * Result is exactly `big.join(small, bigKey === smallKey)` (inner).
  */
object SkewedJoin {

  def apply(big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
            saltBuckets: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id(), spark_partition_id()), lit(saltBuckets)))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltBuckets - 1L))))
    saltedBig
      .join(replicatedSmall,
        saltedBig(bigKey) === replicatedSmall(smallKey) && saltedBig("__salt") === replicatedSmall("__salt"))
      .drop("__salt")
  }
}
