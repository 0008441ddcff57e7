package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustered writes — multi-column data skipping.
  *
  * Partitioning prunes on ONE low-cardinality key and bucketing on ONE join
  * key; when scans filter on TWO ranged dimensions (customer AND price, time
  * AND geo), neither helps the second column: sorting by `a` leaves every
  * file spanning the full `b` range. Interleaving the bits of both columns'
  * normalized ranks and range-partitioning + sorting by that Morton value
  * clusters each output file into a small rectangle of (a, b) space, so
  * parquet min/max footer stats prune files for predicates on EITHER column —
  * the layout Delta/Iceberg `OPTIMIZE ZORDER BY` applies, here as a plain
  * Spark write.
  *
  * Normalization is proportional min/max scaling to 16 bits per dimension
  * (two scalar aggregates — no global sort/ntile); the interleave is a
  * codegen'd 32-term shift/or fold, row-local. Skew caveat: proportional
  * scaling degrades on heavily skewed dimensions — rank-bucket (ntile) before
  * calling when a dimension is pathological.
  */
object ZOrderLayout {

  /** 32-bit Morton value from two numeric columns scaled to [0, 65535]. */
  def zValue(a: Column, b: Column, aMin: Double, aMax: Double,
             bMin: Double, bMax: Double): Column = {
    def scaled(c: Column, lo: Double, hi: Double): Column =
      when(lit(hi) === lit(lo), lit(0L))
        .otherwise(((c.cast("double") - lo) / (hi - lo) * 65535.0).cast("long"))
    val (sa, sb) = (scaled(a, aMin, aMax), scaled(b, bMin, bMax))
    (0 until 16).foldLeft(lit(0L)) { (acc, k) =>
      acc
        .bitwiseOR(shiftleft(shiftright(sa, k).bitwiseAND(1), 2 * k))
        .bitwiseOR(shiftleft(shiftright(sb, k).bitwiseAND(1), 2 * k + 1))
    }
  }

  /** Write `df` as `files` parquet files clustered on the (aCol, bCol) Morton
    * curve. Returns the (aMin, aMax, bMin, bMax) frame used for scaling.
    */
  def write(df: DataFrame, path: String, aCol: String, bCol: String,
            files: Int): (Double, Double, Double, Double) = {
    val r = df.agg(min(col(aCol)).cast("double"), max(col(aCol)).cast("double"),
      min(col(bCol)).cast("double"), max(col(bCol)).cast("double")).head()
    require(!r.isNullAt(0) && !r.isNullAt(2),
      s"ZOrderLayout.write: empty input or all-null cluster column ($aCol/$bCol) — nothing to scale")
    val frame = (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    df.withColumn("__z", zValue(col(aCol), col(bCol), frame._1, frame._2, frame._3, frame._4))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
    frame
  }
}
