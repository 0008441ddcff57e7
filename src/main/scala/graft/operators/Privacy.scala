package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Re-identification risk screening for tabular training data: k-anonymity
  * and l-diversity over declared quasi-identifier columns.
  *
  * A corpus slice is k-anonymous when every combination of quasi-identifier
  * values is shared by ≥ k rows, and l-diverse when each such group carries
  * ≥ l distinct sensitive values (Sweeney 2002; Machanavajjhala 2007 — the
  * standard pre-release checks before tabular data enters a training mix).
  * This operator REPORTS the violating equivalence classes; what to do with
  * them (suppress, generalize a column, drop the slice) is the caller's
  * policy.
  *
  * Scale shape: one map-side-combined aggregate over a single scan, keyed by
  * the quasi-identifier tuple — the same plan as any groupBy count. The
  * distinct-sensitive count piggybacks on the same shuffle. Output is
  * |equivalence classes| rows at most, filtered down to violations — tiny.
  */
object Privacy {

  /** Equivalence classes violating k-anonymity and/or l-diversity.
    *
    * Output: quasi columns + `group_size` + `distinct_sensitive` +
    * `k_violation` / `l_violation` flags, only rows violating at least one.
    * `sensitiveCol = None` skips l-diversity (`distinct_sensitive` = null).
    */
  def violations(df: DataFrame, quasiCols: Seq[String], k: Int,
                 sensitiveCol: Option[String] = None, l: Int = 1): DataFrame = {
    require(quasiCols.nonEmpty, "violations: no quasi-identifier columns")
    require(k >= 1 && l >= 1, s"bad thresholds k=$k l=$l")
    val distinctSensitive: Column = sensitiveCol match {
      case Some(c) => countDistinct(col(c)).cast("long")
      case None    => lit(null).cast("long")
    }
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("group_size"), distinctSensitive.as("distinct_sensitive"))
      .withColumn("k_violation", col("group_size") < k)
      .withColumn("l_violation",
        sensitiveCol.map(_ => col("distinct_sensitive") < l).getOrElse(lit(false)))
      .filter(col("k_violation") || col("l_violation"))
  }
}
