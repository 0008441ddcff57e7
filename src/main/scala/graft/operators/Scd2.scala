package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 build from a change log: per key, collapse
  * consecutive rows with an unchanged attribute, then derive half-open
  * `[valid_from, valid_to)` validity intervals; the open interval marks the
  * current row. The batch complement of the streaming compacted-upsert
  * snapshot (q62 keeps only last-wins state; SCD2 keeps the full history as
  * queryable intervals — what a warehouse joins facts against "as of" a time,
  * e.g. with [[AsOfJoin]]).
  *
  * One shuffle on the key: both window passes (change filter, interval lead)
  * sort on the same (key, ts, tieBreak) so Catalyst plans a single exchange.
  * `tieBreak` makes simultaneous updates deterministic.
  */
object Scd2 {
  def apply(log: DataFrame, keyCol: String, attrCol: String, tsCol: String,
            tieBreak: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieBreak))
    // null-safe change test: a transition TO null is a real state change and
    // consecutive nulls are no change — `=!=` would erase the null period and
    // emit duplicate intervals. The first row per key has no lag marker to
    // distinguish from a null attribute, hence the explicit row_number check.
    log
      .withColumn("__rn", row_number().over(w))
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      .filter(col("__rn") === 1 || !(col("__prev") <=> col(attrCol)))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col(keyCol), col(attrCol).as("state"),
        col("valid_from"), col("valid_to"), col("is_current"))
  }
}
