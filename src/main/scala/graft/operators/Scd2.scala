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

  /** Incremental SCD2 maintenance — the MERGE step: fold a batch of new
    * change events into an existing SCD2 table without rebuilding untouched
    * keys.
    *
    * Only keys PRESENT in `changes` rebuild: their interval starts are a
    * sufficient change-log statistic (each interval start IS the state-change
    * event), so touched histories re-derive from
    * interval-starts ∪ new changes through the same [[apply]] — collapse and
    * interval semantics stay identical by construction. Untouched keys pass
    * through byte-identical. Work scales with the touched slice, not the
    * dimension: one semi/anti join pair on the key + one [[apply]] over
    * |touched history| rows.
    *
    * CONTRACT: per key, changes must be event-time STRICTLY AFTER everything
    * already folded in. A change at-or-before the key's last state change
    * would need raw events the table no longer holds (collapsed duplicate
    * runs are invisible in interval starts, and ordering against the
    * boundary event needs its discarded tie-break), so that case FAILS
    * LOUDLY rather than merging a silently-wrong history. The guard
    * (ts <= max current valid_from) is the strongest check the table itself
    * supports; events that changed nothing between the last state change and
    * the batch are — as in any warehouse MERGE — assumed absent.
    *
    * Reconstructed interval-start rows carry a NULL tie-break (nulls sort
    * first: at an equal timestamp the established state precedes the new
    * arrival, deterministically).
    */
  def applyChanges(current: DataFrame, changes: DataFrame, keyCol: String,
                   attrCol: String, tsCol: String, tieBreak: String): DataFrame = {
    val tieType = changes.schema(tieBreak).dataType
    val touchedKeys = changes.select(col(keyCol)).distinct()
    val touchedCur = current.join(touchedKeys, Seq(keyCol), "leftsemi")
    val untouched = current.join(touchedKeys, Seq(keyCol), "leftanti")
    // fail loudly on out-of-order changes (see contract above): row-local
    // check against the broadcastable per-key high-water mark
    val hwm = touchedCur.groupBy(keyCol).agg(max(col("valid_from")).as("__hwm"))
    // STRICTLY-after guard: a change AT the boundary timestamp is ambiguous
    // too — ordering it against the (discarded) raw event that set the state
    // needs that event's tie-break, which the table no longer holds
    val checked = changes.join(broadcast(hwm), Seq(keyCol), "left")
      .withColumn(tsCol,
        when(col("__hwm").isNotNull && col(tsCol) <= col("__hwm"),
          raise_error(concat(
            lit(s"Scd2.applyChanges: change for key "), col(keyCol).cast("string"),
            lit(" at "), col(tsCol).cast("string"),
            lit(" is at or before the key's last state change at "), col("__hwm").cast("string"),
            lit(" — rebuild from the raw log instead"))))
          .otherwise(col(tsCol)))
      .select(col(keyCol), col(attrCol), col(tsCol), col(tieBreak))
    val replayed = touchedCur.select(col(keyCol), col("state").as(attrCol),
      col("valid_from").as(tsCol), lit(null).cast(tieType).as(tieBreak))
    untouched.unionByName(
      apply(replayed.unionByName(checked), keyCol, attrCol, tsCol, tieBreak))
  }
}
