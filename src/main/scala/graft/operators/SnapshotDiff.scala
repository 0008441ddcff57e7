package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyed table diff — "what changed between these two snapshots?"
  *
  * The reconciliation sibling of [[Reconcile]]: where `Reconcile.checksum`
  * answers whether two tables are identical, this answers WHICH rows differ
  * and HOW — the audit a migration, a backfill, or an incremental-ingest
  * pipeline runs when the checksums disagree (and the change-data feed a
  * downstream incremental consumer can apply).
  *
  * One null-safe full outer join on the key (AQE handles skew; co-bucketed
  * layouts make it shuffle-free — `sources.BucketedLayout`); every compared
  * cell is judged with null-safe equality (`<=>`), so NULL→value and
  * value→NULL both count as changes. Output per non-identical row:
  * key columns + `status` ('added' | 'removed' | 'changed') +
  * `changed_cols` (comma-joined sorted names, '' for added/removed — a
  * STRING, not an array, so any engine/transport can hash it).
  *
  * Unchanged rows are dropped by default — at 100 TB the interesting output
  * is the delta, not a full-table echo; pass `includeUnchanged = true` for
  * the audit-trail form.
  */
object SnapshotDiff {

  def diff(oldDf: DataFrame, newDf: DataFrame, keyCols: Seq[String],
           compareCols: Seq[String], includeUnchanged: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty, "diff needs at least one key column")
    require(compareCols.nonEmpty, "diff needs at least one compare column")
    // presence flags, not key-null checks: a row whose key is legitimately
    // NULL still joins null-safely and must not read as absent
    val o = oldDf.select((keyCols ++ compareCols).map(col) :+ lit(true).as("__op"): _*).alias("o")
    val n = newDf.select((keyCols ++ compareCols).map(col) :+ lit(true).as("__np"): _*).alias("n")
    val joinCond = keyCols.map(k => col(s"o.$k") <=> col(s"n.$k")).reduce(_ && _)
    val oldPresent = col("o.__op").isNotNull
    val newPresent = col("n.__np").isNotNull
    val cellDiffs = concat_ws(",",
      compareCols.sorted.map(c =>
        when(!(col(s"o.$c") <=> col(s"n.$c")), lit(c))): _*)
    // only a both-sides row has per-cell diffs; an added/removed row's cells
    // all "differ" trivially and would list every column
    val changedCols = when(oldPresent && newPresent, cellDiffs).otherwise(lit(""))
    val status = when(!oldPresent, "added")
      .when(!newPresent, "removed")
      .when(changedCols =!= "", "changed")
      .otherwise("unchanged")
    val keyOut = keyCols.map(k => coalesce(col(s"o.$k"), col(s"n.$k")).as(k))
    val out = o.join(n, joinCond, "full_outer")
      .select(keyOut ++ Seq(status.as("status"), changedCols.as("changed_cols")): _*)
    if (includeUnchanged) out else out.filter(col("status") =!= "unchanged")
  }
}
