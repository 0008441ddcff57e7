package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical._

/** Defense against non-splittable input layouts ahead of per-row-expensive
  * stages (signature UDFs, winnowing, BPE encode, media kernels).
  *
  * A parquet ROW GROUP is the minimum scan split unit: a table written as one
  * row group yields one non-empty scan partition no matter how small
  * `spark.sql.files.maxPartitionBytes` is, so a per-row-expensive stage fused
  * into the scan inherits ~1-task parallelism (round-4 regression: the driver
  * regenerated every testdata table as a single row group and q54's signature
  * stage ran on one core). At 100 TB the same shape appears whenever an
  * upstream system emits few huge files/row groups.
  *
  * [[defend]] repartitions to the session default parallelism — but ONLY when
  * the plan is scan-shaped (no shuffle between source and here). Downstream of
  * any shuffle the layout is already `spark.sql.shuffle.partitions`-wide and a
  * second round-robin pass would be pure waste; equally important, calling
  * `.rdd` on a shuffle-bearing plan under AQE materializes its stages eagerly
  * and the work would run twice. On scan-only plans `.rdd.getNumPartitions`
  * just plans splits — no job runs.
  */
object Parallelism {

  /** True when `df` is source-shaped: scans, projections, filters, generators,
    * local relations — nothing that repartitions or shuffles.
    */
  private[graft] def scanShaped(df: DataFrame): Boolean =
    !df.queryExecution.optimizedPlan.exists {
      case _: Join | _: Aggregate | _: Distinct | _: Window | _: Sort => true
      case _: RepartitionOperation => true
      case _: GlobalLimit | _: LocalLimit => true // limit collapses parallelism on purpose
      case _ => false
    }

  /** Repartition `df` to `defaultParallelism` iff it is scan-shaped and its
    * planned split count is well below the session's cores. A no-op (and
    * cost-free beyond planning) everywhere else, so expensive operators can
    * call it unconditionally on their input.
    */
  def defend(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // streams have no static file layout to defend against (and .rdd would
    // throw); micro-batch parallelism comes from the source/shuffle config
    if (df.isStreaming) df
    else if (!scanShaped(df)) df
    else {
      val planned = df.rdd.getNumPartitions
      if (planned * 2 <= target) df.repartition(target) else df
    }
  }
}
