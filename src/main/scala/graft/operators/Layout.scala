package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Physical-layout operators: total-order sorting with exact global
  * positions (the terasort pattern — range shuffle, never a single-task
  * window) and Z-order multi-column clustering (interleaved-bit locality for
  * multi-dimensional pruning, the OPTIMIZE ZORDER BY pattern).
  *
  * Both exist because a 100 TB corpus is not "a DataFrame" to downstream
  * consumers — it is files on disk, and WHICH rows share a file decides how
  * much of it every later query reads. Total sort gives deterministic
  * training order + contiguous shards; Z-order gives multi-column locality
  * so min/max file statistics prune on either column.
  */
object Layout {

  /** Total-order sort with an exact, gap-free 1-based `global_pos` and (when
    * `numShards > 0`) an equal-width `shard` assignment.
    *
    * The naive formulation — `row_number() OVER (ORDER BY …)` — moves the
    * whole corpus through ONE task. This is the distributed form:
    *   1. `repartitionByRange` + `sortWithinPartitions` on the sort key — a
    *      range shuffle whose partition ids are globally ordered;
    *   2. pass 1: per-partition row counts (one long per partition to the
    *      driver);
    *   3. pass 2: each partition numbers its rows seeded with the broadcast
    *      cumulative count of all earlier partitions.
    * Both passes reuse the SAME shuffled RDD, so the sort is computed once.
    * The result is bit-identical to the single-task window at any partition
    * count. `shard = ((global_pos-1) * numShards) div N` — contiguous,
    * equal-width (±1) shards in sort order, reproducible across engines
    * (pure integer arithmetic).
    *
    * `order` must reach a total order (include a unique tie-break column) or
    * positions within ties are layout-dependent.
    */
  def totalSort(df: DataFrame, order: Seq[Column], numShards: Int = 0,
                numPartitions: Int = 0): DataFrame = {
    require(order.nonEmpty, "totalSort needs at least one sort column")
    val spark = df.sparkSession
    val ranged = (if (numPartitions > 0) df.repartitionByRange(numPartitions, order: _*)
                  else df.repartitionByRange(order: _*))
      .sortWithinPartitions(order: _*)

    // one INTERNAL-row RDD: both passes share the sort shuffle, and the
    // counting pass never pays catalyst→Scala conversion (the .rdd form
    // deserialized every field of every row just to call it.size)
    val rowRdd = ranged.queryExecution.toRdd
    val offsets = graft.core.PrefixSum.partitionOffsets(rowRdd,
      (_: org.apache.spark.sql.catalyst.InternalRow) => 1L)
    val n = offsets.last max 1L

    var schema = ranged.schema.add("global_pos", LongType, nullable = false)
    if (numShards > 0) schema = schema.add("shard", LongType, nullable = false)
    val baseSchema = ranged.schema
    val numbered = rowRdd.mapPartitionsWithIndex { (pid, it) =>
      val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
        .createToScalaConverter(baseSchema)
      var pos = offsets(pid)
      it.map { ir =>
        val r = conv(ir).asInstanceOf[Row]
        pos += 1L
        val base = r.toSeq :+ pos
        Row.fromSeq(if (numShards > 0) base :+ ((pos - 1L) * numShards) / n else base)
      }
    }
    spark.createDataFrame(numbered, schema)
  }

  /** Z-order value: interleave the low `bits` bits of each column's
    * min/max-normalized integer bucket, first column taking the MOST
    * significant bit of each round. Rows close in `zval` are close in every
    * input dimension, so sorting files by `zval` lets min/max column
    * statistics prune scans on ANY of the clustered columns — the reason
    * OPTIMIZE ZORDER exists.
    *
    * This is the ENGINE-EXACT n-column form (pure integer bucketing —
    * reproducible bit-for-bit across engines/layouts, the form the q143
    * oracle checks); [[graft.sources.ZOrderLayout]] owns the file-layout
    * write pass (16-bit double scaling is fine there — only footer stats
    * consume the value). Materialize a layout from THIS value with
    * `repartitionByRange + sortWithinPartitions` on it, or use
    * ZOrderLayout.write.
    *
    * Bucketing is `((x - min) * 2^bits) div (max - min + 1)` — pure integer
    * arithmetic on the casted-to-long inputs, reproducible across engines
    * (no quantile estimation: one tiny min/max agg is broadcast back as
    * literals). Skewed columns therefore get skewed buckets; for rank-even
    * buckets feed a pre-ranked column instead. The projection itself is
    * row-local codegen — zero shuffle until a `repartitionByRange(zval)` (or
    * ZOrderLayout.write) materializes the layout.
    *
    * Cap: `bits * cols.size <= 62` (zval stays a positive long).
    */
  def zValue(df: DataFrame, cols: Seq[Column], bits: Int = 8): Column = {
    require(cols.nonEmpty, "zValue needs at least one column")
    require(bits >= 1 && bits * cols.size <= 62,
      s"bits * cols must fit a positive long, got $bits x ${cols.size}")
    val k = cols.size
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(min(c.cast("long")).as(s"mn$i"), max(c.cast("long")).as(s"mx$i"))
    }
    val stats = df.agg(aggs.head, aggs.tail: _*).head()
    import org.apache.spark.sql.graft.Bridge
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    def intDiv(a: Column, b: Column): Column =
      Bridge.column(IntegralDivide(Bridge.expression(a), Bridge.expression(b)))
    val buckets = cols.zipWithIndex.map { case (c, i) =>
      val mn = stats.getLong(2 * i); val mx = stats.getLong(2 * i + 1)
      // (x - min) * 2^bits div (max - min + 1): exact integer arithmetic
      // (never a double round-trip), range-safe for |x| < 2^53/2^bits
      intDiv((c.cast("long") - lit(mn)) * lit(1L << bits), lit(mx - mn + 1L)).cast("long")
    }
    (0 until bits).flatMap { b =>
      buckets.zipWithIndex.map { case (bc, i) =>
        // bit b of column i lands at position b*k + (k-1-i)
        shiftleft(shiftright(bc, b).bitwiseAND(lit(1L)), b * k + (k - 1 - i))
      }
    }.reduce(_ + _)
  }

}
