package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-overlap equi-bucketed join: pairs of rows whose [start, end]
  * ranges OVERLAP on the same key (policy periods × claim periods, session
  * spans × incident windows). The complement of [[IntervalJoin]], which
  * places POINTS into ranges; here both sides carry ranges.
  *
  * Naive Spark plans an inequality-only join as BroadcastNestedLoop/cartesian
  * per key — quadratic. Instead each interval replicates to the fixed-width
  * time buckets it covers and the join runs on the (key, bucket) EQUI-key
  * with the overlap residual. Each matching pair would appear once per shared
  * bucket, so it is emitted only in its CANONICAL bucket — the bucket of
  * max(start_a, start_b), i.e. where the overlap begins — no distinct needed.
  * Replication per row = span/bucketWidth + 1: pick the width near the median
  * span (same trade as IntervalJoin's bucketing; plan-guarded no-cartesian).
  *
  * An INVERTED interval (end < start) is a data error and fails the query
  * loudly (a descending `sequence` would otherwise still emit pairs through
  * the residual — silent wrong answers; ADVICE r3 #2). An interval with a
  * NULL start or end has no defined bucket span and produces no pairs — the
  * row drops, matching SQL comparison semantics where `ts BETWEEN a AND b`
  * is never true against NULL bounds.
  */
object OverlapJoin {

  def apply(left: DataFrame, right: DataFrame, leftKey: String, rightKey: String,
            lStart: String, lEnd: String, rStart: String, rEnd: String,
            bucketWidthSeconds: Long): DataFrame = {
    require(bucketWidthSeconds > 0, s"bucketWidthSeconds must be > 0, got $bucketWidthSeconds")
    val w = bucketWidthSeconds * 1000000L
    def micros(c: Column) = unix_micros(c.cast("timestamp"))
    def bucketed(df: DataFrame, s: String, e: String, side: String) = {
      val sm = micros(col(s))
      val em = micros(col(e))
      // row-local guard, rides the same projection: inverted interval -> error
      val checkedStart = when(sm > em,
        raise_error(concat(lit(s"OverlapJoin: inverted interval ($s > $e): "),
          col(s).cast("string"), lit(" > "), col(e).cast("string")))).otherwise(sm)
      df.withColumn(s"__${side}_s", checkedStart)
        .withColumn(s"__${side}_e", em)
        .withColumn("__bucket",
          explode(sequence(floor(col(s"__${side}_s") / w).cast("long"),
            floor(col(s"__${side}_e") / w).cast("long"))))
    }
    val a = bucketed(left, lStart, lEnd, "l")
    val b = bucketed(right, rStart, rEnd, "r")
    a.join(b,
        a(leftKey) === b(rightKey) && a("__bucket") === b("__bucket") &&
          // overlap residual (closed intervals)
          a("__l_s") <= b("__r_e") && b("__r_s") <= a("__l_e") &&
          // canonical bucket: emit where the overlap starts
          floor(greatest(a("__l_s"), b("__r_s")) / w).cast("long") === a("__bucket"))
      .drop("__bucket", "__l_s", "__l_e", "__r_s", "__r_e")
  }
}
