package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the single latest right row whose
  * time is at-or-before the left row's time, per key — "what was the state of
  * X when this event happened". The reference's interval join
  * (LAB4-Walkthrough.md:231-235) bounds a range; an as-of join picks the most
  * recent point, which is what enrichment against a slowly-changing table
  * needs (latest order / latest price / latest profile at event time).
  *
  * Scale design — union + keyed running "last", NOT a range join:
  *   1. tag both sides and union them (no join node at all);
  *   2. one hash shuffle on the key, sort within each key by
  *      (time, side) with right rows first on ties (<= semantics);
  *   3. a running `last(_, ignoreNulls)` over rows UNBOUNDED PRECEDING..CURRENT
  *      carries each right row's payload forward to every later left row;
  *   4. keep left rows whose carried payload is non-null (inner as-of).
  *
  * Cost is a single shuffle of |L|+|R| rows — the same movement a sort-merge
  * join would do — with zero row replication and per-key state of exactly one
  * carried payload during the sort-based window scan. A range-join
  * formulation (L ⋈ R on key AND r.t <= l.t, then max) replicates every left
  * row by its full right-history length before pruning; at 100 TB that is the
  * difference between |L|+|R| and |L|·avg|R per key|.
  *
  * Right-side uniqueness per (key, time) is the caller's contract (pre-reduce
  * with max_by as q68 does) — with duplicates "the" latest row is undefined in
  * any engine.
  */
object AsOfJoin {

  /** @param rightCols right-side payload columns carried onto matching left rows */
  def apply(left: DataFrame, right: DataFrame,
            leftKey: String, rightKey: String,
            leftTime: String, rightTime: String,
            rightCols: Seq[String]): DataFrame = {
    val rightSchema = right.schema
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(rightCols.contains),
      s"left/right column collision: ${leftCols.intersect(rightCols).mkString(", ")}")
    val reserved = Set("__k", "__t", "__side", "__payload")
    val clash = (leftCols ++ rightCols).filter(reserved)
    require(clash.isEmpty,
      s"column name(s) ${clash.mkString(", ")} collide with AsOfJoin's working columns — rename them first")

    // the payload rides as ONE struct, not per-column last() calls: a struct
    // is never null for a right row even when its fields are, so the carried
    // value is always a whole right row — per-column carries would stitch
    // fields from DIFFERENT right rows whenever a payload value is null (and
    // a null in rightCols.head would drop a legitimately matched left row)
    val payloadType = org.apache.spark.sql.types.StructType(rightCols.map(rightSchema(_)))
    val taggedLeft = left
      .withColumn("__k", col(leftKey)).withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .select(Seq(col("__k"), col("__t"), col("__side")) ++
        leftCols.map(col) :+
        lit(null).cast(payloadType).as("__payload"): _*)
    val taggedRight = right
      .withColumn("__k", col(rightKey)).withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .select(Seq(col("__k"), col("__t"), col("__side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightCols.map(col): _*).as("__payload"): _*)

    // right (0) sorts before left (1) at equal time → `<=` as-of semantics
    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = taggedLeft.unionByName(taggedRight)
      .select(Seq(col("__side")) ++ leftCols.map(col) :+
        last(col("__payload"), ignoreNulls = true).over(w).as("__payload"): _*)

    carried
      .filter(col("__side") === 1 && col("__payload").isNotNull)
      .select(leftCols.map(col) ++ rightCols.map(c => col("__payload")(c).as(c)): _*)
  }
}
