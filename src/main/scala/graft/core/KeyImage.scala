package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Collision-FREE string image of a multi-column key.
  *
  * The separator-based form (`concat_ws(sep, values)`) is ambiguous whenever
  * a value can contain the separator — ("a|b", "c") and ("a", "b|c") share
  * one image — and a null sentinel collides with the sentinel as a literal
  * value. Length-prefixing removes both ambiguities structurally: each part
  * is encoded `N:<flag><len>:<value>` where flag V/N marks null, so no
  * value content can ever shift a boundary.
  *
  * Use wherever a key image feeds hashing or grouping state (deterministic
  * noise keys, sequential-scan group detection). NOT needed when grouping on
  * the real columns — Spark compares those structurally.
  */
object KeyImage {

  def of(cols: Seq[Column]): Column = {
    require(cols.nonEmpty, "KeyImage.of: no columns")
    val parts = cols.map { c =>
      val s = c.cast("string")
      concat(
        when(s.isNull, lit("N0:")).otherwise(concat(lit("V"), length(s), lit(":"))),
        coalesce(s, lit("")))
    }
    concat(parts: _*)
  }
}
