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
  *
  * ATOMIC (non-nested) key columns only: the guarantee rests on
  * cast-to-string being injective per column, and Spark's rendering of
  * arrays/structs/maps is ambiguous — array("a, b") and array("a", "b")
  * both print "[a, b]" — so crafted nested keys could still share an image
  * (r5 advisor finding). Operators that build images from caller-supplied
  * key columns must call [[requireAtomic]] against their input schema;
  * nested keys should be encoded element-wise by the caller (e.g.
  * `to_json(struct(c))`, which escapes unambiguously) before imaging.
  */
object KeyImage {

  /** Fail fast when any proposed key column has a nested type whose string
    * rendering would break [[of]]'s injectivity-per-column premise.
    */
  def requireAtomic(df: org.apache.spark.sql.DataFrame, cols: Seq[Column]): Unit =
    df.select(cols: _*).schema.fields.foreach { f =>
      require(!Set("array", "map", "struct").exists(f.dataType.typeName.startsWith),
        s"KeyImage requires atomic key columns: '${f.name}' is " +
          s"${f.dataType.simpleString}, whose string rendering is ambiguous — " +
          "encode it first (e.g. to_json(struct(col)))")
    }

  /** [[of]] with floating-point key columns zero-normalized first (−0.0 →
    * 0.0 via `c + 0.0`, identity on every other value including NaN): SQL
    * key equality — and Spark's own shuffle/sort normalization
    * (NormalizeFloatingNumbers) — treats −0.0 = 0.0, but their string
    * renderings differ, so a sequential scan that sorts by the REAL key
    * columns (for sort-elision) and detects key CHANGES by image would see
    * sort-interleaved ±0.0 rows as alternating keys and reset its cursor
    * mid-series (r16 optimization-round review). Type-aware: only
    * float/double columns are wrapped — a STRING key with literal value
    * "-0.0" keeps its distinct image.
    */
  def ofNormalized(df: org.apache.spark.sql.DataFrame, cols: Seq[Column]): Column = {
    val types = df.select(cols: _*).schema.fields.map(_.dataType.typeName)
    of(cols.zip(types).map {
      case (c, "double") => c + lit(0.0)
      case (c, "float")  => c + lit(0.0f)
      case (c, _)        => c
    })
  }

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
