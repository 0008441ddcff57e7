package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** LATERAL TABLE(f(x)) — the lateral table-function join (SURVEY.md §2.3 J3,
  * reference: LAB1-Walkthrough.md:69-70 and every ML/agent/vector call site).
  *
  * Two cases, matching the survey's analysis:
  *  - all observed reference calls are 1-row-in/1-row-out → [[applyScalar]]:
  *    a struct-returning expression star-expanded onto the row (stays in
  *    codegen, no shuffle);
  *  - the general UDTF case (0..n output rows per input) → [[applyTable]]:
  *    flatMap with an explicit output schema — Spark's `flatMap`/`explode` is
  *    the native carrier for table functions.
  */
object Lateral {

  /** 1-row-in/1-row-out lateral: append the fields of a struct column. */
  def applyScalar(df: DataFrame, fn: Column, outPrefix: String = ""): DataFrame = {
    val tmp = "__lateral"
    val applied = df.withColumn(tmp, fn)
    val fields = applied.schema(tmp).dataType.asInstanceOf[StructType].fieldNames
    val expanded = fields.foldLeft(applied) { (acc, f) =>
      acc.withColumn(s"$outPrefix$f", col(s"$tmp.$f"))
    }
    expanded.drop(tmp)
  }

  /** General table function: each input row yields 0..n output rows with
    * `outSchema` columns appended to the input row.
    */
  def applyTable(df: DataFrame, outSchema: StructType)(fn: Row => IterableOnce[Row]): DataFrame = {
    val full = StructType(df.schema.fields ++ outSchema.fields)
    df.flatMap { r =>
      fn(r).iterator.map(out => Row.fromSeq(r.toSeq ++ out.toSeq))
    }(Encoders.row(full))
  }
}
