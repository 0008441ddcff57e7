package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar surface of the reference labs (SURVEY.md §2.7). Everything here is a
  * thin composition over `org.apache.spark.sql.functions` so it stays inside
  * whole-stage codegen — no UDFs.
  */
object Scalars {

  /** Two-decimal money rendering: `CAST(CAST(x AS DECIMAL(10,2)) AS STRING)`
    * (reference: LAB1-Walkthrough.md:200, LAB3-Walkthrough.md:107).
    */
  def moneyFmt(c: Column): Column = c.cast("decimal(10,2)").cast("string")

  /** Sum of a money-like double column with deterministic results: cast to
    * decimal before summing (exact, order-independent), render back as double.
    * A plain `sum(double)` depends on float addition order, which varies with
    * partitioning — this variant is reproducible at any parallelism.
    */
  def sumMoney(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(25,$scale)")).cast("double")

  /** Order-independent average of a double column (decimal sum / count). */
  def avgMoney(c: Column, scale: Int = 6): Column =
    sum(c.cast(s"decimal(25,$scale)")).cast("double") / count(lit(1)).cast("double")

  /** Order-independent decimal summation of COMPUTED doubles that is
    * bit-identical across engines: values enter AND exit the decimal THROUGH
    * THEIR DIGIT STRING. Shortest-repr double↔string is identical in the JVM
    * and DuckDB; their direct double↔decimal casts are NOT — DuckDB's
    * decimal→double divides int128 by 10^scale in floating point and its
    * double→decimal rounds the binary expansion differently at deep digits
    * (a 1-ulp q154 divergence that only appeared at sf0.1). Oracle twin:
    * `CAST(CAST(SUM(CAST(CAST(x AS VARCHAR) AS DECIMAL(p,s))) AS VARCHAR)
    * AS DOUBLE)`. Money columns with short exact expansions keep the plain
    * [[sumMoney]] path.
    */
  def digitDecimalSum(c: Column, dt: String = "decimal(38,18)"): Column =
    sum(c.cast("string").cast(dt)).cast("string").cast("double")

  /** 9-arm time-of-day CASE bucketing (reference: LAB3-Walkthrough.md:279-289). */
  def timeOfDayBucket(ts: Column): Column = {
    val h = hour(ts)
    when(h >= 0 && h < 4, "late night")
      .when(h >= 4 && h < 7, "early morning")
      .when(h >= 7 && h < 10, "morning rush")
      .when(h >= 10 && h < 12, "late morning")
      .when(h >= 12 && h < 14, "midday")
      .when(h >= 14 && h < 17, "afternoon")
      .when(h >= 17 && h < 20, "evening rush")
      .when(h >= 20 && h < 23, "night")
      .otherwise("late night")
  }
}
