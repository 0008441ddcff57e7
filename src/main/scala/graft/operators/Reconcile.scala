package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-engine data reconciliation: order-independent content checksums.
  *
  * The migration question this engine exists for — "did the Spark rewrite
  * produce EXACTLY the reference's table?" — needs an equality check that (a)
  * never collects either side, (b) is independent of row order and
  * partitioning, and (c) can be computed by BOTH engines from the same SQL
  * semantics. Per group: row count + an order-independent SUM of per-row
  * md5-prefix hashes (sum is commutative, so any partitioning/ordering gives
  * the same total; DECIMAL(38) so a 2^60-bit hash summed over billions of
  * rows cannot wrap — a LONG sum would overflow engine-dependently).
  *
  * Rows hash as md5 of the U+0001-joined STRING images of the listed columns,
  * with NULL cells rendered as a U+0002 sentinel — `concat_ws` alone SKIPS
  * nulls, which would make ('x', NULL) and (NULL, 'x') hash identically and
  * hide cross-column drift (DuckDB twin of the row image:
  * `concat_ws(chr(1), coalesce(c1, chr(2)), ...)`).
  * Pass columns already rendered to strings deterministically (keys, flags,
  * decimals via [[graft.functions.Scalars.moneyFmt]]); raw DOUBLE→string
  * rendering differs across engines and is the caller's responsibility to
  * canonicalize. One map-side-combined agg; |groups| rows shuffle.
  *
  * `content_sum` is surfaced as the DECIMAL(38) total reduced mod the largest
  * prime below 2^53 (9007199254740881), cast to BIGINT. The full total
  * exceeds float64's exact-integer range, so any consumer that round-trips
  * the column through a double (pandas, JSON, a quick CSV diff, a comparator
  * that coerces numeric-looking strings) silently corrupts it and reports
  * spurious drift — observed in practice: two engines computed the identical
  * 73-bit digit string and a float64-coercing comparator still flagged them
  * as different. A BIGINT < 2^53 survives every transport exactly; 53
  * checksum bits + the exact row count keep collision odds negligible for
  * reconciliation purposes.
  */
object Reconcile {

  /** Largest prime below 2^53 — keeps sums inside float64's exact range. */
  val SumModulus = 9007199254740881L

  def rowHash(cols: Seq[Column]): Column =
    conv(substring(md5(concat_ws("\u0001",
      cols.map(c => coalesce(c, lit("\u0002"))): _*)), 1, 15), 16, 10)
      .cast("decimal(38,0)")

  def checksum(df: DataFrame, groupCol: Column, cols: Seq[Column]): DataFrame =
    df.groupBy(groupCol.as("grp"))
      .agg(count(lit(1)).as("n_rows"),
        (sum(rowHash(cols)) % SumModulus).cast("long").as("content_sum"))
}
