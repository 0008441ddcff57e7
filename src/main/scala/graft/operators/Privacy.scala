package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Re-identification risk screening for tabular training data: k-anonymity
  * and l-diversity over declared quasi-identifier columns.
  *
  * A corpus slice is k-anonymous when every combination of quasi-identifier
  * values is shared by ≥ k rows, and l-diverse when each such group carries
  * ≥ l distinct sensitive values (Sweeney 2002; Machanavajjhala 2007 — the
  * standard pre-release checks before tabular data enters a training mix).
  * This operator REPORTS the violating equivalence classes; what to do with
  * them (suppress, generalize a column, drop the slice) is the caller's
  * policy.
  *
  * Scale shape: one map-side-combined aggregate over a single scan, keyed by
  * the quasi-identifier tuple — the same plan as any groupBy count. The
  * distinct-sensitive count piggybacks on the same shuffle. Output is
  * |equivalence classes| rows at most, filtered down to violations — tiny.
  */
object Privacy {

  /** Equivalence classes violating k-anonymity and/or l-diversity.
    *
    * Output: quasi columns + `group_size` + `distinct_sensitive` +
    * `k_violation` / `l_violation` flags, only rows violating at least one.
    * `sensitiveCol = None` skips l-diversity (`distinct_sensitive` = null).
    */
  def violations(df: DataFrame, quasiCols: Seq[String], k: Int,
                 sensitiveCol: Option[String] = None, l: Int = 1): DataFrame = {
    require(quasiCols.nonEmpty, "violations: no quasi-identifier columns")
    require(k >= 1 && l >= 1, s"bad thresholds k=$k l=$l")
    val distinctSensitive: Column = sensitiveCol match {
      case Some(c) => countDistinct(col(c)).cast("long")
      case None    => lit(null).cast("long")
    }
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("group_size"), distinctSensitive.as("distinct_sensitive"))
      .withColumn("k_violation", col("group_size") < k)
      .withColumn("l_violation",
        sensitiveCol.map(_ => col("distinct_sensitive") < l).getOrElse(lit(false)))
      .filter(col("k_violation") || col("l_violation"))
  }

  /** ε-differentially-private count release (Dwork 2006): per-group counts
    * plus Laplace(1/ε) noise — counting queries have sensitivity 1, so the
    * released histogram is ε-DP regardless of group sizes. The publish step
    * after [[violations]]-style screening when aggregate stats must leave
    * the trust boundary.
    *
    * The noise draw is DETERMINISTIC given (seed, group key): u from the
    * md5 of the key image (uniform in (0,1) to 2⁻⁵³), inverse-CDF Laplace
    * `−(1/ε)·sign(u−½)·ln(1−2|u−½|)`. Reruns, retries, and re-partitionings
    * release the SAME noisy value — re-running can't average the noise away
    * (the classic DP deployment failure) because the randomness is keyed to
    * the data, not the run. One map-side-combined count; the noise is a
    * row-local projection on |groups| rows. Released counts are also
    * clamped at 0 and rounded (post-processing — ε unaffected).
    *
    * THE SEED IS PART OF THE PRIVACY BUDGET — two obligations the caller
    * owns (r5 advisor finding):
    *  1. `seed` must stay SECRET. The noise is a deterministic function of
    *     (seed, group key); an adversary who knows the seed reconstructs
    *     the noise and recovers exact counts.
    *  2. Each distinct dataset VERSION needs a FRESH seed, and each release
    *     spends ε from the total budget (sequential composition). Releasing
    *     v1 and v2 of the data under the SAME seed gives both releases
    *     identical per-group noise, so their difference equals the true
    *     count difference exactly — the ε-DP guarantee holds per (seed,
    *     dataset) release, not across same-seed releases. Rerun-stability
    *     is for RETRIES of one release, never for republishing changed data.
    */
  def dpCounts(df: DataFrame, groupCols: Seq[String], epsilon: Double,
               seed: Long): DataFrame = {
    require(groupCols.nonEmpty, "dpCounts: no group columns")
    require(epsilon > 0, s"epsilon must be > 0, got $epsilon")
    graft.core.KeyImage.requireAtomic(df, groupCols.map(col))
    // collision-FREE image (length-prefixed KeyImage): separator/sentinel
    // encodings let crafted group values share a noise draw, and two groups
    // with byte-identical noise leak their exact count difference
    val keyImage = graft.core.KeyImage.of(lit(seed.toString) +: groupCols.map(col))
    // 52 hex chars hold > 53 bits: take 13 nibbles → uniform on [0, 2^52)
    val u = (conv(substring(md5(keyImage), 1, 13), 16, 10).cast("double") + lit(0.5)) /
      lit(4503599627370496.0) // 2^52 → u ∈ (0,1), never exactly 0/1
    val centered = u - lit(0.5)
    val noise = -signum(centered) * log(lit(1.0) - lit(2.0) * abs(centered)) / lit(epsilon)
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("true_count"))
      .withColumn("dp_count",
        greatest(round(col("true_count") + noise).cast("long"), lit(0L)))
      .drop("true_count")
  }
}
