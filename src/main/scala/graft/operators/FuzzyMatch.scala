package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy entity resolution: candidate pairs come only from equal
  * blocking keys, scored with edit distance.
  *
  * The reference's enrichment joins assume clean keys; real corpus/CRM data
  * needs approximate matching (same entity, slightly different string). The
  * classic scalable shape is blocking + pairwise scoring:
  *
  *   - BLOCKING bounds the quadratic blow-up: a self-join on the raw table is
  *     O(n²) pairs; equal-block pairs are Σ|block|² — the caller picks a key
  *     that keeps blocks small (a token, a phonetic code, an LSH bucket). At
  *     100 TB the block join is one hash shuffle on the key, and a skewed
  *     block (one giant key) is visible in `groupBy(block).count()` and fixed
  *     by refining the key, not by a bigger cluster.
  *   - SCORING uses Spark's threshold'd `levenshtein(l, r, max)` which
  *     early-exits once distance exceeds `max` — O(maxDist·min(len)) per pair
  *     instead of O(len²), the standard banded-DP trick.
  *
  * Pairs are emitted once (`a_id < b_id`), with `dist` in [minDist, maxDist].
  * `minDist = 1` excludes exact duplicates (those are exact-dedup's job).
  */
object FuzzyMatch {

  /** Self-match `df` on `blockExpr`-equal rows with name edit distance in
    * [minDist, maxDist]. Output: (a_id, b_id, a_name, b_name, dist).
    *
    * `collapseIdentical` (default on — duplicate entities are the NORM in
    * the data fuzzy matching exists for) groups rows with identical
    * (name, block) under a min-id representative: the blocked join and the
    * edit distance run once per DISTINCT name pair, and member pairs
    * inherit the representative pair's distance — output identical to the
    * direct path row for row (q126's oracle pins it). Intra-group pairs
    * have distance 0 and appear only when `minDist == 0`. On the 10x-clone
    * sf1 customer table this is 100x fewer levenshtein evaluations
    * (71.6 -> see BASELINE). Pass false for inputs known duplicate-free.
    */
  def selfMatch(df: DataFrame, idCol: String, nameCol: String, blockExpr: Column,
                maxDist: Int = 2, minDist: Int = 1,
                collapseIdentical: Boolean = true): DataFrame = {
    require(maxDist >= minDist && minDist >= 0, s"bad distance band [$minDist, $maxDist]")
    // blockExpr may reference any input column — evaluate it before pruning
    val keyed = df.withColumn("__blk", blockExpr).select(col(idCol), col(nameCol), col("__blk"))
    if (!collapseIdentical) {
      val a = keyed.select(col("__blk"), col(idCol).as("a_id"), col(nameCol).as("a_name"))
      val b = keyed.select(col("__blk"), col(idCol).as("b_id"), col(nameCol).as("b_name"))
      return a.join(b, Seq("__blk"))
        .filter(col("a_id") < col("b_id"))
        // 3-arg levenshtein returns -1 past the threshold — the band filter
        // drops those rows AND the exact-equal (dist 0) ones in one pass
        .withColumn("dist", levenshtein(col("a_name"), col("b_name"), maxDist))
        .filter(col("dist") >= minDist && col("dist") <= maxDist)
        .select(col("a_id"), col("b_id"), col("a_name"), col("b_name"), col("dist"))
    }
    // the group key is (name, block): two rows agreeing on both are
    // interchangeable in every candidate pair (same block membership, same
    // distance to everything). graft.llmops.Dedup.collapseGroups supplies
    // the shared rep/members machinery — and its null-key exclusion is
    // load-bearing here: a NULL name or block can never pair on the direct
    // path (null keys don't equi-join; levenshtein(null, x) is null), so
    // collapsing such rows would invent dist-0 intra pairs.
    val (grouped, members0) = graft.llmops.Dedup.collapseGroups(
      keyed, Seq(nameCol, "__blk"), idCol, cap = Int.MaxValue, capStats = null)
    val members = members0.withColumnRenamed("__cg_id", "__mid")
    val ga = grouped.select(col("__blk"), col("rep").as("a_id"), col(nameCol).as("a_name"))
    val gb = grouped.select(col("__blk"), col("rep").as("b_id"), col(nameCol).as("b_name"))
    val repPairs = ga.join(gb, Seq("__blk"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("dist", levenshtein(col("a_name"), col("b_name"), maxDist))
      .filter(col("dist") >= minDist && col("dist") <= maxDist)
      .select(col("a_id"), col("b_id"), col("a_name"), col("b_name"), col("dist"))
    val cross = repPairs
      .join(members.select(col("rep").as("a_id"), col("__mid").as("__ia")), "a_id")
      .join(members.select(col("rep").as("b_id"), col("__mid").as("__ib")), "b_id")
      .withColumn("__swap", col("__ib") < col("__ia"))
      .select(
        when(col("__swap"), col("__ib")).otherwise(col("__ia")).as("a_id"),
        when(col("__swap"), col("__ia")).otherwise(col("__ib")).as("b_id"),
        when(col("__swap"), col("b_name")).otherwise(col("a_name")).as("a_name"),
        when(col("__swap"), col("a_name")).otherwise(col("b_name")).as("b_name"),
        col("dist"))
    if (minDist > 0) cross
    else {
      val m = members.join(grouped.select(col("rep"), col(nameCol).as("__nm")), "rep")
      val intra = m.as("x").join(m.as("y"),
          col("x.rep") === col("y.rep") && col("x.__mid") < col("y.__mid"))
        .select(col("x.__mid").as("a_id"), col("y.__mid").as("b_id"),
          col("x.__nm").as("a_name"), col("x.__nm").as("b_name"),
          lit(0).as("dist"))
      cross.unionByName(intra)
    }
  }

  /** Sorted-neighborhood matching, the OTHER classic ER blocking: sort the
    * corpus on a key, compare each row only to the `windowSize−1` rows after
    * it. Complements [[selfMatch]] — equal-key blocking misses pairs whose
    * keys differ slightly; sorted neighborhoods catch "adjacent after
    * sorting" pairs without any exact key agreeing.
    *
    * Candidate count is exactly (windowSize−1)·N — linear, not quadratic.
    * The global order comes from [[Ids.contiguousRowIds]] (distributed
    * range-sort + two-pass prefix sum — no single-task window), each row is
    * replicated windowSize−1 times with its target position, and the pairing
    * is one integer equi-join on position: every step shuffles on keys with
    * full cardinality. `sortCols` must be a total order (add a unique
    * tie-break column, e.g. the id) or neighbor sets are nondeterministic —
    * the contiguousRowIds caveat.
    *
    * Output: (a_id, b_id, a_name, b_name, gap, dist) where `gap` ∈
    * [1, windowSize−1] is the sort-distance and `dist` ∈ [minDist, maxDist]
    * the edit distance; `a` precedes `b` in sort order.
    */
  def sortedNeighborhood(df: DataFrame, idCol: String, nameCol: String,
                         sortCols: Seq[String], windowSize: Int,
                         maxDist: Int = 2, minDist: Int = 1): DataFrame = {
    require(windowSize >= 2, s"windowSize must be >= 2, got $windowSize")
    require(maxDist >= minDist && minDist >= 0, s"bad distance band [$minDist, $maxDist]")
    val keep = (Seq(idCol, nameCol) ++ sortCols).distinct.map(col)
    val ranked = Ids.contiguousRowIds(df.select(keep: _*), sortCols, "__rn")
      .select(col(idCol), col(nameCol), col("__rn"))
    val a = ranked
      .select(col(idCol).as("a_id"), col(nameCol).as("a_name"), col("__rn"),
        explode(sequence(lit(1), lit(windowSize - 1))).as("gap"))
      .withColumn("__target", col("__rn") + col("gap"))
    val b = ranked.select(col(idCol).as("b_id"), col(nameCol).as("b_name"),
      col("__rn").as("__target"))
    a.join(b, "__target")
      .withColumn("dist", levenshtein(col("a_name"), col("b_name"), maxDist))
      .filter(col("dist") >= minDist && col("dist") <= maxDist)
      .select(col("a_id"), col("b_id"), col("a_name"), col("b_name"), col("gap"), col("dist"))
  }
}
