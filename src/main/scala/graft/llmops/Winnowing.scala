package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Document fingerprinting by winnowing (Schleimer/Wilkerson/Aiken, SIGMOD'03):
  * hash every k-gram, slide a window of `w` consecutive k-gram hashes, keep the
  * minimum of each window — a content-position-robust fingerprint set whose
  * overlap detects partial/containment duplication that whole-document hashing
  * (md5) and bag-level MinHash both miss.
  *
  * Plan shape: tokens materialized → k-gram hashes as one array column →
  * window-min via transform over a bound attribute (no CSE pitfall) →
  * explode+distinct → (doc_id, fingerprint) rows. All codegen, one shuffle
  * only if the caller aggregates.
  */
object Winnowing {

  /** (doc_id, fingerprint BIGINT) — distinct winnowed k-gram hashes per doc.
    *
    * One imperative UDF pass per doc (hash shingles, slide the window, dedup
    * minima locally) — row-local, zero shuffle. The HOF formulation below is
    * kept as the independent oracle: its two-level chain (a window-min lambda
    * over an array that is itself a transform over shingles) collapses under
    * the optimizer into per-window re-evaluation of the whole upstream
    * transform — O(windows × shingles) interpreted per doc, measured minutes
    * at sf1 where this UDF takes seconds. Hashes are catalyst XXH64 via
    * [[Dedup.RowHash]], bit-identical to `xxhash64` (spec-pinned).
    */
  def fingerprints(df: DataFrame, textCol: String, idCol: String,
                   k: Int = 3, w: Int = 4): DataFrame = {
    val (kk, ww) = (k, w)
    val fpUdf = udf { text: String =>
      // null AND whitespace-only text emits NO fingerprints — the tokenizer
      // would otherwise yield the single empty token, whose shingle hash
      // pairs every blank doc with every other (ADVICE r3 #4). "Whitespace"
      // is the regex \s class exactly (NOT Java String.trim's <= 0x20 sweep),
      // so this guard and the HOF oracle's regexp filter classify every doc
      // identically — control-char-only docs are tokens in both paths
      // (cleanText strips them upstream when that matters).
      if (text == null || text.matches("\\s*")) Array.empty[Long]
      else fingerprintWord(text, kk, ww)
    }
    graft.core.Parallelism.defend(df)
      .select(col(idCol).as("doc_id"), explode(fpUdf(col(textCol))).as("fingerprint"))
  }

  private def fingerprintWord(text: String, kk: Int, ww: Int): Array[Long] = {
    val sh = Dedup.RowHash.shingles(Dedup.RowHash.tokens(text), kk)
    val h = new Array[Long](sh.length)
    var i = 0
    while (i < sh.length) { h(i) = Dedup.RowHash.utf8(sh(i)); i += 1 }
    val nWin = math.max(h.length - (ww - 1), 1)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var s = 0
    while (s < nWin) {
      var m = Long.MaxValue
      var j = s
      val e = math.min(s + ww, h.length)
      while (j < e) { if (h(j) < m) m = h(j); j += 1 }
      seen.add(m)
      s += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var x = 0
    while (it.hasNext) { out(x) = it.next(); x += 1 }
    out
  }

  /** The declarative formulation — the oracle [[fingerprints]] is spec-checked
    * against (do NOT use on large corpora; see the scaladoc above).
    */
  private[graft] def fingerprintsHof(df: DataFrame, textCol: String, idCol: String,
                                     k: Int = 3, w: Int = 4): DataFrame = {
    // NOT trim(): Spark's trim strips only U+0020, but the zero-token class
    // includes tabs/newlines (Java String.trim in the UDF path strips <= 0x20)
    val toks = df.filter(col(textCol).isNotNull &&
        regexp_replace(col(textCol), "\\s+", "") =!= "")
      .select(col(idCol).as("doc_id"), Text.tokens(col(textCol)).as("__toks"))
    val grams = toks.select(col("doc_id"),
      transform(Text.shinglesFromTokens(col("__toks"), k), s => xxhash64(s)).as("__h"))
    // window-min over the materialized hash array attribute
    val mins = grams.select(col("doc_id"),
      transform(sequence(lit(1), greatest(size(col("__h")) - (w - 1), lit(1))),
        i => array_min(slice(col("__h"), i, lit(w)))).as("__mins"))
    mins.select(col("doc_id"), explode(col("__mins")).as("fingerprint")).distinct()
  }

  /** Pairs of docs sharing ≥ `minShared` fingerprints, with the overlap count —
    * an inverted-index join on fingerprint (same shape as n-gram Jaccard; never
    * a cross product).
    *
    * The join's cost is Σ (docs per fingerprint)²: a fingerprint shared by
    * thousands of docs (licence headers, boilerplate) is non-discriminative
    * AND quadratic. `maxDocsPerFingerprint > 0` drops such fingerprints before
    * the join (the MOSS move — too-common fingerprints carry no signal), one
    * side only, with exact drop counts through `capStats` (same never-silent
    * contract as the LSH bucket cap). Default off: overlap counts then include
    * every fingerprint.
    *
    * IDENTICAL-TEXT COLLAPSE (round 8, the near-dup family's r6 move applied
    * here after the sf10 gate killed the direct path): clones share their
    * ENTIRE fingerprint set, so every posting's docs-per-fingerprint scales
    * with clone multiplicity m and the self-join goes quadratic in m PER
    * FINGERPRINT (sf10's ×100 replication = ×10⁴ per posting — stage death
    * before the groupBy ever ran). With `collapseIdentical` (default) docs
    * group by their fingerprint SET under a min-id rep
    * ([[Dedup.collapseGroups]]): the index joins REPS only, intra-group
    * pairs share exactly |set| fingerprints by construction, cross pairs
    * inherit the rep pair's count bit-for-bit — expansion is answer-sized.
    * Contract notes (same as the LSH family): under the collapse,
    * `maxDocsPerFingerprint` counts REPS per fingerprint, not docs, and it
    * also bounds the clone-group size (both through the never-silent
    * CapStats); an adaptive probe skips the collapse on clone-free corpora.
    * CAP-ON COUNTS ARE PATH-DEPENDENT by design (r8 ADVICE, spec-pinned):
    * intra-clone pairs report the FULL |set| regardless of the cap — clones
    * share their whole set by construction, and the cap exists to bound
    * index-join cost, which intra pairs never incur — while the direct path
    * applies the doc-count cap to every pair's count (a clone group larger
    * than the cap pairs NOT AT ALL there: each of its fingerprints exceeds
    * the posting cap). The paths are pair-for-pair identical only with the
    * cap off; which path runs is data-dependent, so set the cap only with
    * `collapseIdentical` pinned explicitly if exact counts matter.
    */
  def sharedFingerprintPairs(df: DataFrame, textCol: String, idCol: String,
                             k: Int = 3, w: Int = 4, minShared: Int = 2,
                             maxDocsPerFingerprint: Int = 0,
                             capStats: Dedup.CapStats = null,
                             collapseIdentical: Boolean = true): DataFrame = {
    val doCollapse = collapseIdentical && {
      val probe = df.agg(count(col(textCol)).as("n"),
        approx_count_distinct(xxhash64(col(textCol))).as("d")).head()
      probe.getLong(1).toDouble < 0.95 * probe.getLong(0)
    }
    if (!doCollapse) {
      val fp = fingerprints(df, textCol, idCol, k, w)
      val capped =
        if (maxDocsPerFingerprint > 0)
          Dedup.capBuckets(fp, Seq("fingerprint"), maxDocsPerFingerprint, capStats)
        else fp
      val a = capped.select(col("fingerprint"), col("doc_id").as("id_a"))
      val b = fp.select(col("fingerprint"), col("doc_id").as("id_b"))
      return a.join(b, Seq("fingerprint")).filter(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(count(lit(1)).as("shared_fingerprints"))
        .filter(col("shared_fingerprints") >= minShared)
    }
    // per-doc fingerprint SET as one sorted array column (sorted = canonical,
    // so identical sets group; fingerprints() is already distinct-per-doc);
    // checkpointed lazily — it feeds the group agg AND the membership join
    val (kk, ww) = (k, w)
    val setUdf = udf { text: String =>
      if (text == null || text.matches("\\s*")) Array.empty[Long]
      else {
        val a = fingerprintWord(text, kk, ww)
        java.util.Arrays.sort(a)
        a
      }
    }
    val sets = graft.core.Parallelism.defend(df)
      .select(col(idCol).as("doc_id"), setUdf(col(textCol)).as("__fp"))
      .localCheckpoint(eager = false)
    // empty sets group with nobody (blank docs fingerprint nothing)
    val nonEmpty = sets.filter(size(col("__fp")) > 0)
    val groupCap = if (maxDocsPerFingerprint > 0) maxDocsPerFingerprint else Int.MaxValue
    val (reps, members0) = Dedup.collapseGroups(nonEmpty, Seq("__fp"), "doc_id",
      groupCap, capStats)
    val members = members0.withColumnRenamed("__cg_id", "doc_id")
    // intra-group pairs: clones share their whole set — count = |set|
    val repSize = reps.select(col("rep"), size(col("__fp")).cast("long").as("__n"))
    val intra = members.as("x").join(members.as("y"),
        col("x.rep") === col("y.rep") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"), col("x.rep").as("rep"))
      .join(repSize, "rep")
      .filter(col("__n") >= minShared)
      .select(col("id_a"), col("id_b"), col("__n").as("shared_fingerprints"))
    // inverted index over REPS only
    val fpReps = reps.select(col("rep").as("doc_id"), explode(col("__fp")).as("fingerprint"))
    val cappedReps =
      if (maxDocsPerFingerprint > 0)
        Dedup.capBuckets(fpReps, Seq("fingerprint"), maxDocsPerFingerprint, capStats)
      else fpReps
    val a = cappedReps.select(col("fingerprint"), col("doc_id").as("id_a"))
    val b = fpReps.select(col("fingerprint"), col("doc_id").as("id_b"))
    val repPairs = a.join(b, Seq("fingerprint")).filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("shared_fingerprints"))
      .filter(col("shared_fingerprints") >= minShared)
    val cross = repPairs
      .join(members.select(col("rep").as("id_a"), col("doc_id").as("__da")), "id_a")
      .join(members.select(col("rep").as("id_b"), col("doc_id").as("__db")), "id_b")
      .select(least(col("__da"), col("__db")).as("id_a"),
        greatest(col("__da"), col("__db")).as("id_b"), col("shared_fingerprints"))
    cross.unionByName(intra)
  }
}
