package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Data Selection with Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): score every raw-corpus document by how much more
  * likely its hashed n-gram features are under a small TARGET corpus (the
  * "data I wish I had more of") than under the raw corpus itself, then keep
  * a weighted/top-k resample. The scalable stand-in for "train a classifier
  * against the target" curation — no model, two counting passes.
  *
  *  - Features: unigrams + bigrams hashed into `buckets` (xxhash64 —
  *    row-local, no vocabulary is ever collected);
  *  - per-corpus bucket distributions with add-1 smoothing:
  *    `p[b] = (c_b + 1) / (n + buckets)`;
  *  - `log_weight(doc) = Σ_grams ( ln p_target[b(g)] − ln p_raw[b(g)] )`,
  *    and `avg_log_weight` normalizes out document length.
  *
  * Scale shape: each distribution is ONE map-side-combined count to
  * `buckets` rows, broadcast back as a plain double array inside a
  * row-local scoring UDF — the raw corpus is scanned once for stats and
  * once for scoring, nothing about it is collected, and no shuffle carries
  * text. Scoring is floating-point (ln), so this family is spec-verified
  * (planted-distribution recovery in DsirSpec) rather than hash-gated like
  * the counting operators.
  */
object Dsir {

  /** Hashed uni+bigram buckets over a BOUND token-array attribute.
    *
    * `toks` MUST be an attribute already on the row (bound via
    * [[withGramBuckets]]), never an inline tokenize expression: the bigram
    * lambda references it through `element_at(toks, i + 2)`, Catalyst does
    * not CSE inside HOF lambdas, and an inline token expression re-splits
    * the text PER ELEMENT — O(tokens²) per doc (trap #1, fourth sighting;
    * judge-measured 3.27 s inline vs 0.56 s bound on sf0.1 documents,
    * identical 536,408 grams). Same rule as `QualityClassifier.features`.
    */
  private def gramsFromBoundToks(toks: Column, buckets: Int): Column = {
    val unis = transform(toks, t => pmod(xxhash64(t), lit(buckets)))
    val bis = when(size(toks) >= 2,
      transform(slice(toks, lit(1), size(toks) - 1),
        (t, i) => pmod(xxhash64(concat_ws(" ", t, element_at(toks, i + 2))), lit(buckets))))
      .otherwise(array().cast("array<bigint>"))
    concat(unis, bis)
  }

  /** Append `__b` (hashed gram buckets) with the token array materialized
    * as a bound attribute first — the ONE gram path both corpora (raw and
    * target) go through, so the lambda-binding fix cannot regress on one
    * side. CollapseProject leaves `__dsir_toks` alone because multiple
    * gram expressions reference it.
    *
    * Text.tokens("") yields [""] (split semantics) — drop empties so an
    * empty doc has zero grams, not one phantom feature. NULL text coalesces
    * to "" for the same zero-gram outcome (a null array would NPE the
    * scoring UDF).
    */
  private[graft] def withGramBuckets(df: DataFrame, textCol: String, buckets: Int): DataFrame =
    df.withColumn("__dsir_toks",
        filter(Text.tokens(lower(coalesce(col(textCol), lit("")))), t => length(t) > 0))
      .withColumn("__b", gramsFromBoundToks(col("__dsir_toks"), buckets))
      .drop("__dsir_toks")

  /** `buckets`-row distribution table (bucket, p) for one corpus. */
  private def bucketLogProbs(df: DataFrame, textCol: String, buckets: Int): Array[Double] = {
    // tokenize+hash is per-row-expensive: don't inherit a 1-row-group scan
    // layout (see Parallelism)
    bucketLogProbsFromGrams(
      withGramBuckets(graft.core.Parallelism.defend(df), textCol, buckets), buckets)
  }

  private def bucketLogProbsFromGrams(withB: DataFrame, buckets: Int): Array[Double] = {
    // explode_OUTER, then drop the empty-doc nulls AFTER the generate:
    // plain explode makes InferFiltersFromGenerate add `size(__b) > 0`
    // below the Generate, and pushdown substitutes the alias chain back
    // into that filter — re-inlining the full tokenizer inside the bigram
    // lambda (trap #1 through the back door; measured 30 s of q147's
    // 32 s sf1 gram count, vs 0.7 s without the inferred filter).
    val counts = withB
      .select(explode_outer(col("__b")).as("bucket"))
      .filter(col("bucket").isNotNull)
      .groupBy("bucket").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    val total = counts.valuesIterator.sum
    Array.tabulate(buckets)(b =>
      math.log((counts.getOrElse(b, 0L) + 1).toDouble / (total + buckets).toDouble))
  }

  /** Score `raw` against `target`: adds `n_grams`, `log_weight`,
    * `avg_log_weight` (length-normalized — use this one to rank).
    *
    * The raw corpus needs its grams twice (distribution stats, then
    * scoring); `materializeGrams=true` (default) localCheckpoints the hashed
    * gram arrays (~text-sized) so tokenize+hash runs ONCE. At a scale where
    * caching ~the corpus is worse than re-scanning it, pass false to trade a
    * second scan for zero cache footprint.
    */
  def importanceWeights(raw: DataFrame, target: DataFrame, textCol: String,
                        buckets: Int = 4096, materializeGrams: Boolean = true): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val spark = raw.sparkSession
    val withBLazy = withGramBuckets(graft.core.Parallelism.defend(raw), textCol, buckets)
    val withB = if (materializeGrams) withBLazy.localCheckpoint() else withBLazy
    val lpT = spark.sparkContext.broadcast(bucketLogProbs(target, textCol, buckets))
    val lpR = spark.sparkContext.broadcast(bucketLogProbsFromGrams(withB, buckets))
    val score = udf { (bs: Seq[Long]) =>
      var s = 0.0
      bs.foreach { b => s += lpT.value(b.toInt) - lpR.value(b.toInt) }
      s
    }
    withB
      .withColumn("n_grams", size(col("__b")).cast("long"))
      .withColumn("log_weight", score(col("__b")))
      .withColumn("avg_log_weight",
        when(col("n_grams") > 0, col("log_weight") / col("n_grams").cast("double"))
          .otherwise(lit(Double.NegativeInfinity)))
      .drop("__b")
  }

  /** Keep the `k` raw documents most target-like by `avg_log_weight`
    * (deterministic id tie-break), via the bounded map-side top-k aggregator
    * — O(k) shuffle, never a corpus sort.
    */
  def resampleTopK(scored: DataFrame, idCol: String, k: Int): DataFrame = {
    val agg = scored.agg(graft.operators.TopK.topK(k)(
      col("avg_log_weight"), col(idCol)).as("top"))
    graft.operators.TopK.explodeRanked(agg, "top", Nil)
      .select(col("id").as(idCol), col("rank"), col("score").as("avg_log_weight"))
  }
}
