package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Corpus-curation operators for training-data pipelines: deterministic
  * sampling/splitting, text cleaning, token-budget packing, and the composed
  * end-to-end curation flow. Everything is content-hash-driven — reproducible
  * across runs, partitionings, and engines (md5 is the cross-engine hash).
  */
object Curation {

  /** Stable per-row bucket in [0, 100) from a content hash — the basis for
    * deterministic sampling and train/test splits. Unlike `df.sample`, the
    * assignment depends only on the value, so it is reproducible across runs,
    * engines, and cluster layouts, and consistent for duplicate content.
    */
  def hashBucket(c: Column): Column =
    pmod(conv(substring(md5(c), 1, 8), 16, 10).cast("long"), lit(100))

  /** Deterministic pct% sample. */
  def sample(df: DataFrame, keyCol: String, pct: Int): DataFrame =
    df.filter(hashBucket(col(keyCol)) < pct)

  /** Deterministic train/validation/test split assignment. */
  def split(df: DataFrame, keyCol: String, trainPct: Int, validPct: Int): DataFrame =
    df.withColumn("split",
      when(hashBucket(col(keyCol)) < trainPct, "train")
        .when(hashBucket(col(keyCol)) < trainPct + validPct, "valid")
        .otherwise("test"))

  /** Text normalisation for training corpora: collapse whitespace, strip
    * control characters, trim. Row-local, codegen'd.
    */
  def cleanText(c: Column): Column =
    trim(regexp_replace(regexp_replace(c, "[\\x00-\\x1f]", " "), "\\s+", " "))

  /** Pack documents into token-budgeted chunks: order by `orderCol`, running
    * token total, `pack_id = floor((cumsum - tokens) / budget)` — every pack
    * holds consecutive docs whose combined tokens stay ~within budget. The
    * single global sort is the scale bottleneck by design (packing is an
    * inherently ordered operation); shard by a partition column first when the
    * corpus exceeds one sort's practical size.
    */
  def packByTokenBudget(df: DataFrame, textCol: String, orderCol: String, budget: Int): DataFrame = {
    val w = Window.orderBy(col(orderCol)).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_tokens", Text.tokenCount(col(textCol)).cast("long"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("pack_id", floor((col("cum_tokens") - col("n_tokens")) / budget).cast("long"))
  }

  /** The composed curation flow a 100 TB pre-training pipeline runs:
    * exact dedup → near-dup removal (MinHash LSH, keep the lowest id of each
    * verified pair) → language filter → quality threshold. Returns the
    * surviving rows with their scores; every stage is one of the individually
    * oracle-checked operators.
    */
  def curate(df: DataFrame, textCol: String, idCol: String,
             lang: String = "en", minQuality: Double = 0.0,
             jaccardThreshold: Double = 0.5): DataFrame = {
    val keeperIds = Dedup.exact(df, textCol, idCol).select(col(idCol))
    val exactDeduped = df.join(keeperIds, Seq(idCol), "leftsemi")
    val nearDupLosers = Dedup.minHashLsh(exactDeduped, textCol, idCol, threshold = jaccardThreshold)
      .select(col("id_b").as(idCol)).distinct()
    exactDeduped.join(nearDupLosers, Seq(idCol), "leftanti")
      .withColumn("lang_pred", Text.langId(col(textCol)))
      .withColumn("quality", Text.qualityScore(col(textCol)))
      .filter(col("lang_pred") === lang && col("quality") >= minQuality)
  }
}
