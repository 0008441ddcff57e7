package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Model-based quality filtering — the learned stage modern corpus recipes
  * run AFTER the heuristic gates (CCNet trains a fastText classifier against
  * a high-quality reference corpus; DCLM/FineWeb-Edu the same shape with
  * different positives). Re-expressed Spark-first:
  *
  *  - [[featurize]]: a FIXED, documented vector of row-local text signals
  *    (all reused from the oracle-proven [[Text]] family) — codegen'd, zero
  *    shuffle, no vocabulary state;
  *  - [[train]]: distributed logistic regression on those features via
  *    spark.ml L-BFGS (ships with Spark — no new dependency); the fitted
  *    model is extracted into a plain [[Model]] (weights + intercept), so
  *    NOTHING mllib survives into the scoring path;
  *  - [[logit]] / [[score]]: scoring is a pure Column expression — a
  *    left-to-right dot-product fold plus the intercept — that inlines into
  *    whole-stage codegen and (being rational arithmetic) is reproducible
  *    cross-engine given literal weights. `quality_prob` adds the sigmoid
  *    for thresholding convenience (transcendental — spec-land only).
  *
  * 100 TB shape: training reads the (tiny) labeled set; scoring is a
  * row-local map over the corpus with the weights as literals in the plan —
  * no broadcast, no shuffle, nothing model-sized.
  */
object QualityClassifier {

  /** Fixed feature order — documented because a trained [[Model]] is only
    * meaningful against the exact vector it was fitted on.
    */
  val featureNames: Seq[String] = Seq(
    "len_sat", "mean_word_len", "stopword_ratio", "uniq_ratio",
    "alpha_word_ratio", "punct_ratio", "digit_ratio", "dup_2gram_frac")

  /** ARRAY<DOUBLE> of [[featureNames]] signals for one text column.
    *
    * `toks` MUST be a bound attribute (a column that already exists on the
    * row), not an inline `Text.tokens(c)` expression: four of the features
    * are HOFs whose lambdas reference it, Catalyst does not CSE inside
    * lambdas, and an inline token expression re-splits the text PER ELEMENT
    * — the measured cost was 75 s where the bound form runs in ~3 s at sf1
    * (the shinglesFromTokens/int8Quantize lesson, third sighting).
    */
  def features(c: Column, toks: Column): Column = {
    val n = greatest(size(toks), lit(1)).cast("double")
    val chars = greatest(length(c), lit(1)).cast("double")
    array(
      // saturating length chars/(chars+300) instead of ln(1+chars): one IEEE
      // division, bit-reproducible cross-engine (java Math.log vs libm log
      // measured a 1-ulp divergence on this very corpus)
      chars / (chars + lit(300.0)),
      Text.meanWordLen(toks),
      Text.wordHits(toks, Text.enStopwords) / n,
      size(array_distinct(toks)).cast("double") / n,
      Text.alphaWordRatio(toks),
      Text.punctCount(c).cast("double") / chars,
      Text.digitCount(c).cast("double") / chars,
      Text.dupNgramFrac(toks, 2))
  }

  /** Append the feature vector as `featuresCol` (default "features"). The
    * token array materializes as a bound attribute first — the HOF-lambda CSE
    * rule (Text.shinglesFromTokens doc); CollapseProject leaves the binding
    * alone because it is referenced by multiple feature expressions.
    */
  def featurize(df: DataFrame, textCol: String, featuresCol: String = "features"): DataFrame =
    df.withColumn("__qc_toks", Text.tokens(col(textCol)))
      .withColumn(featuresCol, features(col(textCol), col("__qc_toks")))
      .drop("__qc_toks")

  /** Plain fitted model: nothing mllib-typed escapes [[train]]. */
  case class Model(weights: Array[Double], intercept: Double) {
    require(weights.length == featureNames.length,
      s"model has ${weights.length} weights for ${featureNames.length} features")
  }

  /** Fit logistic regression on (featuresCol: ARRAY<DOUBLE>, labelCol: 0/1).
    * L-BFGS with L2 — deterministic for a given dataset. The labeled set is
    * pipeline configuration (thousands of rows, not corpus-scale).
    */
  def train(labeled: DataFrame, featuresCol: String = "features",
            labelCol: String = "label", regParam: Double = 0.01,
            maxIter: Int = 100): Model = {
    val asVec = udf { (a: Seq[Double]) => org.apache.spark.ml.linalg.Vectors.dense(a.toArray) }
    val lr = new org.apache.spark.ml.classification.LogisticRegression()
      .setFeaturesCol("__fvec").setLabelCol(labelCol)
      .setRegParam(regParam).setMaxIter(maxIter).setStandardization(true)
    val fitted = lr.fit(labeled.withColumn("__fvec", asVec(col(featuresCol))))
    Model(fitted.coefficients.toArray, fitted.intercept)
  }

  /** The linear logit w·x + b over a feature ARRAY column: left-to-right
    * fold, rational arithmetic — the monotone-equivalent ranking score an
    * oracle can reproduce bit-for-bit when the weights are literals.
    */
  def logit(featuresCol: Column, m: Model): Column =
    m.weights.zipWithIndex
      .map { case (w, i) => element_at(featuresCol, i + 1) * lit(w) }
      .foldLeft(lit(m.intercept): Column)(_ + _)

  /** Score a corpus: appends `quality_logit` (rank on this) and
    * `quality_prob` (sigmoid, for absolute thresholds).
    */
  def score(df: DataFrame, textCol: String, m: Model): DataFrame =
    featurize(df, textCol, "__qf")
      .withColumn("quality_logit", logit(col("__qf"), m))
      .withColumn("quality_prob", lit(1.0) / (lit(1.0) + exp(-col("quality_logit"))))
      .drop("__qf")
}
