package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale corpus pipelines (language-ID
  * heuristics, quality scoring, token counting, fingerprinting). All pure
  * Column expressions — row-local, codegen'd, shuffle-free.
  */
object Text {

  /** Whitespace tokenization; trims first so leading/trailing blanks don't
    * produce empty tokens.
    */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** Exact content fingerprint (md5 hex) — the key for exact dedup. */
  def fingerprint(c: Column): Column = md5(c)

  /** Count of tokens found in `words`. */
  def wordHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  val enStopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")
  val esStopwords: Seq[String] = Seq("el", "la", "de", "y", "que", "en", "un", "es", "por", "con")
  val deStopwords: Seq[String] = Seq("der", "die", "das", "und", "zu", "in", "ist", "ein", "mit", "von")

  /** Stopword-ratio language scores; deterministic heuristic language-ID. */
  def langScores(c: Column): Column = {
    val t = tokens(c)
    val n = greatest(size(t), lit(1)).cast("double")
    struct(
      (wordHits(t, enStopwords) / n).as("en"),
      (wordHits(t, esStopwords) / n).as("es"),
      (wordHits(t, deStopwords) / n).as("de"))
  }

  /** argmax language with deterministic tie-break en > es > de. */
  def langId(c: Column): Column = {
    val s = langScores(c)
    when(s("en") >= s("es") && s("en") >= s("de"), "en")
      .when(s("es") >= s("de"), "es")
      .otherwise("de")
  }

  /** Character-class counts used by quality scoring. */
  def punctCount(c: Column): Column =
    length(c) - length(regexp_replace(c, "[\\p{Punct}]", ""))

  def digitCount(c: Column): Column =
    length(c) - length(regexp_replace(c, "[0-9]", ""))

  /** Simple composite quality score in [0,1]: rewards mid-length docs with a
    * healthy stopword ratio and diverse vocabulary, penalises punctuation/digit
    * noise. Deterministic; each term is a single float op chain.
    */
  def qualityScore(c: Column): Column = {
    val t = tokens(c)
    val n = greatest(size(t), lit(1)).cast("double")
    val chars = greatest(length(c), lit(1)).cast("double")
    val stopRatio = wordHits(t, enStopwords) / n
    val uniqRatio = size(array_distinct(t)).cast("double") / n
    val punctRatio = punctCount(c).cast("double") / chars
    val digitRatio = digitCount(c).cast("double") / chars
    val lenScore = least(n / lit(64.0), lit(1.0))
    // unrounded: every term is a short chain of IEEE ops evaluated in written
    // order, so the result is bit-reproducible across engines; rounding would
    // reintroduce HALF_UP (Spark) vs half-even (DuckDB) divergence on ties
    least(stopRatio * 2.0, lit(1.0)) * 0.3 + uniqRatio * 0.3 + lenScore * 0.2 +
      (lit(1.0) - least(punctRatio * 4.0, lit(1.0))) * 0.1 +
      (lit(1.0) - least(digitRatio * 4.0, lit(1.0))) * 0.1
  }

  /** Mean token length over a materialized token array (Gopher-style signal;
    * Rae et al. 2021 §A1.1 filters docs outside [3, 10]). Single aggregate
    * HOF pass — row-local, no shuffle.
    */
  def meanWordLen(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
      greatest(size(toks), lit(1)).cast("double")

  /** Fraction of tokens containing at least one lowercase letter (the Gopher
    * "80% of words must contain an alphabetic character" signal).
    */
  def alphaWordRatio(toks: Column): Column =
    size(filter(toks, t => t.rlike("[a-z]"))).cast("double") /
      greatest(size(toks), lit(1)).cast("double")

  /** Duplicate-n-gram fraction: 1 − distinct/total over token n-grams
    * (n = 1 is duplicate-word fraction). The Gopher repetition family — a high
    * fraction marks boilerplate/spam that exact and MinHash dedup both miss
    * because it repeats *within* one document, not across documents.
    */
  def dupNgramFrac(toks: Column, n: Int): Column = {
    val grams = if (n == 1) toks else shinglesFromTokens(toks, n)
    lit(1.0) - size(array_distinct(grams)).cast("double") /
      greatest(size(grams), lit(1)).cast("double")
  }

  /** Token n-gram shingles (incl. duplicates) from a MATERIALIZED token array
    * column. `toks` must be a bound attribute (a column produced by a prior
    * select/withColumn), not a derived expression: Catalyst does not CSE
    * inside higher-order-function lambdas, so a derived `split(...)` here
    * would re-evaluate once per element reference — O(tokens²) per row
    * (measured 8× slowdown at sf0.1 before this restructuring).
    */
  def shinglesFromTokens(toks: Column, n: Int): Column =
    transform(sequence(lit(1), greatest(size(toks) - (n - 1), lit(1))),
      i => concat_ws(" ", (0 until n).map(j => try_element_at(toks, i + j)): _*))

  /** Convenience one-shot shingles (distinct) — fine for small frames and
    * candidate verification; hot paths should materialize tokens first and
    * use [[shinglesFromTokens]] (see Dedup.minHashSignatures).
    */
  def shingles(c: Column, n: Int): Column = array_distinct(shinglesAll(c, n))

  /** Convenience one-shot shingles including duplicates. */
  def shinglesAll(c: Column, n: Int): Column = {
    val t = tokens(c)
    transform(sequence(lit(1), greatest(size(t) - (n - 1), lit(1))),
      i => concat_ws(" ", slice(t, i, lit(n))))
  }
}
