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

  /** (doc_id, fingerprint BIGINT) — distinct winnowed k-gram hashes per doc. */
  def fingerprints(df: DataFrame, textCol: String, idCol: String,
                   k: Int = 3, w: Int = 4): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"), Text.tokens(col(textCol)).as("__toks"))
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
    */
  def sharedFingerprintPairs(df: DataFrame, textCol: String, idCol: String,
                             k: Int = 3, w: Int = 4, minShared: Int = 2): DataFrame = {
    val fp = fingerprints(df, textCol, idCol, k, w)
    val a = fp.select(col("fingerprint"), col("doc_id").as("id_a"))
    val b = fp.select(col("fingerprint"), col("doc_id").as("id_b"))
    a.join(b, Seq("fingerprint")).filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("shared_fingerprints"))
      .filter(col("shared_fingerprints") >= minShared)
  }
}
