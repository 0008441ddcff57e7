package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Corpus-level term statistics: document frequency and per-doc
  * characteristic terms (tf·idf keyword extraction).
  */
object CorpusStats {

  /** Top-k characteristic terms per document by tf·idf.
    *
    * idf is the RATIONAL form N/df, not log(N/df): the ranking inside a doc
    * is identical (log is monotone), and rational arithmetic on integers is
    * bit-reproducible across engines, so the DuckDB oracle can hash-match —
    * transcendentals are where cross-engine float equality goes to die.
    *
    * Scale shape: tf is a (doc, token)-keyed map-side-combined agg over the
    * exploded scan; df is a vocab-sized agg OF tf (not of the corpus — tf is
    * already one row per (doc, token)); the join back to tf shuffles on token
    * (vocab-partitioned, the standard inverted layout); the final top-k is a
    * per-doc window bounded by each doc's own vocabulary. Ties break on the
    * token string so the cut is deterministic.
    */
  def tfIdfTopTerms(df: DataFrame, textCol: String, idCol: String, k: Int = 3): DataFrame = {
    val n = df.count()
    val tf = df
      .select(col(idCol).as("doc_id"), explode(Text.tokens(lower(col(textCol)))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("token"))
    tf.join(dfreq, "token")
      .withColumn("score", (col("tf") * n).cast("double") / col("df"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("doc_id", "token", "tf", "df", "score", "rank")
  }

  /** Corpus-wide heavy-hitter n-grams by document frequency — the discovery
    * step for boilerplate mining (what should [[Dedup.lineDedup]]'s cap or a
    * blocklist target?). Per-doc distinct shingles are row-local; the count
    * aggregate map-side combines before its one shuffle, and the top-k is a
    * TakeOrderedAndProject (k rows per partition to the driver, never a full
    * sort). Ties break on the n-gram string so the cut is deterministic.
    */
  def topNgrams(df: DataFrame, textCol: String, n: Int = 3, k: Int = 25): DataFrame = {
    val sz = n
    // imperative per-doc distinct shingles (Dedup.RowHash mirrors the HOF
    // semantics bit-for-bit, spec-pinned): the HOF formulation evaluates
    // interpreted per element and measured 40-70× slower at sf1
    val shUdf = udf { text: String =>
      val sh = Dedup.RowHash.shingles(Dedup.RowHash.tokens(text), sz)
      val seen = new java.util.LinkedHashSet[String]()
      var i = 0
      while (i < sh.length) { seen.add(sh(i)); i += 1 }
      seen.toArray(new Array[String](seen.size()))
    }
    df.select(explode(shUdf(col(textCol))).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("ngram")).limit(k)
  }
}
