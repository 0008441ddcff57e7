package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-level retrieval composition: fusing independently-produced ranked
  * lists (sparse BM25, dense ANN, ...) without ever comparing their
  * incommensurable scores — only ranks.
  */
object Retrieval {

  /** Reciprocal Rank Fusion: score(d) = Σ_lists 1/(k0 + rank_list(d)), the
    * standard hybrid-retrieval combiner (Cormack et al., SIGIR'09; the
    * default in most RAG stacks because it needs no score calibration).
    *
    * Each input holds (query_id, doc_id, rank) for its top candidates; a doc
    * absent from a list contributes 0 from it. k0 = 60 is the conventional
    * damping. All arithmetic is rational (integer rank + one correctly-
    * rounded division per list, summed in fixed list order) — bit-exact
    * cross-engine, so the oracle hashes.
    *
    * Scale shape: inputs are already top-k-per-query sized (|queries|·k rows
    * — tiny regardless of corpus size; the corpus-scale work happened inside
    * the retrievers). The fusion is |lists|−1 full-outer joins on
    * (query_id, doc_id) and one window per query. Nothing here ever sees the
    * corpus.
    */
  def rrf(lists: Seq[DataFrame], k0: Int = 60, k: Int = 10): DataFrame = {
    require(lists.nonEmpty, "rrf: no input lists")
    require(k0 > 0 && k >= 1, s"rrf: bad params k0=$k0 k=$k")
    val tagged = lists.zipWithIndex.map { case (df, i) =>
      df.select(col("query_id"), col("doc_id"), col("rank").cast("double").as(s"__r$i"))
    }
    val joined = tagged.reduce((a, b) => a.join(b, Seq("query_id", "doc_id"), "full_outer"))
    // fixed left-assoc fold over list index — float addition is not
    // associative, and the oracle mirrors this exact tree
    val score = tagged.indices
      .map(i => coalesce(lit(1.0) / (lit(k0.toDouble) + col(s"__r$i")), lit(0.0)))
      .reduce(_ + _)
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("doc_id"))
    joined.withColumn("score", score)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("score"), col("rank"))
  }

  /** Cross-encoder-style reranking — the final stage of a retrieval stack:
    * re-score each (query, candidate) pair with `score`, an expression
    * computed JOINTLY over the pair (unlike the bi-encoder retrievers whose
    * query and doc representations never meet before the distance), and keep
    * the top `k` per query by the new score, ties broken on doc_id for
    * determinism. Emits dense `rank` 1..k and keeps every input column.
    *
    * Scale shape: input is already top-k'-per-query sized (|queries|·k' rows
    * regardless of corpus size — the entire point of retrieve-then-rerank is
    * that the expensive joint scorer never touches the corpus). For a learned
    * scorer pass an [[graft.ml.MlPredict]]-derived column: the model-call
    * budget is exactly |queries|·k'. [[lexicalScore]] is the zero-model
    * scorer (and the oracle-expressible stand-in).
    */
  def rerank(candidates: DataFrame, score: Column, k: Int = 10,
             queryIdCol: String = "query_id", docIdCol: String = "doc_id"): DataFrame = {
    require(k >= 1, s"rerank: k must be >= 1, got $k")
    val w = Window.partitionBy(queryIdCol).orderBy(col("score").desc, col(docIdCol))
    candidates.withColumn("score", score)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Joint token-overlap scorer for [[rerank]]: Jaccard over the pair's
    * distinct lowercased whitespace tokens. Row-local codegen builtins only —
    * and exactly expressible in ANSI SQL, so reranked output stays
    * oracle-checkable end to end.
    */
  def lexicalScore(queryText: Column, docText: Column): Column = {
    val qt = array_distinct(split(trim(lower(queryText)), "\\s+"))
    val dt = array_distinct(split(trim(lower(docText)), "\\s+"))
    val inter = size(array_intersect(qt, dt)).cast("double")
    val uni = size(array_union(qt, dt)).cast("double")
    when(uni > 0, inter / uni).otherwise(lit(0.0))
  }
}
