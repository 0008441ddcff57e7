package graft

import graft.llmops.Retrieval

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def list(rows: (Long, Long, Long)*) =
    rows.toSeq.toDF("query_id", "doc_id", "rank")

  test("rrf: standard two-list fusion with overlap and singletons") {
    val a = list((1L, 10L, 1L), (1L, 11L, 2L))
    val b = list((1L, 11L, 1L), (1L, 12L, 2L))
    val out = Retrieval.rrf(Seq(a, b)).orderBy("rank")
      .as[(Long, Long, Double, Long)].collect()
    val e10 = 1.0 / 61.0
    val e11 = 1.0 / 62.0 + 1.0 / 61.0
    val e12 = 1.0 / 62.0
    assert(out.map(r => (r._2, r._3, r._4)).toSeq ==
      Seq((11L, e11, 1L), (10L, e10, 2L), (12L, e12, 3L)))
  }

  test("rrf: tied scores break on doc_id; k caps output") {
    // same rank in one list each → identical scores
    val a = list((1L, 20L, 1L), (1L, 30L, 2L), (1L, 40L, 3L))
    val b = list((1L, 30L, 1L), (1L, 20L, 2L), (1L, 40L, 3L))
    val out = Retrieval.rrf(Seq(a, b), k = 2).orderBy("rank")
      .as[(Long, Long, Double, Long)].collect()
    assert(out.length == 2)
    assert(out(0)._2 == 20L && out(1)._2 == 30L) // equal scores → lower id first
    assert(out(0)._3 == out(1)._3)
  }

  test("rrf: three lists fold in list order; queries don't mix") {
    val a = list((1L, 10L, 1L), (2L, 10L, 1L))
    val b = list((1L, 10L, 2L))
    val c = list((1L, 10L, 4L), (2L, 99L, 1L))
    val out = Retrieval.rrf(Seq(a, b, c)).as[(Long, Long, Double, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out((1L, 10L)) == 1.0 / 61.0 + 1.0 / 62.0 + 1.0 / 64.0)
    assert(out((2L, 10L)) == 1.0 / 61.0 + 0.0 + 0.0)
    assert(out((2L, 99L)) == 0.0 + 0.0 + 1.0 / 61.0)
  }

  test("rrf: empty list seq rejected") {
    intercept[IllegalArgumentException] { Retrieval.rrf(Seq.empty) }
  }

  test("rerank + lexicalScore: exact Jaccards, dense ranks, k cap, queries independent") {
    import org.apache.spark.sql.functions.col
    val cands = Seq(
      (1L, 10L, "a b", "b a"),     // jaccard 1.0 (order-insensitive)
      (1L, 20L, "a b", "a b c d"), // 2/4 = 0.5
      (1L, 30L, "a b", "x y"),     // 0.0 — cut by k=2
      (2L, 10L, "zz", "zz"))       // second query unaffected by the first
      .toDF("query_id", "doc_id", "qt", "dt")
    val out = Retrieval.rerank(cands, Retrieval.lexicalScore(col("qt"), col("dt")), k = 2)
      .select("query_id", "doc_id", "score", "rank")
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(out == Set((1L, 10L, 1.0, 1L), (1L, 20L, 0.5, 2L), (2L, 10L, 1.0, 1L)))
  }

  test("rerank: ties break on doc_id; pre-existing score/rank columns are replaced") {
    import org.apache.spark.sql.functions.{col, lit}
    val cands = Seq((1L, 5L, "a", "a", 99.0, 9L), (1L, 3L, "a", "a", -1.0, 1L))
      .toDF("query_id", "doc_id", "qt", "dt", "score", "rank")
    val out = Retrieval.rerank(cands, Retrieval.lexicalScore(col("qt"), col("dt")), k = 10)
      .select("query_id", "doc_id", "score", "rank")
      .as[(Long, Long, Double, Long)].collect().sortBy(_._4)
    // equal scores → lower doc_id first; stale retriever score/rank gone
    assert(out.toSeq == Seq((1L, 3L, 1.0, 1L), (1L, 5L, 1.0, 2L)))
  }

  test("rerank: a model-backed joint scorer rides the same operator") {
    import org.apache.spark.sql.functions.{col, concat_ws}
    import graft.functions.Vectors
    import graft.ml.MlPredict
    val pairs = Seq(
      (1L, 10L, "apple banana", "apple banana cherry"),
      (1L, 20L, "apple banana", "unrelated words entirely"))
      .toDF("query_id", "doc_id", "qtext", "dtext")
    // joint encoding: the model sees the PAIR (query [SEP] doc) — the
    // cross-encoder contract; budget = |pairs| embed calls, never the corpus
    val withPair = pairs.withColumn("pair", concat_ws(" [SEP] ", col("qtext"), col("dtext")))
    val enc = MlPredict.embed(
      MlPredict.embed(withPair, "local-embed-64", "pair", "pvec"),
      "local-embed-64", "qtext", "qvec")
    val out = Retrieval.rerank(enc, Vectors.cosine(col("pvec"), col("qvec")), k = 1)
    val rows = out.select("query_id", "doc_id", "rank", "qtext").collect()
    assert(rows.length == 1 && rows.head.getLong(2) == 1L)
    assert(rows.head.getString(3) == "apple banana") // input columns survive
  }

  test("rerank: k must be positive") {
    import org.apache.spark.sql.functions.lit
    intercept[IllegalArgumentException] {
      Retrieval.rerank(list((1L, 10L, 1L)), lit(1.0), k = 0)
    }
  }
}
