package graft

import org.apache.spark.sql.functions._

import graft.ml.MlPredict
import graft.vector.{VectorSearchAgg, VectorStore}

/** The distributed (corpus-stays-distributed) vector search must return
  * exactly the broadcast-store results — same docs, same ranks, same scores —
  * since both are exact cosine with the same tie-break. The distributed path
  * is what the lab pipelines switch to above the broadcast threshold.
  */
class VectorSearchSpec extends SparkSpec {

  test("distributed search equals broadcast-store search on the documents corpus") {
    val docs = graft.core.Tables(spark, sfDir, "documents")
    val corpus = MlPredict.embed(docs, "local-embed-64", "text")
      .select(col("doc_id"), col("text").as("chunk"), col("embedding"))

    val queries = docs.orderBy("doc_id").limit(7)
      .select(col("doc_id").as("query_id"), col("text").as("query"))
    val embedded = MlPredict.embed(queries, "local-embed-64", "query").cache()

    val store = VectorStore.bruteForce(corpus, "doc_id", "chunk", "embedding")
    val viaStore = VectorSearchAgg(spark, embedded, store, "embedding", 3)
    val viaDistributed = VectorSearchAgg.distributed(embedded, corpus, "embedding", 3)

    def norm(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[(Long, String, Double)]] =
      df.select(col("query_id"),
          transform(col("search_results"),
            r => struct(r.getField("doc_id"), r.getField("chunk"),
              round(r.getField("score"), 9))).as("sr"))
        .collect()
        .map { row =>
          row.getLong(0) -> row.getSeq[org.apache.spark.sql.Row](1)
            .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        }.toMap

    val a = norm(viaStore)
    val b = norm(viaDistributed)
    assert(a.nonEmpty && a == b, "both physical plans must return identical ranked results")
  }

  test("auto picks the distributed plan above the broadcast threshold and keeps results") {
    val docs = graft.core.Tables(spark, sfDir, "documents")
    val corpus = MlPredict.embed(docs, "local-embed-64", "text")
      .select(col("doc_id"), col("text").as("chunk"), col("embedding"))
    val queries = MlPredict.embed(
      docs.orderBy("doc_id").limit(3).select(col("doc_id").as("query_id"), col("text").as("query")),
      "local-embed-64", "query").cache()

    // threshold below corpus size → forced onto the distributed path
    val small = VectorSearchAgg.auto(spark, queries, corpus, "embedding", 2, broadcastThreshold = 10L)
    val big = VectorSearchAgg.auto(spark, queries, corpus, "embedding", 2, broadcastThreshold = 1000000L)
    val idsOf = (df: org.apache.spark.sql.DataFrame) =>
      df.select(col("query_id"), transform(col("search_results"), r => r.getField("doc_id")).as("ids"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(idsOf(small) == idsOf(big))
  }
}
