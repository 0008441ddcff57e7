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

  test("auto gates on estimated bytes, not just rows (VERDICT r2 wrong-#1)") {
    import graft.vector.VectorSearchAgg.{BroadcastRoute, DistributedRoute}
    // narrow corpus: 100k rows of ~16-char chunks + 8-dim embeddings
    // ≈ 100k × (32 + 32 + 48) ≈ 11 MB estimated — rows at the gate, bytes tiny
    val narrow = spark.range(100000).select(
      col("id").as("doc_id"),
      concat(lit("tiny chunk "), col("id")).as("chunk"),
      transform(sequence(lit(1), lit(8)), i => (i + col("id")).cast("float")).as("embedding"))
    assert(VectorSearchAgg.chooseRoute(narrow, "chunk", "embedding",
      maxRows = 100000L, maxBytes = 64L << 20) == BroadcastRoute,
      "100k narrow rows must still broadcast")

    // wide corpus: 50k rows of ~6 KB chunks → ≈ 50k × 12 KB ≈ 600 MB estimated
    // — under the row gate, far over any sane driver-collect budget
    val wide = spark.range(50000).select(
      col("id").as("doc_id"),
      concat_ws("", array_repeat(lit("loremipsum"), 600)).as("chunk"),
      transform(sequence(lit(1), lit(8)), i => (i + col("id")).cast("float")).as("embedding"))
    assert(VectorSearchAgg.chooseRoute(wide, "chunk", "embedding",
      maxRows = 100000L, maxBytes = 64L << 20) == DistributedRoute,
      "50k × ~6 KB rows must never be collected to the driver")

    // null chunks/embeddings must not poison the estimate
    val withNulls = spark.range(10).select(
      col("id").as("doc_id"),
      when(col("id") % 2 === 0, lit(null).cast("string")).otherwise(lit("x")).as("chunk"),
      when(col("id") % 3 === 0, lit(null).cast("array<float>"))
        .otherwise(array(lit(1f))).as("embedding"))
    assert(VectorSearchAgg.chooseRoute(withNulls, "chunk", "embedding",
      maxRows = 100L, maxBytes = 1L << 20) == BroadcastRoute)
  }

  private def rankedIds(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
    df.select(col("query_id"), transform(col("search_results"), r => r.getField("doc_id")).as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap

  test("ann with numCandidates >= corpus equals the exact search, same shape") {
    val docs = graft.core.Tables(spark, sfDir, "documents")
    val corpus = MlPredict.embed(docs, "local-embed-64", "text")
      .select(col("doc_id"), col("text").as("chunk"), col("embedding"))
    val queries = MlPredict.embed(
      docs.orderBy("doc_id").limit(9).select(col("doc_id").as("query_id"), col("text").as("query")),
      "local-embed-64", "query").cache()
    val exact = VectorSearchAgg.distributed(queries, corpus, "embedding", 3)
    // breadth >= corpus -> every list probed -> ANN degenerates to exact:
    // identical docs, ranks, scores AND schema (the output-shape contract;
    // compared against `distributed`, which shares the assembly tail — the
    // broadcast-store path differs in nullability flags only)
    val ann = VectorSearchAgg.ann(queries, corpus, "embedding", 3,
      numCandidates = 1000, nLists = 8)
    assert(ann.schema == exact.schema, "ann must keep the exact path's schema verbatim")
    assert(ann.schema.simpleString ==
      VectorSearchAgg.auto(spark, queries, corpus, "embedding", 3).schema.simpleString)
    assert(ann.count() == exact.count())
    assert(rankedIds(ann) == rankedIds(exact),
      "full-breadth ann must return the exact ranked ids")
  }

  test("ann recall >= 0.95 vs exact when probing a strict subset of the corpus") {
    // the lab3/q34 shape: the RAG corpus is the embedded documents table and
    // the queries are embedded query texts — template-heavy text, so the
    // embedding space is genuinely clustered (the regime IVF is built for)
    val docs = graft.core.Tables(spark, sfDir, "documents")
    val corpus = MlPredict.embed(docs, "local-embed-64", "text")
      .select(col("doc_id"), col("text").as("chunk"), col("embedding")).cache()
    val n = corpus.count()
    val queries = MlPredict.embed(
      docs.orderBy("doc_id").limit(120)
        .select(col("doc_id").as("query_id"), col("text").as("query")),
      "local-embed-64", "query", "qv").cache()
    val numCandidates = 100
    assert(numCandidates < n, "the breadth knob must bind for this to test ANN at all")
    // default AutoLists sizing (what the lab flag uses): 4·√500 ≈ 89 lists,
    // nc=100 probes ~13 of them — 1/5 of the corpus scored
    val exact = VectorSearchAgg.auto(spark, queries, corpus, "qv", 3)
    val ann = VectorSearchAgg.ann(queries, corpus, "qv", 3,
      numCandidates = numCandidates)
    val e = rankedIds(exact)
    val a = rankedIds(ann)
    val hits = e.keys.toSeq.map { q => (a(q).toSet intersect e(q).toSet).size.toDouble / e(q).size }
    val recall = hits.sum / hits.size
    assert(recall >= 0.95, f"ANN recall $recall%.3f below the 0.95 gate (${e.size} queries)")
  }

  test("lab3Fleet ann flag: same surge rows and schema as the exact default") {
    val exact = graft.pipelines.Labs.lab3Fleet(spark, sfDir)
    val ann = graft.pipelines.Labs.lab3Fleet(spark, sfDir, ann = true)
    assert(ann.schema == exact.schema)
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.select("window_start", "zone", "request_count").collect().toSet
    assert(key(ann) == key(exact) && key(ann).nonEmpty,
      "the surge set is ANN-independent; only the RAG context may vary")
  }

  test("lab4Fraud policyAnn flag: same claim queue, verdicts stay in the enum, prompt carries policy context") {
    val enum5 = Set("APPROVE", "APPROVE_PARTIAL", "REQUEST_DOCS", "DENY_INELIGIBLE", "DENY_FRAUD")
    val base = graft.pipelines.Labs.lab4Fraud(spark, sfDir)
    val rag = graft.pipelines.Labs.lab4Fraud(spark, sfDir, policyAnn = Some(500))
    assert(rag.schema == base.schema)
    val ids = (df: org.apache.spark.sql.DataFrame) =>
      df.select("claim_id").collect().map(_.getLong(0)).toSet
    assert(ids(rag) == ids(base) && ids(rag).nonEmpty,
      "policy enrichment must not change WHICH claims are queued")
    assert(rag.collect().forall(r => enum5(r.getAs[String]("verdict"))))
  }
}
