package graft

import org.apache.spark.sql.functions._

import graft.vector.IvfIndex

class IvfPersistSpec extends SparkSpec {

  test("saved IVF index round-trips and probed search prunes partitions") {
    val emb = graft.core.Tables(spark, sfDir, "embeddings")
    val ivf = IvfIndex.build(emb.select(col("vec_id"), col("embedding")),
      "vec_id", "embedding", nLists = 8, iterations = 1)
    val dir = java.nio.file.Files.createTempDirectory("ivf").toString + "/index"
    ivf.save(dir)

    val loaded = IvfIndex.load(spark, dir)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val live = ivf.search(queries, "qid", "qvec", k = 3, nProbes = 3)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val persisted = loaded.search(queries, "qid", "qvec", k = 3, nProbes = 3)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(persisted == live, "persisted index must reproduce the live index's results")

    // partition pruning: a probed-list filter must appear as a PartitionFilter,
    // reading only those lists' files
    val pruned = loaded.assigned.filter(col("list_id").isin(0L, 1L))
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("list_id"),
      s"list filter must prune partitions:\n${scan.linesIterator.take(8).mkString("\n")}")
    assert(pruned.select(countDistinct("list_id")).head().getLong(0) <= 2)
  }

  test("incremental add/remove maintain the index; saved-layout append prunes like a rebuild") {
    val emb = graft.core.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val first = emb.filter(col("vec_id") % 2 === 0)
    val second = emb.filter(col("vec_id") % 2 === 1)
    val ivf = IvfIndex.build(first, "vec_id", "embedding", nLists = 4, iterations = 1)
    val grown = ivf.add(second, "vec_id", "embedding")
    assert(grown.assigned.count() == emb.count(), "added vectors join their lists")
    // an added vector must be FINDABLE: querying with its own embedding puts
    // it at rank 1 via self-similarity... self-matches are excluded, so check
    // a near-identical query id instead: the added vector appears among hits
    val probe = second.limit(3).select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val hits = grown.search(probe, "qid", "qvec", k = 5, nProbes = 4)
      .select("nid").collect().map(_.getLong(0)).toSet
    assert(second.select("vec_id").collect().map(_.getLong(0)).toSet.intersect(hits).nonEmpty,
      "added vectors must be retrievable")
    // remove drops exactly the requested ids
    import spark.implicits._
    val victims = second.limit(5).select(col("vec_id"))
    val pruned = grown.remove(victims, "vec_id")
    assert(pruned.assigned.count() == emb.count() - 5)
    assert(pruned.assigned.join(victims.withColumnRenamed("vec_id", "nid"), Seq("nid")).isEmpty)
    // saved-layout append: in-place file append reproduces the in-memory add
    val dir = java.nio.file.Files.createTempDirectory("ivf_add").toString + "/index"
    ivf.save(dir)
    IvfIndex.appendToSaved(spark, dir, second, "vec_id", "embedding")
    val loaded = IvfIndex.load(spark, dir)
    assert(loaded.assigned.count() == emb.count())
    val liveHits = grown.search(probe, "qid", "qvec", k = 3, nProbes = 4)
      .select("qid", "rank", "nid").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val savedHits = loaded.search(probe, "qid", "qvec", k = 3, nProbes = 4)
      .select("qid", "rank", "nid").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(liveHits == savedHits, "appended saved layout must search identically to the in-memory add")
    // occupancy signal exists and covers every list with members
    assert(grown.listStats.agg(sum("n")).head().getLong(0) == emb.count())
  }

  test("IVF-PQ: full-probe rerank recovers exact knn; saved layout searches identically") {
    import graft.vector.IvfPq
    val emb = graft.core.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val index = IvfPq.build(emb, "vec_id", "embedding", nLists = 4, m = 8, ks = 64)
    // compression contract: every code is exactly m bytes
    assert(index.encoded.select(length(col("pq_code"))).distinct().head().getInt(0) == 8)

    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    // the house ANN contract (PqIndexSpec): recall thresholds vs exact, not
    // equality — the ADC shortlist is an approximation by design
    def hits(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("qid", "nid").collect()
        .groupBy(_.getLong(0)).map { case (q, a) => q -> a.map(_.getLong(1)).toSet }
    val exact = hits(graft.vector.KnnJoin(queries,
      emb.select(col("vec_id").as("nid"), col("embedding").as("nvec")), k = 3))
    val got = hits(index.search(queries, "qid", "qvec", k = 3, nProbes = 4, rerankFactor = 16))
    val recall = exact.map { case (q, want) =>
      (got.getOrElse(q, Set.empty) & want).size.toDouble / want.size }.sum / exact.size
    assert(recall >= 0.8, s"full-probe IVF-PQ recall@3 too low: $recall")
    // (ks=16 measured 0.47 on this near-dup-dense fixture — identical through
    // plain PqIndex.searchRerank, so the codebook resolution, not the IVF
    // composition, is the recall lever; ks=64 measures 0.93)

    // persisted layout: identical results, probed-list partition pruning holds
    val dir = java.nio.file.Files.createTempDirectory("ivfpq").toString + "/index"
    index.save(dir)
    val loaded = IvfPq.load(spark, dir)
    // pruning is asserted on the ACTUAL search path: the static isInCollection
    // filter over the probed ids must surface as a PartitionFilter on the
    // saved layout's scan (not just on a hand-written literal filter)
    val diskSearch = loaded.search(queries, "qid", "qvec", k = 3, nProbes = 2, rerankFactor = 16)
    val searchPlan = diskSearch.queryExecution.executedPlan.toString
    assert(searchPlan.contains("PartitionFilters: [") && searchPlan.contains("list_id"),
      s"search over a saved layout must plan probed-list partition pruning:\n" +
        searchPlan.linesIterator.filter(_.contains("Scan")).take(6).mkString("\n"))
    val fromDisk = hits(loaded.search(queries, "qid", "qvec", k = 3, nProbes = 4, rerankFactor = 16))
    assert(fromDisk == got, "saved layout must search identically to the live index")

    // restricted probing still returns k ranked rows for EVERY query — a qid
    // dropping out of the output entirely must fail, not slip past forall
    val narrow = index.search(queries, "qid", "qvec", k = 3, nProbes = 1)
    val perQ = narrow.groupBy("qid").count().collect()
    assert(perQ.length == 5, s"all 5 queries must return rows, got ${perQ.length}")
    assert(perQ.forall(_.getLong(1) == 3))
  }

  test("numCandidates breadth maps onto probes: full breadth equals exact knn") {
    val emb = graft.core.Tables(spark, sfDir, "embeddings")
      .filter(col("vec_id") < 200).select(col("vec_id"), col("embedding"))
    val ivf = IvfIndex.build(emb, "vec_id", "embedding", nLists = 4, iterations = 1)
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    // numCandidates >= corpus size → every list probed → identical to exact
    val wide = ivf.searchNumCandidates(queries, "qid", "qvec", k = 3, numCandidates = 200)
      .select("qid", "rank", "nid").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val exact = ivf.search(queries, "qid", "qvec", k = 3, nProbes = 4)
      .select("qid", "rank", "nid").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(wide == exact)
    // tiny breadth still returns k results (clamped to >= 1 probe)
    assert(ivf.searchNumCandidates(queries, "qid", "qvec", k = 2, numCandidates = 1).count() > 0)
  }
}

class SqlFunctionsSpec extends SparkSpec {
  test("graft function pack works through a SQL-only session") {
    // getOrCreate ignores withExtensions when the shared suite session exists,
    // so register into it — same builders the extension installs
    val s2 = spark
    graft.plans.GraftExtensions.registerAll(s2)
    try {
      graft.core.Tables(s2, sfDir, "documents").limit(20).createOrReplaceTempView("docs_v")
      val rows = s2.sql("""
        SELECT doc_id,
               graft_quality_score(text) AS q,
               graft_lang_id(text) AS lang,
               graft_token_count(text) AS toks,
               graft_hash_bucket(text) AS bucket,
               graft_money_fmt(CAST(doc_id AS DOUBLE) + 0.5) AS money,
               graft_clean_text('  a   b ') AS cleaned,
               graft_normalize_text('Cafe\u0301   LATTE') AS norm
        FROM docs_v""").collect()
      assert(rows.length == 20)
      assert(rows.forall(r => r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0))
      assert(rows.forall(r => Set("en", "es", "de")(r.getString(2))))
      assert(rows.forall(r => r.getLong(3) > 0))
      assert(rows.forall(r => r.getLong(4) >= 0 && r.getLong(4) < 100))
      assert(rows.forall(_.getString(6) == "a b"))
      assert(rows.forall(_.getString(7) == "caf\u00e9 latte"), "NFC + lower + ws collapse through SQL")
      assert(rows.head.getString(5).endsWith(".50"))
      graft.core.Tables(s2, sfDir, "embeddings").limit(5).createOrReplaceTempView("emb_v")
      val jl = s2.sql("SELECT graft_jl_project(embedding, 16) AS p FROM emb_v").collect()
      assert(jl.length == 5 && jl.forall(_.getSeq[Double](0).length == 16))
      val bad = intercept[Exception] {
        s2.sql("SELECT graft_jl_project(embedding, CAST(vec_id AS INT)) FROM emb_v").collect()
      }
      assert(bad.getMessage.contains("INT literal"), bad.getMessage)
      // ML_PREDICT's SQL surface: scalar model invocation with catalog dispatch
      val ml = s2.sql("""
        SELECT ml_predict('local-textgen', text) AS resp,
               size(ml_embed('local-embed-64', text)) AS dim
        FROM docs_v LIMIT 3""").collect()
      assert(ml.forall(_.getString(0).startsWith("[local-textgen]")))
      assert(ml.forall(_.getInt(1) == 64))
    } finally () // shared-context session; do not stop (same JVM SparkContext)
  }
}
