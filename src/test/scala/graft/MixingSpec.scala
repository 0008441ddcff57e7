package graft

import org.apache.spark.sql.functions._

import graft.llmops.{Curation, Dedup}

/** Specs for the corpus-recipe operators: benchmark decontamination,
  * stratified sampling, and domain-mixture weighting.
  */
class MixingSpec extends SparkSpec {

  test("decontaminate flags planted contamination; clean docs stay clean") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely unrelated prose about catalyst optimizer internals"),
      (3L, "the quick brown fox jumps over another dog entirely")).toDF("doc_id", "text")
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val res = Dedup.decontaminate(corpus, bench, "text", "doc_id", shingleSize = 3, threshold = 0.5)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(res.size == 3)
    assert(res(1L).getAs[Double]("overlap") == 1.0 && res(1L).getAs[Boolean]("contaminated"))
    assert(res(2L).getAs[Long]("matched") == 0L && !res(2L).getAs[Boolean]("contaminated"))
    // doc 3 shares exactly the 4 leading trigrams of its 7 ("the quick brown"
    // ... "jumps over another" diverges) → matched 4 of 7, flagged at 0.5
    assert(res(3L).getAs[Long]("matched") == 4L)
    assert(res(3L).getAs[Long]("n_ngrams") == 7L)
    assert(res(3L).getAs[Boolean]("contaminated"))
  }

  test("decontaminate broadcast and distributed paths are identical on real docs") {
    val docs = graft.core.Tables(spark, sfDir, "documents")
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val bench = docs.filter(col("doc_id") % 10 === 0)
    def rows(forced: Boolean) =
      Dedup.decontaminate(corpus, bench, "text", "doc_id", shingleSize = 3,
        threshold = 0.5, forceDistributed = forced)
        .orderBy("doc_id").collect().toSeq
    val broadcastPath = rows(forced = false)
    assert(broadcastPath.nonEmpty)
    assert(broadcastPath == rows(forced = true))
  }

  test("stratified sample honors rates, keeps everything at 100, nests in the plain sample") {
    val docs = graft.core.Tables(spark, sfDir, "documents")
    val stratum = when(length(col("text")) < 200, "short")
      .when(length(col("text")) < 500, "medium").otherwise("long")
    val kept = Curation.stratifiedSample(docs, stratum, "text",
      Map("short" -> 10, "medium" -> 50, "long" -> 100))
    val keptByStratum = kept.groupBy("stratum").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val allByStratum = docs.withColumn("stratum", stratum).groupBy("stratum").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // rate 100 keeps the whole stratum; lower rates keep roughly their share
    assert(keptByStratum.getOrElse("long", 0L) == allByStratum.getOrElse("long", 0L))
    for (s <- Seq("short", "medium"); n <- keptByStratum.get(s)) {
      val rate = if (s == "short") 10 else 50
      val share = n.toDouble / allByStratum(s)
      assert(share < rate / 100.0 + 0.25, s"stratum $s kept $share at rate $rate%")
    }
    // the same content-hash bucket drives sample(): a doc kept at rate r is
    // kept by any plain sample with pct >= r, so the draw composes
    val plain = Curation.sample(docs, "text", 50).select("doc_id")
    val keptMedium = kept.filter(col("stratum") === "medium").select("doc_id")
    assert(keptMedium.join(plain, Seq("doc_id"), "left_anti").count() == 0)
  }

  test("mixtureWeights computes the mixing table exactly") {
    import spark.implicits._
    val df = Seq(
      (0L, "a b c d"),       // web
      (4L, "a b c d e f"),   // web
      (1L, "a b")).toDF("doc_id", "text") // books
    val domain = when(col("doc_id") % 4 === 0, "web").otherwise("books")
    val m = Curation.mixtureWeights(df, domain, "text",
      Map("web" -> 0.75, "books" -> 0.25), budgetTokens = 100L)
      .collect().map(r => r.getAs[String]("domain") -> r).toMap
    assert(m("web").getAs[Long]("n_docs") == 2L)
    assert(m("web").getAs[Long]("domain_tokens") == 10L)
    assert(m("web").getAs[Long]("target_tokens") == 75L)
    assert(m("web").getAs[Double]("weight") == 7.5)
    assert(m("web").getAs[Long]("epochs") == 8L)
    assert(m("books").getAs[Long]("domain_tokens") == 2L)
    assert(m("books").getAs[Double]("weight") == 12.5)
    assert(m("books").getAs[Long]("epochs") == 13L)
  }
}
