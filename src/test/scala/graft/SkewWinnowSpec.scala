package graft

import org.apache.spark.sql.functions._

import graft.llmops.Winnowing
import graft.operators.SkewedAgg

class SkewedAggSpec extends SparkSpec {
  test("salted aggregation equals direct groupBy on skewed data") {
    import spark.implicits._
    // 10k rows of one hot key + scattered cold keys
    val df = spark.range(10000).select(
      when(col("id") < 9000, "hot").otherwise(concat(lit("cold"), pmod(col("id"), lit(50)))).as("k"),
      (col("id") % 97).cast("double").as("v"))
    val direct = df.groupBy("k").agg(
      count(lit(1)).as("event_count"),
      sum(col("v").cast("decimal(25,2)")).cast("double").as("total_value"),
      max("v").as("max_value"))
      .orderBy("k").collect().map(_.toSeq).toSeq
    val salted = SkewedAgg(df, Seq(col("k")), 16)(
      ("event_count", count(lit(1)), c => sum(col(c))),
      ("total_value", sum(col("v").cast("decimal(25,2)")), c => sum(col(c)).cast("double")),
      ("max_value", max(col("v")), c => max(col(c))))
      .orderBy("k").collect().map(_.toSeq).toSeq
    assert(salted == direct)
  }
}

class WinnowingSpec extends SparkSpec {
  test("identical docs share all fingerprints; containment is detected; disjoint docs share none") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val contained = s"PREFIX ONE TWO $base SUFFIX THREE"
    val unrelated = "one two three four five six seven eight nine ten eleven twelve thirteen"
    val df = Seq((1L, base), (2L, base), (3L, contained), (4L, unrelated)).toDF("doc_id", "text")
    val pairs = Winnowing.sharedFingerprintPairs(df, "text", "doc_id", 3, 4, 1)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val fpCounts = Winnowing.fingerprints(df, "text", "doc_id", 3, 4)
      .groupBy("doc_id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pairs((1L, 2L)) == fpCounts(1L), "identical docs share every fingerprint")
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) >= 2, "containment must overlap")
    assert(!pairs.contains((1L, 4L)) && !pairs.contains((2L, 4L)), "disjoint docs share nothing")
  }

  test("fingerprint-frequency cap cuts boilerplate-only pairs, never silently") {
    import spark.implicits._
    val boiler = "common header words repeated in every doc alpha beta gamma delta"
    val docs = (1L to 8L).map(i =>
      (i, s"$boiler unique$i tail$i words$i here$i now$i end$i")).toDF("doc_id", "text")
    val uncapped = Winnowing.sharedFingerprintPairs(docs, "text", "doc_id", 3, 4, 1)
    assert(uncapped.count() == 28, "all 8 docs pair through the shared boilerplate prefix")
    val stats = new graft.llmops.Dedup.CapStats(spark)
    val capped = Winnowing.sharedFingerprintPairs(docs, "text", "doc_id", 3, 4, 1,
      maxDocsPerFingerprint = 4, capStats = stats)
    assert(capped.count() < 28, "boilerplate fingerprints must stop pairing")
    assert(stats.droppedBuckets > 0 && stats.droppedRows >= 8 * stats.droppedBuckets,
      s"drops must be visible: ${stats.droppedBuckets} buckets / ${stats.droppedRows} rows")
  }

  test("identical-text collapse equals the direct inverted-index path, pair for pair") {
    import spark.implicits._
    // clone-heavy corpus (the sf10 replication regime that killed the direct
    // path): testdata docs cloned 3x under offset ids, plus blanks
    val docs = graft.core.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).limit(120)
    val clones = (1 to 2).map(i => docs.select((col("doc_id") + i * 1000000L).as("doc_id"), col("text")))
      .foldLeft(docs)(_ unionByName _)
      .unionByName(Seq((9000001L, ""), (9000002L, "   ")).toDF("doc_id", "text"))
    def run(collapse: Boolean) =
      Winnowing.sharedFingerprintPairs(clones, "text", "doc_id", 3, 4, minShared = 2,
        collapseIdentical = collapse)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val (direct, collapsed) = (run(false), run(true))
    assert(collapsed == direct,
      s"collapse path must be pair-for-pair identical: ${collapsed.size} vs ${direct.size} pairs")
    assert(direct.nonEmpty, "fixture must produce pairs (clones share everything)")
  }

  test("cap-on counts are path-dependent by contract: intra-clone pairs ignore the cap") {
    import spark.implicits._
    // two clone groups of 3 sharing a boilerplate prefix, cap 4: the shared
    // boilerplate fingerprints sit in 6 docs (> cap) but at most 2 REPS
    val boiler = "common header words repeated in every doc alpha beta gamma delta epsilon"
    val textA = s"$boiler uniqueA tailA wordsA hereA nowA endA"
    val textB = s"$boiler uniqueB tailB wordsB hereB nowB endB"
    val docs = ((1L to 3L).map(i => (i, textA)) ++ (4L to 6L).map(i => (i, textB)))
      .toDF("doc_id", "text")
    val fpPerDocA = Winnowing.fingerprints(docs.filter(col("doc_id") === 1L),
      "text", "doc_id", 3, 4).count()
    def intraA(collapse: Boolean, stats: graft.llmops.Dedup.CapStats) =
      Winnowing.sharedFingerprintPairs(docs, "text", "doc_id", 3, 4,
        minShared = 1, maxDocsPerFingerprint = 4, capStats = stats,
        collapseIdentical = collapse)
        .filter(col("id_a") === 1L && col("id_b") === 2L)
        .collect().map(_.getLong(2)).headOption

    // collapse path: the cap counts REPS per fingerprint (≤ 2 here — nothing
    // capped in the rep index), and intra-clone pairs report the FULL |set|
    val cStats = new graft.llmops.Dedup.CapStats(spark)
    assert(intraA(collapse = true, cStats).contains(fpPerDocA),
      s"intra-clone counts must be the full |set| ($fpPerDocA) under the cap")

    // direct path: the cap counts DOCS per fingerprint — the 6-doc
    // boilerplate postings drop, so the SAME pair reports a smaller count
    val dStats = new graft.llmops.Dedup.CapStats(spark)
    val d = intraA(collapse = false, dStats)
    assert(d.isDefined && d.get > 0 && d.get < fpPerDocA && dStats.droppedBuckets > 0,
      s"direct cap-on must subtract the dropped boilerplate postings, visibly (got $d of $fpPerDocA)")
  }

  test("null, empty, and whitespace-only docs emit no fingerprints in either path") {
    import spark.implicits._
    val df = Seq((1L, Option.empty[String]), (2L, Some("")), (3L, Some("   \t ")),
      (4L, Some("real words appear here now")), (5L, Some("\n\r\n")), (6L, Some("\u000B\u000C")),
      (7L, Some("\u0001\u0001"))) // ctrl chars are NOT \\s: a token in BOTH paths
      .toDF("doc_id", "text")
    val udfIds = Winnowing.fingerprints(df, "text", "doc_id", 3, 4)
      .select("doc_id").distinct().as[Long].collect().toSet
    val hofIds = Winnowing.fingerprintsHof(df, "text", "doc_id", 3, 4)
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(udfIds == Set(4L, 7L) && hofIds == Set(4L, 7L),
      s"whitespace-only docs must not fingerprint, ctrl-char docs must, identically (udf=$udfIds hof=$hofIds)")
    val pairs = Winnowing.sharedFingerprintPairs(df.filter(col("doc_id") =!= 7L), "text", "doc_id", 3, 4, 1)
    assert(pairs.count() == 0, "blank docs must not pair with each other")
  }

  test("UDF fingerprints equal the declarative HOF oracle on testdata") {
    val docs = graft.core.Tables(spark, sfDir, "documents").limit(200)
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val udfFp = asSet(Winnowing.fingerprints(docs, "text", "doc_id", 3, 4))
    val hofFp = asSet(Winnowing.fingerprintsHof(docs, "text", "doc_id", 3, 4))
    assert(udfFp == hofFp, s"paths differ: ${(udfFp -- hofFp).take(3)} / ${(hofFp -- udfFp).take(3)}")
    assert(udfFp.nonEmpty)
  }
}
