package graft

import org.apache.spark.sql.functions._

/** Round-2 scale-stress main (companion to the generator-driven stress in
  * BASELINE.md): exercises the two new scale paths at volumes where the naive
  * plans stop working, on generated data (no testdata dependency).
  *
  *   1. Bucketed interval join under extreme key skew: N events across only 5
  *      business keys joined to per-key windows. The plain 5-key equi-join
  *      puts everything through ≤5 reducers; the composite (key, time-bucket)
  *      key spreads it across buckets.
  *   2. Hyperplane-LSH embedding near-dup on a corpus where the exact O(N²)
  *      plan would score billions of pairs.
  *
  * Run: SPARK_GRAFT_CPUS=32 sbt "runMain graft.Stress"
  */
object Stress {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = core.Sessions.localCpus(cpus) // the shared factory (r16)
    import spark.implicits._

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stress] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // 1. skewed interval join: 4M claims over 5 cities spanning 60 days,
    //    joined to 6h-window aggregates (claims within window_time-6h..window_time)
    val nClaims = 4000000L
    val cities = array((0 until 5).map(i => lit(s"city_$i")): _*)
    val claims = spark.range(nClaims)
      .select(col("id").as("claim_id"),
        element_at(cities, (pmod(col("id"), lit(5)) + 1).cast("int")).as("claim_city"),
        timestamp_seconds(lit(1700000000L) + pmod(col("id") * 2654435761L, lit(86400L * 60))).as("claim_ts"),
        (pmod(col("id") * 40503L, lit(100000)).cast("double") / 100.0).as("claim_amount"))
    val windows = operators.Tumble(claims, "claim_ts", "6 hours", col("claim_city"))(
      "total_amount" -> functions.Scalars.sumMoney(col("claim_amount")))
      .select(col("claim_city").as("city"), col("window_time"), col("total_amount"))
    val joined = operators.IntervalJoin(claims, windows, "claim_city", "city",
      "claim_ts", "window_time", "'-6' HOUR", "'0' HOUR")
    val joinRows = timed(s"bucketed interval join, $nClaims claims x 5 keys")(joined.count())
    println(s"[stress] interval-join output rows: $joinRows")

    // 2. hyperplane LSH near-dup: 100k 64-dim embeddings, 1% planted near-dups
    //    (exact all-pairs would be 5e9 cosine evaluations)
    val nVecs = 100000L
    val dim = 64
    val base = spark.range(nVecs).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(dim)),
        j => ((pmod(xxhash64(col("id"), j), lit(2000)).cast("double") - 1000.0) / 1000.0).cast("float")).as("embedding"))
    // planted near-dups: ids ending in 99 copy the vector of id-1 (cosine ~1)
    val planted = base.withColumn("embedding",
      when(pmod(col("vec_id"), lit(100)) === 99,
        transform(sequence(lit(1), lit(dim)),
          j => ((pmod(xxhash64(col("vec_id") - 1, j), lit(2000)).cast("double") - 1000.0) / 1000.0).cast("float")))
        .otherwise(col("embedding")))
    val dups = timed(s"hyperplane-LSH near-dup, $nVecs x $dim-dim")(
      llmops.Dedup.embeddingNearDupLsh(planted, "embedding", "vec_id", threshold = 0.95)
        .count())
    val expected = nVecs / 100
    println(s"[stress] near-dup pairs found: $dups (planted $expected)")
    require(dups >= (expected * 9) / 10, s"LSH must recover >=90% of planted dups, got $dups/$expected")

    // 3. distributed token packing: 5M docs through the two-pass prefix sum,
    //    scattered across 64 partitions (the round-1 plan moved everything
    //    through ONE task's global window)
    val nDocs = 5000000L
    val docs = spark.range(nDocs).select(col("id").as("doc_id"),
      trim(expr("repeat('tok ', CAST(pmod(id, 7) + 1 AS INT))")).as("text"))
      .repartition(64)
    val packed = timed(s"distributed token packing, $nDocs docs")(
      llmops.Curation.packByTokenBudget(docs, "text", "doc_id", budget = 4096)
        .agg(max("cum_tokens"), sum("n_tokens"), max("pack_id")).head())
    val (cumMax, tokSum, lastPack) = (packed.getLong(0), packed.getLong(1), packed.getLong(2))
    val independentTotal = spark.range(nDocs).select(sum(pmod(col("id"), lit(7)) + 1)).head().getLong(0)
    println(s"[stress] packed $nDocs docs into ${lastPack + 1} packs, $cumMax tokens")
    require(cumMax == tokSum && cumMax == independentTotal,
      s"global prefix sum must be exact: cum=$cumMax sum=$tokSum expected=$independentTotal")

    // 4. benchmark decontamination at corpus scale: 2M docs probed against a
    //    20k-doc benchmark set, 2% planted verbatim copies. The corpus scan is
    //    shuffle-free (plan-guarded at small scale); this is the volume check.
    val nCorpus = 2000000L
    val nBench = 20000L
    def tokensFor(prefix: String, idCol: org.apache.spark.sql.Column) =
      concat_ws(" ", transform(sequence(lit(0), lit(9)),
        k => concat(lit(prefix), idCol, lit("_"), k)))
    val benchDocs = spark.range(nBench)
      .select(col("id").as("doc_id"), tokensFor("b", col("id")).as("text"))
    val corpusDocs = spark.range(nCorpus)
      .select(col("id").as("doc_id"),
        when(pmod(col("id"), lit(50)) === 0, tokensFor("b", pmod(col("id"), lit(nBench))))
          .otherwise(tokensFor("c", col("id"))).as("text"))
    val decon = timed(s"decontamination, $nCorpus docs vs $nBench bench docs")(
      llmops.Dedup.decontaminate(corpusDocs, benchDocs, "text", "doc_id",
          shingleSize = 3, threshold = 0.5)
        .agg(sum(when(col("contaminated"), 1L).otherwise(0L)),
          sum(when(col("contaminated") && col("overlap") < 1.0, 1L).otherwise(0L))).head())
    val (flagged, partial) = (decon.getLong(0), decon.getLong(1))
    println(s"[stress] contaminated flagged: $flagged (planted ${nCorpus / 50}), non-exact: $partial")
    require(flagged == nCorpus / 50 && partial == 0,
      s"exactly the planted copies must be flagged: $flagged / ${nCorpus / 50}, partial $partial")

    // 5. C4-style span dedup at corpus scale: 2M docs of 40 tokens (two
    //    20-token chunks); every 4th doc leads with a shared boilerplate
    //    chunk. The hot set is ONE chunk + each doc's unique tail — the
    //    broadcast path must rewrite 2M docs with zero corpus shuffle.
    val nLine = 2000000L
    def chunk(prefix: String, idc: org.apache.spark.sql.Column) =
      concat_ws(" ", transform(sequence(lit(0), lit(19)), k => concat(lit(prefix), idc, lit("_"), k)))
    val lineDocs = spark.range(nLine).select(col("id").as("doc_id"),
      concat_ws(" ",
        when(pmod(col("id"), lit(4)) === 0, chunk("boiler", lit(0))).otherwise(chunk("u", col("id"))),
        chunk("tail", col("id"))).as("text"))
    val deduped = timed(s"C4 span dedup, $nLine docs (broadcast hot set)")(
      llmops.Dedup.lineDedup(lineDocs, "text", "doc_id", chunkWords = 20)
        .agg(sum(when(pmod(col("doc_id"), lit(4)) === 0 && !col("text").startsWith("boiler"),
          1L).otherwise(0L))).head().getLong(0))
    // every boilerplate doc except the winner lost its first chunk
    val expectLosers = nLine / 4 - 1
    println(s"[stress] docs that lost their boilerplate chunk: $deduped (expected $expectLosers)")
    require(deduped == expectLosers, s"span dedup must strip exactly the non-winners: $deduped vs $expectLosers")

    // 6. dense contiguous ids at 50M rows through the two-pass prefix sum
    //    (the row_number() window formulation funnels all 50M through one
    //    task). Exactness: ids are a permutation of 0..N-1 AND follow the
    //    order key (spot-checked via an order-vs-id inversion count of 0).
    val nIds = 50000000L
    val idsIn = spark.range(nIds).select(
      pmod(col("id") * 2654435761L, lit(nIds)).as("sort_key"), col("id").as("orig"))
      .repartition(64)
    val ids = operators.Ids.contiguousRowIds(idsIn, Seq("sort_key", "orig"), numPartitions = 64)
    val idStats = timed(s"contiguous ids, $nIds rows")(
      ids.agg(count(lit(1)), min("row_id"), max("row_id"), countDistinct("row_id"),
        sum(when(col("row_id") === col("sort_key"), 1L).otherwise(0L))).head())
    println(s"[stress] ids: n=${idStats.getLong(0)} min=${idStats.getLong(1)} " +
      s"max=${idStats.getLong(2)} distinct=${idStats.getLong(3)} fixpoints=${idStats.getLong(4)}")
    require(idStats.getLong(0) == nIds && idStats.getLong(1) == 0 &&
      idStats.getLong(2) == nIds - 1 && idStats.getLong(3) == nIds,
      "row ids must be a dense permutation of 0..N-1")
    // sort_key is itself a permutation of 0..N-1 (2654435761 is odd, gcd=1),
    // and orig is a unique tiebreak — so row_id must EQUAL sort_key everywhere
    require(idStats.getLong(4) == nIds,
      s"row ids must follow the total order exactly: ${idStats.getLong(4)} of $nIds matched")

    // 7. keyed snapshot diff at 10M x 10M: one full-outer sort-merge join;
    //    planted deltas must come back exactly.
    val nDiff = 10000000L
    val oldSnap = spark.range(nDiff).select(col("id").as("k"),
      pmod(col("id") * 31L, lit(1000)).as("v"))
    val newSnap = spark.range(nDiff).filter(pmod(col("id"), lit(101)) =!= 0) // removals
      .select(col("id").as("k"),
        when(pmod(col("id"), lit(97)) === 0, pmod(col("id") * 31L, lit(1000)) + 1)
          .otherwise(pmod(col("id") * 31L, lit(1000))).as("v")) // changes
      .unionByName(spark.range(nDiff, nDiff + 1000).select(col("id").as("k"), lit(0L).as("v")))
    val diffCounts = timed(s"snapshot diff, $nDiff x $nDiff rows")(
      operators.SnapshotDiff.diff(oldSnap, newSnap, Seq("k"), Seq("v"))
        .groupBy("status").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
    val expRemoved = (nDiff + 100) / 101
    val expChanged = spark.range(nDiff)
      .filter(pmod(col("id"), lit(97)) === 0 && pmod(col("id"), lit(101)) =!= 0).count()
    println(s"[stress] diff: $diffCounts (expect removed=$expRemoved changed=$expChanged added=1000)")
    require(diffCounts("removed") == expRemoved && diffCounts("added") == 1000L &&
      diffCounts("changed") == expChanged, s"diff counts off: $diffCounts")

    spark.stop()
  }
}
