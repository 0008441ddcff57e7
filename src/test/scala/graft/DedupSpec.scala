package graft

import org.apache.spark.sql.functions._

import graft.llmops.{Dedup, Multimodal}

class DedupSpec extends SparkSpec {

  test("prefix-filtered jaccard join equals the full-index operator at every threshold") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta", "iota", "kappa")
    val base = (1 to 120).map(i => (i.toLong, (1 to 20).map(_ => words(rnd.nextInt(words.size))).mkString(" ")))
    // plant near-dups: clones with small edits, plus exact dups
    val planted = base.take(15).map { case (id, t) =>
      (id + 1000, t.split(" ").updated(3, "edited").mkString(" "))
    } ++ base.slice(15, 20).map { case (id, t) => (id + 2000, t) }
    val docs = (base ++ planted).toDF("doc_id", "text")
    for (t <- Seq(0.2, 0.5, 0.8, 1.0)) {
      val fast = graft.llmops.Dedup.jaccardJoinPrefix(docs, "text", "doc_id", 3, t)
        .as[(Long, Long, Double)].collect().sortBy(p => (p._1, p._2)).toSeq
      val full = graft.llmops.Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, t)
        .as[(Long, Long, Double)].collect().sortBy(p => (p._1, p._2)).toSeq
      assert(fast == full, s"diverged at threshold $t")
      if (t == 1.0) assert(fast.size >= 5, "exact clones must survive threshold 1.0")
    }
  }

  test("exact dedup collapses identical texts to min id") {
    import spark.implicits._
    val df = Seq((1L, "aaa"), (2L, "bbb"), (3L, "aaa")).toDF("doc_id", "text")
    val out = Dedup.exact(df, "text", "doc_id").orderBy("doc_id").collect()
    assert(out.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("dup_count"))).toSeq ==
      Seq((1L, 2L), (2L, 1L)))
  }

  test("minhash LSH finds every exact-Jaccard pair above a safe threshold (recall on testdata)") {
    val docs = graft.core.Tables(spark, sfDir, "documents")
    // exact ground truth at tau=0.5 (high enough that 16x4-band LSH recall ~1)
    val exact = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minHashLsh(docs, "text", "doc_id", 3, 16, 4, 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "testdata should contain planted near-dups")
    // LSH verifies candidates with exact jaccard → can only miss, never add
    assert(lsh.subsetOf(exact))
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall $recall below 0.9 (missed ${exact -- lsh})")
  }

  test("simhash: identical docs have hamming 0, near-dups small distance") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today"),
      (3L, "completely different words about spark catalyst tungsten codegen shuffles")).toDF("doc_id", "text")
    val pairs = Dedup.simHashPairs(df, "text", "doc_id", maxHamming = 3).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1), r.getAs[Number]("hamming").longValue())).toSeq ==
      Seq((1L, 2L, 0L)))
  }

  test("embeddingNearDup finds identical vectors") {
    import spark.implicits._
    val df = Seq((1L, Array(1f, 0f, 0f)), (2L, Array(1f, 0f, 0f)), (3L, Array(0f, 1f, 0f)))
      .toDF("vec_id", "embedding")
    val out = Dedup.embeddingNearDup(df, "embedding", "vec_id", 0.99).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
  }

  test("row-local minhash/simhash signatures equal the aggregation oracles bit-for-bit") {
    import spark.implicits._
    // whitespace-edged docs bite: Spark/DuckDB trim strips ONLY spaces, so a
    // trailing \n or \t survives and split emits an edge EMPTY token — the
    // imperative tokens must reproduce that, not Java-trim it away
    val edges = Seq((900001L, "x y z\n"), (900002L, "\tx y z"), (900003L, "x y z "),
      (900004L, " \t "), (900005L, "")).toDF("doc_id", "text")
    val docs = graft.core.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).union(edges)
    val fast = Dedup.minHashSignatures(docs, "text", "doc_id", 3, 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val agg = Dedup.minHashSignaturesAgg(docs, "text", "doc_id", 3, 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(fast.nonEmpty && fast == agg, "minhash UDF must reproduce xxhash64 chain exactly")

    val fastSim = Dedup.simHashSignatures(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val aggSim = Dedup.simHashSignaturesAgg(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fastSim == aggSim, "simhash UDF must reproduce xxhash64 exactly")
  }

  test("ngramJaccardPairs: whitespace-edged twins pair exactly; hot-shingle cap is loud") {
    import spark.implicits._
    // docs 3..10 share the boilerplate RUN but are pairwise DISTINCT (unique
    // tails): the raw-text probe keeps the DIRECT path (no clones), and the
    // boiler shingles' df counts real docs — the cap's unit on this path
    val boiler = (1 to 10).map(i => s"w$i").mkString(" ")
    val docs = (Seq((1L, "alpha beta gamma delta\n"), (2L, "\talpha beta gamma delta"))
      ++ (3L to 10L).map(i => (i, s"$boiler end$i"))).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // docs 1 and 2 differ only in edge whitespace: trim strips spaces only,
    // so each has ONE edge empty token ("\n" left, "\t" right) at opposite
    // ends -> shingle sets differ at the edges but share the interior;
    // docs 3..10 share 8 of their 9 shingles: jaccard 8/(9+9-8) = 0.8
    assert(pairs((3L, 4L)) == 0.8 && pairs.size >= 28, s"got ${pairs.size}: $pairs")
    val stats = new Dedup.CapStats(spark)
    val capped = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 0.5,
      maxDocsPerShingle = 4, capStats = stats)
    assert(capped.count() < pairs.size, "hot shingles must stop pairing under the cap")
    assert(stats.droppedBuckets > 0 && stats.droppedRows > 0,
      s"drops must be visible: ${stats.droppedBuckets}/${stats.droppedRows}")
  }

  test("ngramJaccardPairs collapse path (clone-heavy gate) equals the quadratic oracle") {
    import spark.implicits._
    // 8 byte-identical clones fire the adaptive probe -> set-identical
    // collapse path; output must equal the row-local all-pairs oracle exactly
    val boiler = (1 to 10).map(i => s"w$i").mkString(" ")
    val docs = (Seq((1L, "alpha beta gamma delta\n"), (2L, "\talpha beta gamma delta"))
      ++ (3L to 10L).map(i => (i, boiler))).toDF("doc_id", "text")
    val got = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val expected = docs.as("x").join(docs.as("y"), col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        Dedup.jaccardShingles(col("x.text"), col("y.text"), 3).as("j"))
      .filter(col("j") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got == expected, s"collapse=$got oracle=$expected")
    // cap unit on the collapse path is REP entries (documented divergence):
    // the clone group is one rep here, so a cap of 4 never binds
    val stats = new Dedup.CapStats(spark)
    val capped = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 0.5,
      maxDocsPerShingle = 4, capStats = stats)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(capped == expected && stats.droppedBuckets == 0,
      s"rep-unit cap must not bind on a collapsed clone group: $capped")
  }

  test("hyperplane-LSH near-dup: recall >= 0.9 vs the exact oracle, precision 1") {
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // testdata near-dups live around cosine 0.35-0.5 → short bands, many of
    // them: p = 1 - acos(0.35)/π ≈ 0.614, recall ≈ 1-(1-p^4)^32 ≈ 0.99
    val exact = Dedup.embeddingNearDup(embs, "embedding", "vec_id", 0.35)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.embeddingNearDupLsh(embs, "embedding", "vec_id", 0.35,
      bitsPerBand = 4, numBands = 32)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "testdata should contain planted near-dup embeddings")
    assert(lsh.subsetOf(exact), "exact-cosine verification means LSH can miss but never add")
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall $recall below 0.9 (${exact.size} exact, ${lsh.size} found)")
  }

  test("hot-bucket cap bounds candidates on a boilerplate-heavy corpus") {
    import spark.implicits._
    // 40 docs sharing one boilerplate text → every band bucket has size 40;
    // cap 10 drops them all, so NO pairs materialise (graceful, bounded)
    val boiler = (1L to 40L).map(i => (i, "common header common header common header legal notice"))
    // identical pair → every band bucket matches (deterministic candidate)
    val distinctive = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta"),
      (101L, "alpha beta gamma delta epsilon zeta eta theta"))
    val df = (boiler ++ distinctive).toDF("doc_id", "text")
    val capped = Dedup.minHashLsh(df, "text", "doc_id", 3, 16, 4, 0.2, maxBucketSize = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the boilerplate cluster (40·39/2 = 780 pairs) is suppressed…
    assert(capped.forall { case (a, b) => a >= 100L && b >= 100L },
      s"capped run must not emit boilerplate pairs, got $capped")
    // …while the small near-dup pair in its own bucket survives
    assert(capped.contains((100L, 101L)))
    // uncapped control: the hot bucket floods the candidate set
    val uncapped = Dedup.minHashLsh(df, "text", "doc_id", 3, 16, 4, 0.2)
    assert(uncapped.count() > 700)
  }

  test("capped buckets are never silent: exact drop counts via CapStats (VERDICT r2 #6)") {
    import spark.implicits._
    // same corpus shape as above: 40 boilerplate docs collapse into one
    // signature → all 4 band buckets have size 40 > cap 10 and are dropped
    val boiler = (1L to 40L).map(i => (i, "common header common header common header legal notice"))
    val distinctive = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta"),
      (101L, "alpha beta gamma delta epsilon zeta eta theta"))
    val df = (boiler ++ distinctive).toDF("doc_id", "text")

    val st = new Dedup.CapStats(spark)
    val pairs = Dedup.minHashLsh(df, "text", "doc_id", 3, 16, 4, 0.2,
      maxBucketSize = 10, capStats = st)
    pairs.collect() // stats ride the query's own execution
    // set-identical collapse (round 6): the 40 clones are ONE signature
    // group of 40 > cap 10, dropped at the group level before banding —
    // one reported bucket carrying its 40 member rows (previously the same
    // drop surfaced as 4 band buckets x 40 docs)
    assert(st.droppedBuckets == 1L,
      s"the over-cap boilerplate group must be reported dropped, got ${st.droppedBuckets}")
    assert(st.droppedRows == 40L,
      s"dropped row count must be exact, got ${st.droppedRows}")

    // a corpus with no hot buckets reports zero drops
    val st2 = new Dedup.CapStats(spark)
    Dedup.minHashLsh(distinctive.toDF("doc_id", "text"), "text", "doc_id", 3, 16, 4, 0.2,
      maxBucketSize = 10, capStats = st2).collect()
    assert(st2.droppedBuckets == 0L && st2.droppedRows == 0L)

    // the embedding LSH collapses signature-identical vectors to a
    // representative BEFORE banding (round 6). maxBucketSize bounds BOTH
    // quadratic sources: a 30-clone group under a cap of 5 is dropped from
    // pair generation entirely AND reported (the old per-bucket contract —
    // a group of g members is O(g²) intra pairs, so it must not expand)...
    val st3 = new Dedup.CapStats(spark)
    val embs = (1L to 30L).map(i => (i, Array(1f, 0f, 0f, 0f)))
    val lshPairs = Dedup.embeddingNearDupLsh(embs.toDF("doc_id", "embedding"), "embedding", "doc_id",
      threshold = 0.9, bitsPerBand = 4, numBands = 2, maxBucketSize = 5,
      capStats = st3)
    assert(lshPairs.count() == 0L, "an over-cap clone group must not expand")
    assert(st3.droppedBuckets == 1L && st3.droppedRows == 30L,
      s"the dropped group must be reported, got ${st3.droppedBuckets}/${st3.droppedRows}")
    // ...while a group WITHIN the cap resolves fully — the pre-collapse
    // form dropped these wholesale once bucket occupancy crossed the cap
    val st3b = new Dedup.CapStats(spark)
    val lshPairsOk = Dedup.embeddingNearDupLsh(embs.toDF("doc_id", "embedding"), "embedding", "doc_id",
      threshold = 0.9, bitsPerBand = 4, numBands = 2, maxBucketSize = 100,
      capStats = st3b)
    assert(lshPairsOk.count() == 435L, "an in-cap clone group must find all 30*29/2 pairs")
    assert(st3b.droppedBuckets == 0L && st3b.droppedRows == 0L)

    // rep-LEVEL caps still fire and still report: many DISTINCT signatures
    // sharing a band bucket (2-band signatures are distinct, each single
    // band has only 2^4 = 16 bucket values for ~120 reps)
    val rnd = new scala.util.Random(7)
    val spread = (1L to 120L).map(i => (i, Array.fill(8)(rnd.nextGaussian().toFloat)))
    val st4 = new Dedup.CapStats(spark)
    Dedup.embeddingNearDupLsh(spread.toDF("doc_id", "embedding"), "embedding", "doc_id",
      threshold = 0.99, bitsPerBand = 4, numBands = 2, maxBucketSize = 3,
      capStats = st4).collect()
    assert(st4.droppedBuckets > 0L && st4.droppedRows > 0L,
      "distinct-signature hot buckets must be capped AND reported")
    val st5 = new Dedup.CapStats(spark)
    Dedup.embeddingNearDupLsh(spread.toDF("doc_id", "embedding"), "embedding", "doc_id",
      threshold = 0.99, bitsPerBand = 4, numBands = 2, maxBucketSize = 10000,
      capStats = st5).collect()
    assert(st5.droppedBuckets == 0L && st5.droppedRows == 0L)
  }
}

class MultimodalSpec extends SparkSpec {
  test("minhash verification never pairs null-text docs (null jaccard drops out)") {
    import spark.implicits._
    val df = Seq((1L, Option.empty[String]), (2L, Option.empty[String]),
      (3L, Option("real words here again and again today")),
      (4L, Option("real words here again and again today"))).toDF("doc_id", "text")
    val pairs = Dedup.minHashLsh(df, "text", "doc_id", threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((3L, 4L)), s"only the real duplicate pair may verify: $pairs")
  }

  test("resolveKeepers: chains collapse to the min, singletons keep themselves, LSH only widens") {
    import spark.implicits._
    val ids = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b") // chain; 4 is a singleton
    val out = Dedup.resolveKeepers(ids, "doc_id", pairs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out == Map(1L -> (1L, true), 2L -> (1L, false), 3L -> (1L, false), 4L -> (4L, true)))

    // recall-degraded pairs can only split components -> keep a SUPERSET
    val emb = graft.core.Tables(spark, sfDir, "embeddings")
      .filter(col("vec_id") < 300).select(col("vec_id"), col("embedding"))
    val exact = Dedup.embeddingNearDup(emb, "embedding", "vec_id", 0.35).select("id_a", "id_b")
    val lsh = Dedup.embeddingNearDupLsh(emb, "embedding", "vec_id", 0.35).select("id_a", "id_b")
    def keepSet(p: org.apache.spark.sql.DataFrame) = Dedup.resolveKeepers(emb, "vec_id", p)
      .filter(col("keep")).collect().map(_.getLong(0)).toSet
    val (ke, kl) = (keepSet(exact), keepSet(lsh))
    assert(ke.subsetOf(kl), s"exact keepers must survive under LSH pairs: ${ke -- kl}")
  }

  test("clusters: alternating-star converges on a 2000-link chain within the default round cap") {
    import spark.implicits._
    // diameter-2000 path graph — min-label propagation needs ~2000 rounds and
    // would hit the cap; the star algorithm is O(log² n) rounds regardless of
    // diameter. Shuffled edge order so convergence can't ride on input order.
    val links = scala.util.Random.shuffle((0L until 2000L).map(i => (i, i + 1)).toList)
    val chain = links.toDF("id_a", "id_b")
    val out = Dedup.clusters(chain).collect()
    assert(out.length == 2001)
    assert(out.forall(_.getLong(1) == 0L), "every chain node must label to the min id 0")
  }

  test("clusters ≡ local union-find on random graphs (components exact, label = component min)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 400
      val edges = (1 to 300).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // independent oracle: classic union-find over the same edges
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) => parent(find(a.toInt)) = find(b.toInt) }
      val want = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(id => id -> edges.flatMap(e => Seq(e._1, e._2)).distinct
          .filter(o => find(o.toInt) == find(id.toInt)).min).toMap
      val got = Dedup.clusters(edges.toDF("id_a", "id_b")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"trial $trial: star labels diverge from union-find")
    }
  }

  test("lineDedup keeps only the globally-first occurrence of a duplicated chunk") {
    import spark.implicits._
    val boiler = (1 to 20).map(i => s"b$i").mkString(" ") // exactly one 20-word chunk
    val u1 = (1 to 20).map(i => s"u$i").mkString(" ")
    val u2 = (1 to 20).map(i => s"v$i").mkString(" ")
    val df = Seq(
      (1L, s"$boiler $u1"), // winner occurrence of boiler
      (2L, s"$u2 $boiler"), // loses: later doc
      (3L, boiler), // gutted entirely -> empty text
      (4L, s"$u1 $u1")) // within-doc repeat: second copy dropped
      .toDF("doc_id", "text")
    val out = Dedup.lineDedup(df, "text", "doc_id", chunkWords = 20)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    // u1 is duplicated corpus-wide too (docs 1 and 4): doc 1 position 1 wins
    assert(out == Seq((1L, s"$boiler $u1"), (2L, u2), (3L, ""), (4L, "")))
  }

  test("lineDedup fails loudly on an id that does not cast to BIGINT") {
    import spark.implicits._
    val df = Seq(("doc-a", "some words here"), ("doc-b", "other words there"))
      .toDF("doc_id", "text")
    val ex = intercept[Exception] { Dedup.lineDedup(df, "text", "doc_id").count() }
    def mentions(t: Throwable): Boolean =
      t != null && (t.toString.contains("castable to BIGINT") || mentions(t.getCause))
    assert(mentions(ex), s"expected the lineDedup id guard, got: $ex")
  }

  test("lineDedup broadcast and join paths are output-identical (and non-vacuous)") {
    val docs = graft.core.Tables(spark, sfDir, "documents")
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val bcast = asSet(Dedup.lineDedup(docs, "text", "doc_id"))
    val join = asSet(Dedup.lineDedup(docs, "text", "doc_id", forceJoin = true))
    assert(bcast == join)
    val original = docs.select(col("doc_id"),
      concat_ws(" ", graft.functions.Text.tokens(col("text"))).as("text"))
    assert(bcast != asSet(original), "testdata must contain duplicated chunks for this spec to bite")
  }

  test("image feature extraction preserves schema contract and determinism") {
    val docs = graft.core.Tables(spark, sfDir, "documents").limit(20)
    val media = Multimodal.syntheticMedia(docs, "doc_id", "text")
    assert(media.schema.fieldNames.toSeq == Seq("media_id", "media_type", "content", "meta"))
    val out = Multimodal.extractImageFeatures(media, "content")
    val rows = out.select("media_id", "media_type", "width", "height")
      .orderBy("media_id").collect()
    assert(rows.length == 20)
    // real codec: PNG rows decode to real dims; audio/video payloads are not
    // images and land in the dead-letter NULL state, never fabricated dims
    assert(rows.filter(_.getString(1) == "image")
      .forall(r => r.getInt(2) >= 16 && r.getInt(3) >= 16))
    assert(rows.filter(_.getString(1) != "image").forall(_.isNullAt(2)))
    // deterministic: run twice, same output
    val rows2 = Multimodal.extractImageFeatures(media, "content")
      .select("media_id", "media_type", "width", "height").orderBy("media_id").collect()
    assert(rows.map(_.toSeq).toSeq == rows2.map(_.toSeq).toSeq)
  }

  test("resize bounds the box and replaces the payload; audio and frame-sample plumb through") {
    // deterministic slice (limit() without order may pick different rows per action)
    val docs = graft.core.Tables(spark, sfDir, "documents").filter(col("doc_id") < 30)
    val media = Multimodal.syntheticMedia(docs, "doc_id", "text")

    val imgMedia = media.filter(col("media_type") === "image")
    val resized = Multimodal.resizeImages(imgMedia, "content", 512, 512)
    val rs = resized.select("media_id", "width", "height", "content").collect()
    assert(rs.nonEmpty)
    assert(rs.forall(r => r.getInt(1) <= 512 && r.getInt(2) <= 512 &&
      r.getInt(1) >= 1 && r.getInt(2) >= 1))
    // payload replaced, never enlarged (the thumbnail contract)
    val origSizes = imgMedia.select("media_id", "content").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).length).toMap
    assert(rs.forall(r => r.getAs[Array[Byte]](3).length <= origSizes(r.getLong(0))))
    // aspect-ratio preserved within integer truncation
    val dims = Multimodal.extractImageFeatures(imgMedia, "content")
      .select("media_id", "width", "height").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    rs.foreach { r =>
      val (w0, h0) = dims(r.getLong(0))
      val scale = math.min(1.0, math.min(512.0 / w0, 512.0 / h0))
      assert(r.getInt(1) == math.max(1, (w0 * scale).toInt) &&
        r.getInt(2) == math.max(1, (h0 * scale).toInt))
    }

    val audio = Multimodal.extractAudioFeatures(media.filter(col("media_type") === "audio"), "content")
    assert(audio.select("duration_ms").collect().forall(r => r.getLong(0) >= 0))
    assert(audio.count() == media.filter(col("media_type") === "audio").count())

    val frames = Multimodal.sampleVideoFrames(
      media.filter(col("media_type") === "video"), "content", everyNthFrame = 10)
    assert(frames.schema.fieldNames.toSeq ==
      Seq("media_id", "media_type", "meta", "frame_idx", "frame"),
      "video payload column must NOT survive into the frame rows")
    // real codec (r10): every Nth stored frame of the MJPEG-AVI — expected
    // counts computable from the id alone (aviFrameCount)
    val videoIds = media.filter(col("media_type") === "video")
      .select("media_id").collect().map(_.getLong(0))
    val expected = videoIds.map(id =>
      (Multimodal.SyntheticPayloads.aviFrameCount(id) + 9) / 10).sum.toLong
    assert(frames.count() == expected,
      s"every-10th sampling over real AVI containers: expected $expected frame rows")
    assert(frames.filter(col("frame").isNull).count() == 0,
      "generated AVIs must all decode — no dead-letter rows here")
  }

  test("NULL media stays NULL-marked through every operator (dead-letter signal preserved)") {
    import spark.implicits._
    // FakeCodec here on purpose: it "decodes" any bytes, so the spec isolates
    // the NULL-content marker from the undecodable-bytes dead-letter (which
    // has its own spec in MediaCodecSpec)
    val withNull = Seq(
      (1L, Option("payload".getBytes("UTF-8"))),
      (2L, Option.empty[Array[Byte]])).toDF("media_id", "content")
    val feat = Multimodal.extractImageFeatures(withNull, "content", Multimodal.FakeCodec)
      .orderBy("media_id").collect()
    assert(!feat(0).isNullAt(2) && feat(1).isNullAt(2) && feat(1).isNullAt(4),
      "null content must yield null dims/features, never fabricated ones")
    val rs = Multimodal.resizeImages(withNull, "content", 100, 100, Multimodal.FakeCodec)
      .orderBy("media_id").collect()
    assert(rs(1).isNullAt(1) && rs(1).isNullAt(2),
      "null content must survive resize as null (the IS NULL filter still works)")
    val au = Multimodal.extractAudioFeatures(withNull, "content", Multimodal.FakeCodec)
      .orderBy("media_id").collect()
    assert(!au(0).isNullAt(2) && au(1).isNullAt(2))
    assert(Multimodal.sampleVideoFrames(withNull.filter(col("media_id") === 2), "content", 5).isEmpty,
      "null video has nothing to sample")
  }
}

class PipelinesSpec extends SparkSpec {
  test("lab1: every order gets a status and a verdict in the enum") {
    val out = graft.pipelines.Labs.lab1PriceMatch(spark, sfDir, limit = 10).collect()
    assert(out.length == 10)
    assert(out.forall(_.getAs[String]("agent_status") == "SUCCESS"))
    assert(out.forall(r => Set("MATCH", "NO_MATCH")(r.getAs[String]("verdict"))))
  }

  test("lab2: RAG retrieves the query doc itself as top hit") {
    val out = graft.pipelines.Labs.lab2Rag(spark, sfDir, nQueries = 3).collect()
    assert(out.length == 3)
    out.foreach { r =>
      assert(r.getAs[Long]("top_doc_id") == r.getAs[Long]("query_id"))
      assert(r.getAs[Double]("top_score") > 0.999)
      assert(r.getAs[String]("response").nonEmpty)
    }
  }

  test("lab3: surge rows carry non-empty reasons and zone labels") {
    val out = graft.pipelines.Labs.lab3Fleet(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[String]("reason").startsWith("[local-textgen]")))
  }

  test("lab4: bounded queue with verdicts from the 5-value enum") {
    val enum5 = Set("APPROVE", "APPROVE_PARTIAL", "REQUEST_DOCS", "DENY_INELIGIBLE", "DENY_FRAUD")
    val out = graft.pipelines.Labs.lab4Fraud(spark, sfDir).collect()
    assert(out.length <= 10 && out.nonEmpty)
    assert(out.forall(r => enum5(r.getAs[String]("verdict"))))
  }

  test("minHashLsh collapse path ≡ direct path on a mixed clone/near/far corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def doc(i: Int): String = (1 to 12).map(_ => s"w${rnd.nextInt(30)}").mkString(" ")
    val uniques = (1 to 60).map(i => (i.toLong, doc(i)))
    // clones (x3 of the first 20), a near-dup (one token changed), empties/null
    val clones = (1 to 20).flatMap(i => Seq((100L + i, uniques(i - 1)._2), (200L + i, uniques(i - 1)._2)))
    val near = Seq((300L, uniques.head._2.replaceFirst("w\\d+", "w999")))
    val edge = Seq((400L, ""), (401L, null.asInstanceOf[String]))
    val df = (uniques ++ clones ++ near ++ edge).toDF("doc_id", "text")
    val a = Dedup.minHashLsh(df, "text", "doc_id", threshold = 0.3)
      .orderBy("id_a", "id_b").collect()
    val b = Dedup.minHashLsh(df, "text", "doc_id", threshold = 0.3, collapseIdentical = false)
      .orderBy("id_a", "id_b").collect()
    assert(a.length == b.length && a.nonEmpty, s"row counts: ${a.length} vs ${b.length}")
    a.zip(b).foreach { case (x, y) => assert(x == y, s"diverged: $x vs $y") }
  }

  test("minHashLsh gate contract: with a BINDING cap the two paths drop different units (ADVICE r6)") {
    import spark.implicits._
    // The collapse≡direct equivalence holds only when no cap fires. With a
    // binding maxBucketSize the units differ by design: direct drops whole
    // band buckets counted in DOCS; collapse caps signature GROUPS and
    // counts band buckets in REPS. Pin the divergence on a corpus where a
    // clone group sits exactly AT the cap while its band buckets sit just
    // above it: 100 clones of `base` + a few docs whose shingle sets are
    // strict supersets of base's that leave every minhash chain minimum
    // unchanged — signature-identical (share ALL band buckets with the
    // clones) yet set-distinct (each its own collapse group).
    val base = (1 to 20).map(i => s"tok$i").mkString(" ")
    val baseSet = Dedup.shingleHashSet(base, 3)
    def sig(set: Array[Long]): Seq[Long] =
      (0 until 16).map(j => set.map(h => Dedup.RowHash.chainInt(h, j)).min)
    val baseSig = sig(baseSet)
    // deterministic search (xxhash64 is fixed): appending one token adds one
    // shingle; keep words whose new shingle beats no chain minimum
    val variants = (1 to 60).map(i => base + s" extra$i")
      .filter(v => sig(Dedup.shingleHashSet(v, 3)) == baseSig)
      .take(6)
    assert(variants.size >= 2, s"hash-search must find superset docs, got ${variants.size}")
    val n = variants.size
    val docs = ((1L to 100L).map(i => (i, base)) ++
      variants.zipWithIndex.map { case (v, i) => (1000L + i, v) }).toDF("doc_id", "text")

    // direct path: every band bucket holds all 100+n signature-identical
    // docs > cap 100 -> all four buckets dropped, counted in docs -> NO pairs
    val stDirect = new Dedup.CapStats(spark)
    val direct = Dedup.minHashLsh(docs, "text", "doc_id", threshold = 0.5,
      maxBucketSize = 100, capStats = stDirect, collapseIdentical = false)
    assert(direct.count() == 0L, "over-cap buckets must suppress every pair on the direct path")
    assert(stDirect.droppedBuckets == 4L && stDirect.droppedRows == 4L * (100 + n),
      s"direct drops band buckets in docs: ${stDirect.droppedBuckets}/${stDirect.droppedRows}")

    // collapse path (the probe flips the gate: 100 clones >> 5% margin):
    // the clone group is exactly AT the cap (kept), rep buckets hold 1+n
    // reps << cap -> the SAME corpus under the SAME cap resolves fully
    val stCollapse = new Dedup.CapStats(spark)
    val collapsed = Dedup.minHashLsh(docs, "text", "doc_id", threshold = 0.5,
      maxBucketSize = 100, capStats = stCollapse)
    val expected = 100L * 99 / 2 + 100L * n + n.toLong * (n - 1) / 2
    assert(collapsed.count() == expected,
      s"collapse resolves intra + cross + variant pairs, expected $expected")
    assert(stCollapse.droppedBuckets == 0L && stCollapse.droppedRows == 0L,
      s"nothing over cap at group or rep level: ${stCollapse.droppedBuckets}/${stCollapse.droppedRows}")

    // one clone more and the GROUP crosses the cap: dropped as one group of
    // 101 member docs (vs direct's four band buckets) — capped recall is a
    // per-path contract, not an accident of the gate
    val stOver = new Dedup.CapStats(spark)
    val over = Dedup.minHashLsh(docs.unionByName(Seq((101L, base)).toDF("doc_id", "text")),
      "text", "doc_id", threshold = 0.5, maxBucketSize = 100, capStats = stOver)
    assert(over.filter(col("id_a") <= 101L).count() == 0L,
      "an over-cap clone group must not expand")
    assert(stOver.droppedBuckets == 1L && stOver.droppedRows == 101L,
      s"collapse drops signature groups in members: ${stOver.droppedBuckets}/${stOver.droppedRows}")
  }

  test("all-clones worst case: ONE giant clone group stays bounded by the group cap and reports (VERDICT r6 #6)") {
    import spark.implicits._
    // the collapse family's scale killer in its purest form — a corpus that
    // is a single clone group, larger than the cap. Un-collapsed this is
    // C(20k, 2) = 200M candidate pairs through every band bucket; the rep
    // collapse reduces it to ONE group row, the cap drops it at rep level
    // (g > cap would expand to O(g²) — the exact quadratic the cap exists
    // to bound), and CapStats carries the full member count.
    val clones = (1L to 20000L).map(i => (i, "boilerplate legal header repeated across the entire crawl"))
      .toDF("doc_id", "text").repartition(4)
    val st = new Dedup.CapStats(spark)
    val pairs = Dedup.minHashLsh(clones, "text", "doc_id", threshold = 0.5,
      maxBucketSize = 10000, capStats = st)
    assert(pairs.count() == 0L, "an over-cap clone corpus must produce zero pairs, not 200M")
    assert(st.droppedBuckets == 1L && st.droppedRows == 20000L,
      s"the one dropped group must report all members: ${st.droppedBuckets}/${st.droppedRows}")
    // at the boundary the answer-size bound takes over: exactly-cap clones
    // resolve to exactly C(cap, 2) pairs — the answer's own size, and the
    // quadratic stage runs on ONE rep row
    val atCap = (1L to 300L).map(i => (i, "boilerplate legal header repeated across the entire crawl"))
      .toDF("doc_id", "text")
    val st2 = new Dedup.CapStats(spark)
    val full = Dedup.minHashLsh(atCap, "text", "doc_id", threshold = 0.5,
      maxBucketSize = 300, capStats = st2)
    assert(full.count() == 300L * 299 / 2)
    assert(st2.droppedBuckets == 0L && st2.droppedRows == 0L)
  }
}
