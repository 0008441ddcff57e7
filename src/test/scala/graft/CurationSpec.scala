package graft

import org.apache.spark.sql.functions._

import graft.llmops.Curation

class CurationSpec extends SparkSpec {

  test("robustZScore shrugs off the outlier that drags every mean/stddev z-score") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val clean = (1 to 100).map(i => ("g", i.toDouble))
    val dirty = clean :+ (("g", 1e9)) // one wild reward value
    def robust(rows: Seq[(String, Double)]) =
      graft.llmops.Curation.robustZScore(rows.toDF("g", "v"), col("v"), col("g"))
        .select("v", "robust_z").as[(Double, Option[Double])].collect().toMap
    val (rc, rd) = (robust(clean), robust(dirty))
    // every clean row's robust score is unchanged by the outlier (the
    // median moves half a step: 50.5 -> 51 — scores shift, but stay bounded)
    clean.map(_._2).foreach { v =>
      assert(math.abs(rc(v).get - rd(v).get) < 0.05, s"v=$v moved ${rc(v)} -> ${rd(v)}")
    }
    assert(rd(1e9).get > 1e6, "the outlier itself scores as the extreme it is")

    val z = graft.llmops.Curation.zScore(dirty.toDF("g", "v"), col("v"), col("g"))
      .select("v", "z").as[(Double, Option[Double])].collect().toMap
    // the classical z-score collapses: the outlier inflates sd so much every
    // clean row looks identical (z ~ -0.0995 for all of them)
    assert(math.abs(z(1.0).get - z(100.0).get) < 1e-4,
      "without robustness the clean rows' scores are crushed together")
  }

  test("zScore squares deep-fraction values exactly (trap #3: the capped product dropped scale to 6)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // values whose SQUARES need 16 fraction digits: the pre-round-7 path
    // multiplied (28,8) decimals, whose capped product silently rounds at
    // scale 6 — exact on money-like inputs, wrong here. Reference moments
    // via exact BigDecimal arithmetic through the same digit-string exit.
    val vals = Seq(1.12345678, 2.98765432, 7.00000013, 3.14159265, 1.12345678)
    val df = vals.map(("g", _)).toDF("g", "v")
    val z = graft.llmops.Curation.zScore(df, col("v"), col("g"))
      .select("v", "z").as[(Double, Option[Double])].collect().toMap
    val dec = vals.map(v => BigDecimal(v).setScale(8, BigDecimal.RoundingMode.HALF_UP))
    val n = dec.size
    val s = dec.sum
    val ss = dec.map(d => d * d).sum // exact: scale 16, tiny magnitudes
    val sd0 = s.toString.toDouble
    val ssd = ss.toString.toDouble
    val mean = sd0 / n
    val variance = (ssd - sd0 * sd0 / n) / (n - 1.0)
    val sd = math.sqrt(variance)
    vals.foreach { v =>
      val vd = BigDecimal(v).setScale(8, BigDecimal.RoundingMode.HALF_UP).toString.toDouble
      val want = (vd - mean) / sd
      assert(z(v).get == want, s"v=$v: ${z(v).get} != $want (exact-square contract)")
    }
  }

  test("zScore raises loudly on out-of-domain input (|v| >= 1e10) instead of ANSI-off NULL-dropping") {
    import spark.implicits._
    // without the explicit guard an ANSI-off session turns the overflowing
    // (18,8) cast into NULL and the row silently leaves the sum-of-squares;
    // the guard must raise in BOTH modes (advisor round-7 finding)
    val df = Seq(("g", 1.0), ("g", 2.0), ("g", 1.1e10)).toDF("g", "v")
    val ansiWas = spark.conf.get("spark.sql.ansi.enabled")
    try {
      Seq("true", "false").foreach { mode =>
        spark.conf.set("spark.sql.ansi.enabled", mode)
        val e = intercept[Exception] {
          Curation.zScore(df, col("v"), col("g")).collect()
        }
        def msgs(t: Throwable): Seq[String] =
          if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
        assert(msgs(e).exists(_.contains("zScore input domain")),
          s"ansi=$mode raised, but not through the domain guard: ${msgs(e).headOption}")
      }
    } finally spark.conf.set("spark.sql.ansi.enabled", ansiWas)
    // null values still pass through (skipped by the sums), in-domain rows score
    val ok = Curation.zScore(
      Seq(("g", Some(1.0)), ("g", Some(2.0)), ("g", Option.empty[Double])).toDF("g", "v"),
      col("v"), col("g")).select("z").collect()
    assert(ok.length == 3)
  }

  test("hash sampling is deterministic and consistent for duplicate content") {
    import spark.implicits._
    val df = Seq((1L, "alpha beta"), (2L, "alpha beta"), (3L, "gamma delta")).toDF("id", "text")
    val b = df.select(col("id"), Curation.hashBucket(col("text")).as("b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b(1L) == b(2L), "identical content must land in the same bucket")
    val s1 = Curation.sample(graft.core.Tables(spark, sfDir, "documents"), "text", 30).count()
    val s2 = Curation.sample(graft.core.Tables(spark, sfDir, "documents"), "text", 30).count()
    assert(s1 == s2 && s1 > 0)
  }

  test("split fractions are roughly honored and partition the sample") {
    val docs = graft.core.Tables(spark, sfDir, "documents")
    val split = Curation.split(docs, "text", 80, 10)
    val counts = split.groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum.toDouble
    assert(counts.keySet == Set("train", "valid", "test"))
    assert(counts("train") / total > 0.6, s"train share too low: $counts")
    assert(counts("train") + counts("valid") + counts("test") == docs.count())
  }

  test("keepTopFraction: per-group median cut keeps each group's own top half") {
    import spark.implicits._
    // group a scores 1..8, group b scores 101..108 — an absolute threshold
    // would keep all of b and none of a; the relative gate keeps half of each
    val df = ((1 to 8).map(i => ("a", i.toLong, i.toDouble)) ++
      (1 to 8).map(i => ("b", 100L + i, 100.0 + i))).toDF("grp", "id", "score")
    val kept = Curation.keepTopFraction(df, col("score"), col("grp"), 0.5)
    val byGrp = kept.groupBy("grp").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGrp == Map("a" -> 4L, "b" -> 4L), s"half of each group: $byGrp")
    val minKeptA = kept.filter(col("grp") === "a").agg(min("score")).head().getDouble(0)
    assert(minKeptA == 5.0, s"a's cut is its own median-interpolated threshold, got $minKeptA")
    // null scores drop; a null group key still gates against its own stratum
    val withNull = (df.collect().map(r => (r.getString(0), r.getLong(1), Option(r.getDouble(2)))).toSeq :+
      (("a", 99L, Option.empty[Double]))).toDF("grp", "id", "score")
    assert(Curation.keepTopFraction(withNull, col("score"), col("grp"), 0.5)
      .filter(col("id") === 99L).count() == 0, "null scores never pass the gate")
  }

  test("keepTopFraction: approx scale path differs from exact only at the boundary score") {
    import spark.implicits._
    // percentile_approx returns an ACTUAL data value where exact percentile
    // interpolates between two — so on coarse scores the approx cut can only
    // admit extra rows AT its own threshold value, never drop a clear keeper
    val df = (1 to 400).map(i => ("d" + i % 3, i.toLong, (i % 10).toDouble)).toDF("grp", "id", "score")
    def kept(d: org.apache.spark.sql.DataFrame) =
      d.select("id", "score", "q_thr").collect()
        .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = kept(Curation.keepTopFraction(df, col("score"), col("grp"), 0.3))
    val approx = kept(Curation.keepTopFraction(df, col("score"), col("grp"), 0.3, approxAccuracy = 10000))
    assert(exact.keySet.subsetOf(approx.keySet) && exact.nonEmpty,
      s"approx (data-value threshold <= interpolated) must not drop exact keepers: ${exact.size} vs ${approx.size}")
    val extra = approx.keySet -- exact.keySet
    assert(extra.forall(id => approx(id)._1 == approx(id)._2),
      s"extra approx rows must sit exactly at the approx threshold: ${extra.take(5).map(approx)}")
  }

  test("normalizeText: NFC composes, case folds, whitespace collapses") {
    import spark.implicits._
    val composed = "café latte"            // é as single codepoint
    val decomposed = "café   LATTE"        // e + combining acute, extra ws
    val df = Seq((1L, Some(composed)), (2L, Some(decomposed)), (3L, Some(" a\tb\nc ")),
      (4L, Option.empty[String])).toDF("id", "text")
    val out = df.select(col("id"), Curation.normalizeText(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L) == out(2L) && out(1L).contains("café latte"),
      s"accent/case/spacing variants must normalize identically: $out")
    assert(out(3L).contains("a b c"))
    assert(out(4L).isEmpty, "null passes through as null")
  }

  test("canonicalizeUrls: ports, case, fragments, tracking params, param order") {
    import spark.implicits._
    val in = Seq(
      ("a", "HTTP://WWW.Example.COM:80/Path/X?b=2&utm_source=s&a=1#frag"),
      ("b", "https://example.com:443"),                    // empty path -> "/"
      ("c", "http://example.com:8080/p?a=1"),              // non-default port survives
      ("d", "https://example.com/p?utm_campaign=x&gclid=1"), // all params dropped -> no '?'
      ("e", "not a url"),                                  // unparseable -> null
      ("f", null.asInstanceOf[String]))
      .toDF("id", "url")
    val out = graft.llmops.Curation.canonicalizeUrls(in, "url", "canon")
      .orderBy("id").collect().map(_.getAs[String]("canon")).toSeq
    assert(out == Seq(
      "http://www.example.com/Path/X?a=1&b=2", // path case preserved, params sorted
      "https://example.com/",
      "http://example.com:8080/p?a=1",
      "https://example.com/p",
      null, null))
  }

  test("domainBlocked matches the host and every parent domain, nothing else") {
    import spark.implicits._
    val hosts = Seq("a.b.spam.com", "spam.com", "notspam.com", "spam.com.evil.org", "x.ok.net")
      .toDF("host")
    val got = hosts.withColumn("b",
      graft.llmops.Curation.domainBlocked(col("host"), Seq("spam.com", "ok.net")))
      .as[(String, Boolean)].collect().toMap
    assert(got == Map(
      "a.b.spam.com" -> true,      // parent domain
      "spam.com" -> true,          // exact
      "notspam.com" -> false,      // suffix of the STRING but not of the domain chain
      "spam.com.evil.org" -> false, // blocked name in the middle, not a suffix
      "x.ok.net" -> true))
  }

  test("cleanText collapses whitespace and strips control chars") {
    import spark.implicits._
    val r = Seq("  a\t\tbc   d  ").toDF("t")
      .select(Curation.cleanText(col("t"))).head().getString(0)
    assert(r == "a b c d")
  }

  test("token packing respects order and budget accounting") {
    import spark.implicits._
    val df = (1 to 10).map(i => (i.toLong, Seq.fill(100)("tok").mkString(" "))).toDF("doc_id", "text")
    val packed = Curation.packByTokenBudget(df, "text", "doc_id", budget = 250)
      .orderBy("doc_id").collect()
    // 100 tokens each, budget 250 → packs of docs {1,2,3},{4,5},{6,7,8}... pack_id = floor(prev_cum/250)
    assert(packed.map(_.getAs[Long]("pack_id")).toSeq == Seq(0L, 0L, 0L, 1L, 1L, 2L, 2L, 2L, 3L, 3L))
    assert(packed.last.getAs[Long]("cum_tokens") == 1000L)
  }

  test("token packing is layout-independent and never single-partitions the corpus") {
    import spark.implicits._
    val docs = graft.core.Tables(spark, sfDir, "documents").select("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      Curation.packByTokenBudget(df, "text", "doc_id", budget = 512)
        .select("doc_id", "n_tokens", "cum_tokens", "pack_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // same answer from a 1-partition and a scattered-32-partition layout
    assert(run(docs.coalesce(1)) == run(docs.repartition(32)))
    // the distributed prefix sum spreads work across a pinned 8-way range
    // layout (old plan: Window.orderBy → everything through one task) and
    // still matches the 1-partition answer
    val pinned = Curation.packByTokenBudget(docs.repartition(32), "text", "doc_id", 512,
      numPartitions = 8)
    assert(pinned.rdd.getNumPartitions == 8,
      s"packing must stay distributed, got ${pinned.rdd.getNumPartitions} partition(s)")
    assert(pinned.select("doc_id", "n_tokens", "cum_tokens", "pack_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet ==
      run(docs.coalesce(1)))
  }

  test("curate: output is exact- and near-dup free, language/quality filtered") {
    val docs = graft.core.Tables(spark, sfDir, "documents")
    val out = Curation.curate(docs, "text", "doc_id", lang = "en", minQuality = 0.0, jaccardThreshold = 0.5)
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.nonEmpty && ids.size < docs.count())
    // no surviving near-dup pairs among the survivors
    val remaining = graft.llmops.Dedup.minHashLsh(
      docs.join(out.select("doc_id"), Seq("doc_id"), "leftsemi"), "text", "doc_id", threshold = 0.5).count()
    assert(remaining == 0, "curated corpus must contain no verified near-dup pairs")
    assert(out.select("lang_pred").collect().forall(_.getString(0) == "en"))
  }

  test("curateFull: end-to-end invariants hold on testdata") {
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables(spark, sfDir, "documents")
    val bench = docs.filter(col("doc_id") % 10 === 0)
    val out = Curation.curateFull(docs.filter(col("doc_id") % 10 =!= 0), bench,
      "text", "doc_id", lang = "en", minQuality = 0.2, jaccardThreshold = 0.5)
      .localCheckpoint()
    val rows = out.collect()
    assert(rows.nonEmpty && rows.length < docs.count())
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == rows.length, "ids unique")
    assert(rows.forall(_.getAs[String]("lang_pred") == "en"))
    assert(rows.forall(_.getAs[Double]("quality") >= 0.2))
    assert(rows.map(_.getAs[String]("split")).toSet.subsetOf(Set("train", "valid", "test")))
    // no verified near-dup pair survives
    assert(graft.llmops.Dedup.minHashLsh(out, "text", "doc_id", threshold = 0.5).count() == 0)
    // nothing contaminated vs the bench set survives
    val contam = graft.llmops.Dedup.decontaminate(out, bench, "text", "doc_id")
      .filter(col("contaminated")).count()
    assert(contam == 0, s"$contam contaminated docs leaked through")
    // no duplicated 20-word chunk survives anywhere in the output corpus
    val chunks = rows.flatMap(r => r.getAs[String]("text").split(" ").grouped(20).map(_.mkString(" ")))
    assert(chunks.distinct.length == chunks.length, "span dedup must hold end-to-end")
  }

  test("winsorize clamps to the exact interpolated group percentiles") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = ((1 to 100).map(v => ("a", v.toDouble)) :+ ("b" -> 1000.0) :+ ("b" -> 2000.0))
      .toDF("g", "v")
    val out = Curation.winsorize(df, col("v"), col("g"), 0.05, 0.95, "w")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val a = out.filter(_._1 == "a")
    // quantile_cont on 1..100: p05 = 1 + 0.05·99 = 5.95, p95 = 95.05
    assert(a.filter(_._2 <= 5).forall(_._3 == 5.95))
    assert(a.filter(_._2 >= 96).forall(_._3 == 95.05))
    assert(a.filter(t => t._2 > 5.95 && t._2 < 95.05).forall(t => t._3 == t._2), "interior passes through")
    // two-value group: p05 = 1050, p95 = 1950
    assert(out.filter(_._1 == "b").map(_._3).sorted.toSeq == Seq(1050.0, 1950.0))
  }

  test("winsorize keeps null-keyed groups and passes null values through") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((Option("a"), Option(1.0)), (Option("a"), Option(10.0)),
      (Option.empty[String], Option(5.0)), (Option("a"), Option.empty[Double]))
      .toDF("g", "v")
    val out = Curation.winsorize(df, col("v"), col("g"), 0.05, 0.95, "w").collect()
    assert(out.length == 4, "no row may be dropped")
    val nullGroup = out.filter(_.isNullAt(0))
    assert(nullGroup.length == 1 && nullGroup.head.getDouble(2) == 5.0)
    val nullValue = out.filter(r => !r.isNullAt(0) && r.isNullAt(1))
    assert(nullValue.length == 1 && nullValue.head.isNullAt(2), "null values stay null")
  }

  test("chunkForRag: full coverage, exact overlap, short docs -> one chunk") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val words100 = (1 to 100).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, words100), (2L, "a b c"), (3L, "")).toDF("doc_id", "text")
    val out = Curation.chunkForRag(df, "text", "doc_id", chunkTokens = 40, overlapTokens = 10)
      .collect().groupBy(_.getAs[Long]("doc_id"))
    val d1 = out(1L).sortBy(_.getAs[Int]("chunk_idx"))
      .map(r => (r.getAs[String]("chunk_text").split(" "), r.getAs[Long]("n_tokens")))
    assert(d1.length == 3) // ceil((100-10)/30) = 3
    assert(d1(0)._1.head == "w1" && d1(0)._1.last == "w40" && d1(0)._2 == 40L)
    assert(d1(1)._1.head == "w31" && d1(1)._1.last == "w70", "10-token overlap")
    assert(d1(2)._1.head == "w61" && d1(2)._1.last == "w100")
    // every token appears in at least one chunk
    assert(d1.flatMap(_._1).toSet == (1 to 100).map(i => s"w$i").toSet)
    assert(out(2L).length == 1 && out(2L)(0).getAs[Long]("n_tokens") == 3L)
    assert(out(3L).length == 1, "empty docs keep one degenerate chunk")
  }
}

/** Seeded global shuffle + sharding — determinism, balance, in-shard ranks. */
class ShuffleShardsSpec extends SparkSpec {
  test("same seed reproduces the permutation; different seeds decorrelate") {
    import spark.implicits._
    val df = (1L to 2000L).toDF("doc_id")
    def order(seed: Long): Seq[Long] =
      graft.llmops.Curation.shuffleShards(df, "doc_id", seed, 4)
        .orderBy("shard", "shard_pos").select("doc_id").collect().map(_.getLong(0)).toSeq
    val a = order(42L)
    assert(a == order(42L), "same seed must reproduce bit-identically")
    val b = order(43L)
    assert(a != b, "different seed must permute differently")
    assert(a.sorted == b.sorted, "both are permutations of the same ids")
    assert(a != (1L to 2000L), "hash order must not be insertion order")
  }

  test("shards are balanced and shard_pos is a contiguous 1..n rank per shard") {
    import spark.implicits._
    val out = graft.llmops.Curation.shuffleShards((1L to 2000L).toDF("doc_id"), "doc_id", 7L, 8)
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    val byShard = out.groupBy(_._1)
    assert(byShard.keySet == (0 until 8).toSet)
    byShard.values.foreach { rows =>
      assert(rows.map(_._2).sorted.toSeq == (1L to rows.length).toSeq, "contiguous rank")
    }
    val sizes = byShard.values.map(_.length)
    assert(sizes.max < sizes.min * 2, s"hash sharding must balance, got $sizes")
  }
}
