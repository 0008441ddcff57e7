package graft

import org.apache.spark.sql.functions._

class IdsSpec extends SparkSpec {
  import graft.operators.Ids

  test("contiguousRowIds matches the single-task row_number and is dense") {
    val orders = graft.core.Tables(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    val got = Ids.contiguousRowIds(orders, Seq("o_totalprice", "o_orderkey"), numPartitions = 7)
    val n = orders.count()
    // dense 0..N-1: count, min, max, distinct all agree
    val agg = got.agg(count(lit(1)), min("row_id"), max("row_id"), countDistinct("row_id")).head()
    assert(agg.getLong(0) == n && agg.getLong(1) == 0L &&
      agg.getLong(2) == n - 1 && agg.getLong(3) == n)
    // bit-identical to the window formulation under a total order
    val win = orders.withColumn("row_id",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy("o_totalprice", "o_orderkey")).cast("long") - 1)
    assert(got.exceptAll(win).isEmpty && win.exceptAll(got).isEmpty)
    // layout-independent: a radically different input layout, same ids
    val scrambled = Ids.contiguousRowIds(
      orders.repartition(13, col("o_orderkey")), Seq("o_totalprice", "o_orderkey"),
      numPartitions = 3)
    assert(got.exceptAll(scrambled).isEmpty && scrambled.exceptAll(got).isEmpty)
  }
}

class SnapshotDiffSpec extends SparkSpec {
  import graft.operators.SnapshotDiff
  import org.apache.spark.sql.Row

  test("diff classifies added/removed/changed with null-safe cells") {
    import spark.implicits._
    val old = Seq(
      (1L, Option("a"), Option(10)),
      (2L, Option("b"), Option(20)),
      (3L, Option("c"), Option(30)),
      (4L, Option.empty[String], Option(40))).toDF("k", "s", "v")
    val neu = Seq(
      (1L, Option("a"), Option(10)),       // unchanged
      (2L, Option("B"), Option(20)),       // s changed
      (4L, Option("now"), Option.empty[Int]), // NULL→value and value→NULL
      (5L, Option("e"), Option(50)))       // added
    .toDF("k", "s", "v")
    val out = SnapshotDiff.diff(old, neu, Seq("k"), Seq("s", "v"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(out == Set(
      (2L, "changed", "s"),
      (3L, "removed", ""),
      (4L, "changed", "s,v"),
      (5L, "added", "")), out.toString)
    // includeUnchanged keeps the audit echo
    val all = SnapshotDiff.diff(old, neu, Seq("k"), Seq("s", "v"), includeUnchanged = true)
    assert(all.filter(col("status") === "unchanged").count() == 1)
  }

  test("identical snapshots diff to empty; NULL keys join null-safely") {
    import spark.implicits._
    val t = Seq((Option(1L), "x"), (Option.empty[Long], "y")).toDF("k", "s")
    assert(SnapshotDiff.diff(t, t, Seq("k"), Seq("s")).isEmpty)
    val moved = Seq((Option(1L), "x"), (Option.empty[Long], "Y")).toDF("k", "s")
    val out = SnapshotDiff.diff(t, moved, Seq("k"), Seq("s")).collect()
    assert(out.length == 1 && out.head.isNullAt(0) &&
      out.head.getString(1) == "changed" && out.head.getString(2) == "s")
  }
}

class DivergenceSpec extends SparkSpec {
  import graft.llmops.CorpusStats

  test("tokenDivergence: identical corpora have zero distance, disjoint near-max tvd") {
    import spark.implicits._
    val a = Seq("alpha beta beta", "gamma alpha").toDF("text")
    val same = CorpusStats.tokenDivergence(a, a, "text").head()
    assert(same.getAs[Double]("tvd") == 0.0 && same.getAs[Double]("chi2") == 0.0 &&
      same.getAs[Double]("kl_ab") == 0.0 && same.getAs[Double]("js") == 0.0)
    // bc of identical distributions = Σp = 1 → hellinger 0 (up to decimal-sum rounding)
    assert(math.abs(same.getAs[Double]("bc") - 1.0) < 1e-12)
    assert(same.getAs[Double]("hellinger") < 1e-6)

    val b = Seq("delta epsilon", "zeta delta").toDF("text")
    val disj = CorpusStats.tokenDivergence(a, b, "text").head()
    // with +1 smoothing mass leaks, but tvd must dominate the identical case
    assert(disj.getAs[Double]("tvd") > 0.3 && disj.getAs[Double]("hellinger") > 0.3)
    assert(disj.getAs[Double]("kl_ab") > 0.0 && disj.getAs[Double]("js") > 0.0)
  }

  test("tokenDivergence is symmetric in the symmetric measures and layout-independent") {
    val docs = graft.core.Tables(spark, sfDir, "documents")
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 === 1)
    val ab = CorpusStats.tokenDivergence(a, b, "text").head()
    val ba = CorpusStats.tokenDivergence(b, a, "text").head()
    for (c <- Seq("tvd", "bc", "hellinger", "chi2", "js"))
      assert(ab.getAs[Double](c) == ba.getAs[Double](c), s"$c must be symmetric")
    assert(ab.getAs[Double]("kl_ab") == ba.getAs[Double]("kl_ba"))
    // decimal-sum determinism: scrambled layout, bit-identical totals
    val scr = CorpusStats.tokenDivergence(a.repartition(11), b.repartition(5), "text").head()
    for (c <- Seq("tvd", "bc", "hellinger", "chi2", "kl_ab", "kl_ba", "js"))
      assert(ab.getAs[Double](c) == scr.getAs[Double](c), s"$c must be layout-independent")
  }
}

class QuantileBinSpec extends SparkSpec {

  test("approx binning stays within sketch tolerance of exact; both cover all rows") {
    val li = graft.core.Tables(spark, sfDir, "lineitem")
      .select(col("l_returnflag").as("g"), col("l_extendedprice").as("p"), col("l_orderkey"), col("l_linenumber"))
    val exact = graft.llmops.Curation.quantileBin(li, col("p"), col("g"), 4)
    val approx = graft.llmops.Curation.quantileBin(li, col("p"), col("g"), 4, exact = false)
    val n = li.count()
    assert(exact.count() == n && approx.count() == n, "binning must keep every row")
    assert(exact.select("bucket").distinct().count() == 4)
    // a NULL stratum is a group like any other: its rows must survive the
    // null-safe threshold join, not vanish
    import spark.implicits._
    val withNulls = Seq((Option("g"), 1.0), (Option.empty[String], 2.0),
      (Option.empty[String], 5.0), (Option("g"), 9.0)).toDF("s", "p")
    val binned = graft.llmops.Curation.quantileBin(withNulls, col("p"), col("s"), 2)
    assert(binned.count() == 4, "NULL-group rows must be binned, not dropped")
    assert(binned.filter(col("grp").isNull).count() == 2)
    // the sketch's rank error moves only rows near the cuts: demand 99% agreement
    val together = exact.withColumnRenamed("bucket", "be")
      .join(approx.withColumnRenamed("bucket", "ba"), Seq("grp", "v"))
    val agree = together.filter(col("be") === col("ba")).count().toDouble / together.count()
    assert(agree > 0.99, s"approx buckets must track exact, agreement=$agree")
  }
}

class ZScoreSpec extends SparkSpec {

  test("zScore standardizes per group; degenerate groups yield NULL; layout-independent") {
    import spark.implicits._
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 7.0), ("c", 5.0), ("c", 5.0))
      .toDF("g", "p")
    val out = graft.llmops.Curation.zScore(df, col("p"), col("g"))
    val byGroup = out.collect().groupBy(_.getString(0))
    // group a: mean 2, sample sd 1 -> z = -1, 0, 1
    assert(byGroup("a").map(r => r.getDouble(2)).sorted.toSeq == Seq(-1.0, 0.0, 1.0))
    // single-row and zero-variance groups: no spread -> NULL z, rows kept
    assert(byGroup("b").length == 1 && byGroup("b").head.isNullAt(2))
    assert(byGroup("c").length == 2 && byGroup("c").forall(_.isNullAt(2)))
    // standardized: each non-degenerate group has mean ~0 and sd ~1
    val li = graft.core.Tables(spark, sfDir, "lineitem")
    val z = graft.llmops.Curation.zScore(li, col("l_extendedprice"), col("l_returnflag"))
    val stats = z.groupBy("grp").agg(avg("z").as("m"), stddev(col("z")).as("sd")).collect()
    assert(stats.forall(r => math.abs(r.getDouble(1)) < 1e-9 && math.abs(r.getDouble(2) - 1.0) < 1e-9))
    // decimal moments make the result layout-independent bit-for-bit
    val z2 = graft.llmops.Curation.zScore(li.repartition(13), col("l_extendedprice"), col("l_returnflag"))
    assert(z.exceptAll(z2).isEmpty && z2.exceptAll(z).isEmpty)
  }
}

class Scd2MergeSpec extends SparkSpec {
  import graft.operators.Scd2
  import java.sql.Timestamp

  private def ts(s: String) = Timestamp.valueOf(s)

  test("applyChanges folds new events in; untouched keys pass through; equals full rebuild") {
    import spark.implicits._
    val early = Seq(
      (1L, "u1", ts("2024-01-01 00:00:00"), "a"),
      (2L, "u1", ts("2024-01-02 00:00:00"), "b"),
      (3L, "u2", ts("2024-01-01 12:00:00"), "x")).toDF("event_id", "user_id", "ts", "state0")
    val late = Seq(
      (4L, "u1", ts("2024-01-03 00:00:00"), "b"), // no state change: collapses
      (5L, "u1", ts("2024-01-04 00:00:00"), "c"),
      (6L, "u3", ts("2024-01-05 00:00:00"), "new")).toDF("event_id", "user_id", "ts", "state0")
    val current = Scd2(early, "user_id", "state0", "ts", "event_id")
    val merged = Scd2.applyChanges(current, late, "user_id", "state0", "ts", "event_id")
    val full = Scd2(early.unionByName(late), "user_id", "state0", "ts", "event_id")
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty)
    // untouched key u2 kept its row; new key u3 appeared
    val byKey = merged.collect().groupBy(_.getString(0))
    assert(byKey("u2").length == 1 && byKey("u3").length == 1 && byKey("u1").length == 3)
  }

  test("applyChanges fails loudly on out-of-order changes") {
    import spark.implicits._
    val early = Seq((1L, "u1", ts("2024-01-05 00:00:00"), "a"))
      .toDF("event_id", "user_id", "ts", "state0")
    val stale = Seq((2L, "u1", ts("2024-01-01 00:00:00"), "b"))
      .toDF("event_id", "user_id", "ts", "state0")
    val current = Scd2(early, "user_id", "state0", "ts", "event_id")
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    val e = intercept[Exception](
      Scd2.applyChanges(current, stale, "user_id", "state0", "ts", "event_id").collect())
    assert(msgs(e).exists(_.contains("at or before the key's last state change")), msgs(e).toString)
    // a change AT the boundary timestamp is ambiguous (tie against the
    // discarded raw event) and must be rejected too
    val boundary = Seq((3L, "u1", ts("2024-01-05 00:00:00"), "c"))
      .toDF("event_id", "user_id", "ts", "state0")
    val e2 = intercept[Exception](
      Scd2.applyChanges(current, boundary, "user_id", "state0", "ts", "event_id").collect())
    assert(msgs(e2).exists(_.contains("at or before")), msgs(e2).toString)
  }
}

class ExactSampleSpec extends SparkSpec {
  import graft.llmops.Curation

  test("exactStratifiedSample keeps exactly n per stratum, deterministically") {
    val docs = graft.core.Tables(spark, sfDir, "documents")
    val stratum = when(length(col("text")) < 200, "short")
      .when(length(col("text")) < 500, "medium").otherwise("long")
    val out = Curation.exactStratifiedSample(docs, stratum, "doc_id",
      Map("short" -> 5, "medium" -> 3, "long" -> 2))
    val counts = out.groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val present = docs.withColumn("stratum", stratum).groupBy("stratum").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((k, n) <- Map("short" -> 5L, "medium" -> 3L, "long" -> 2L))
      assert(counts.getOrElse(k, 0L) == math.min(n, present.getOrElse(k, 0L)),
        s"stratum $k: got ${counts.get(k)}")
    // reproducible across layouts (the whole point of the hash order)
    val again = Curation.exactStratifiedSample(docs.repartition(17), stratum, "doc_id",
      Map("short" -> 5, "medium" -> 3, "long" -> 2))
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
    // a stratum not in counts with defaultN=0 is dropped entirely
    val onlyShort = Curation.exactStratifiedSample(docs, stratum, "doc_id", Map("short" -> 4))
    assert(onlyShort.select("stratum").distinct().collect().map(_.getString(0)).toSeq == Seq("short"))
  }
}
