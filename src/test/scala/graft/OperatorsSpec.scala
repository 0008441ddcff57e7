package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._

import graft.functions.{Scalars, Text, Vectors}
import graft.operators.{IntervalJoin, TopK, Tumble}

class TumbleSpec extends SparkSpec {
  test("assigns epoch-aligned 5-minute windows; window_time = end - 1ms") {
    import spark.implicits._
    val df = Seq(
      ("a", Timestamp.valueOf("2024-01-01 00:02:00")),
      ("a", Timestamp.valueOf("2024-01-01 00:04:59")),
      ("a", Timestamp.valueOf("2024-01-01 00:05:00")),
      ("b", Timestamp.valueOf("2024-01-01 00:02:00"))).toDF("k", "ts")
    val out = Tumble(df, "ts", "5 minutes", col("k"))("cnt" -> count(lit(1)))
      .orderBy("k", "window_start").collect()
    assert(out.length == 3)
    val first = out(0)
    assert(first.getAs[Timestamp]("window_start") == Timestamp.valueOf("2024-01-01 00:00:00"))
    assert(first.getAs[Timestamp]("window_end") == Timestamp.valueOf("2024-01-01 00:05:00"))
    assert(first.getAs[Timestamp]("window_time") == Timestamp.valueOf("2024-01-01 00:04:59.999"))
    assert(first.getAs[Long]("cnt") == 2)
  }
}

class CumulateSpec extends SparkSpec {
  import graft.operators.Cumulate

  test("expanding windows share the maxSize-aligned start; counts accumulate") {
    import spark.implicits._
    val df = Seq(
      ("a", Timestamp.valueOf("2024-01-01 00:10:00")), // slice [00:00, 01:00)
      ("a", Timestamp.valueOf("2024-01-01 02:30:00")), // slice [02:00, 03:00)
      ("b", Timestamp.valueOf("2024-01-01 05:59:59"))).toDF("k", "ts")
    val out = Cumulate(df, "ts", "1 hour", "6 hours", "k")(
      slice = Seq("c" -> count(lit(1))), merge = Seq("cnt" -> sum(col("c"))))
      .orderBy("k", "window_end").collect()
    // 'a' first event covers ends 01:00..06:00 (6 windows), all starting 00:00;
    // from 03:00 on the second event joins (cnt 2). 'b' only the 06:00 end.
    val a = out.filter(_.getAs[String]("k") == "a")
    assert(a.length == 6)
    assert(a.forall(_.getAs[Timestamp]("window_start") == Timestamp.valueOf("2024-01-01 00:00:00")))
    assert(a.map(r => (r.getAs[Timestamp]("window_end").toString, r.getAs[Long]("cnt"))).toSeq == Seq(
      ("2024-01-01 01:00:00.0", 1L), ("2024-01-01 02:00:00.0", 1L), ("2024-01-01 03:00:00.0", 2L),
      ("2024-01-01 04:00:00.0", 2L), ("2024-01-01 05:00:00.0", 2L), ("2024-01-01 06:00:00.0", 2L)))
    val b = out.filter(_.getAs[String]("k") == "b")
    assert(b.length == 1 && b.head.getAs[Long]("cnt") == 1L &&
      b.head.getAs[Timestamp]("window_end") == Timestamp.valueOf("2024-01-01 06:00:00"))
    assert(a.head.getAs[Timestamp]("window_time") == Timestamp.valueOf("2024-01-01 00:59:59.999"))
  }

  test("slice-decomposed plan equals the naive row-exploded formulation") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = (1 to 2000).map { i =>
      (s"k${rnd.nextInt(3)}", new Timestamp(1700000000000L + rnd.nextInt(86400) * 1000L),
        rnd.nextInt(1000) / 100.0)
    }.toDF("k", "ts", "v")
    val fast = Cumulate(df, "ts", "30 minutes", "3 hours", "k")(
      slice = Seq("c" -> count(lit(1)), "s" -> sum(col("v").cast("decimal(25,2)"))),
      merge = Seq("cnt" -> sum(col("c")), "sv" -> sum(col("s")).cast("double")))
      .select("k", "window_start", "window_end", "cnt", "sv")
    // naive: every ROW explodes into each cumulative window containing it
    val maxUs = 3L * 3600000000L
    val naive = df
      .withColumn("window_start", timestamp_micros(unix_micros(col("ts")) - pmod(unix_micros(col("ts")), lit(maxUs))))
      .withColumn("window_end", explode(sequence(
        col("window_start") + expr("INTERVAL 30 MINUTE"),
        col("window_start") + expr("INTERVAL 3 HOUR"),
        expr("INTERVAL 30 MINUTE"))))
      .filter(col("ts") < col("window_end"))
      .groupBy("k", "window_start", "window_end")
      .agg(count(lit(1)).as("cnt"), sum(col("v").cast("decimal(25,2)")).cast("double").as("sv"))
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
    assert(fast.count() > 0)
  }

  test("maxSize must be an integral multiple of step") {
    import spark.implicits._
    val df = Seq(("a", Timestamp.valueOf("2024-01-01 00:00:00"))).toDF("k", "ts")
    assertThrows[IllegalArgumentException] {
      Cumulate(df, "ts", "45 minutes", "2 hours", "k")(
        slice = Seq("c" -> count(lit(1))), merge = Seq("cnt" -> sum(col("c"))))
    }
  }
}

class IntervalJoinSpec extends SparkSpec {
  test("keeps rows inside [right+lower, right+upper] only") {
    import spark.implicits._
    val left = Seq((1L, Timestamp.valueOf("2024-01-02 00:00:00")),
      (1L, Timestamp.valueOf("2024-02-01 00:00:00"))).toDF("k", "lts")
    val right = Seq((1L, Timestamp.valueOf("2024-01-01 00:00:00"))).toDF("k2", "rts")
    val out = IntervalJoin(left, right, "k", "k2", "lts", "rts", "'0' DAY", "'30' DAY")
    assert(out.count() == 1)
  }

  test("bucketed and unbucketed plans return identical rows") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val left = (1 to 500).map(i =>
      ((rnd.nextInt(4) + 1).toLong, i.toLong, new Timestamp(1700000000000L + rnd.nextInt(2000000) * 1000L)))
      .toDF("k", "lid", "lts")
    val right = (1 to 80).map(i =>
      ((rnd.nextInt(5) + 1).toLong, i.toLong, new Timestamp(1700000000000L + rnd.nextInt(2000000) * 1000L)))
      .toDF("k2", "rid", "rts")
    def run(b: Boolean) =
      IntervalJoin(left, right, "k", "k2", "lts", "rts", "'0' HOUR", "'48' HOUR", bucketed = b)
        .select("lid", "rid").as[(Long, Long)].collect().toSet
    val bucketedRows = run(true)
    assert(bucketedRows == run(false) && bucketedRows.nonEmpty)
  }
}

class TopKSpec extends SparkSpec {
  test("topK keeps k best by score desc with id tie-break") {
    import spark.implicits._
    val df = Seq((1L, 0.5, 10L), (1L, 0.9, 11L), (1L, 0.9, 9L), (1L, 0.1, 12L), (2L, 0.3, 1L))
      .toDF("qid", "score", "id")
    val agg = df.groupBy("qid").agg(TopK.topK(2)(col("score"), col("id")).as("nn"))
    val out = TopK.explodeRanked(agg, "nn", Seq(col("qid")))
      .orderBy("qid", "rank").collect()
    assert(out.map(r => (r.getAs[Long]("qid"), r.getAs[Long]("rank"), r.getAs[Long]("id"))).toSeq ==
      Seq((1L, 1L, 9L), (1L, 2L, 11L), (2L, 1L, 1L)))
  }

  test("TopK.perGroup equals the window formulation and aggregates map-side") {
    val orders = graft.core.Tables(spark, sfDir, "orders")
    val agg = TopK.perGroup(orders, Seq("o_custkey"), col("o_totalprice"), col("o_orderkey"), k = 2)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val win = orders
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 2)
      .select(col("o_custkey"), col("rank"), col("o_totalprice").as("score"), col("o_orderkey").as("id"))
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("o_custkey"), r.getAs[Long]("rank"), r.getAs[Double]("score"), r.getAs[Long]("id"))).toSet
    assert(key(agg) == key(win))
    val p = agg.queryExecution.executedPlan.toString
    assert(p.contains("partial_topkagg"), "per-group top-k must reduce map-side, not window-sort")
  }
}

class OverlapJoinSpec extends SparkSpec {
  import java.sql.Timestamp

  test("bucketed overlap join equals the naive inequality join, without a cartesian") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def iv(n: Int, tag: String) = (1 to n).map { i =>
      val s = 1700000000000L + rnd.nextInt(5000000) * 1000L
      (i.toLong, (rnd.nextInt(5) + 1).toLong, new Timestamp(s),
        new Timestamp(s + (rnd.nextInt(200000) + 1) * 1000L))
    }.toDF(s"${tag}_key", s"${tag}_k", s"${tag}_s", s"${tag}_e")
    val (a, b) = (iv(300, "a"), iv(120, "b"))
    val fast = graft.operators.OverlapJoin(a, b, "a_k", "b_k", "a_s", "a_e", "b_s", "b_e",
      bucketWidthSeconds = 100000)
      .select("a_key", "b_key").as[(Long, Long)].collect().toSet
    val naive = a.join(b, col("a_k") === col("b_k") &&
        col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
      .select("a_key", "b_key").as[(Long, Long)].collect().toSet
    assert(fast == naive && fast.nonEmpty, s"${fast.size} vs ${naive.size}")
    val p = graft.operators.OverlapJoin(a, b, "a_k", "b_k", "a_s", "a_e", "b_s", "b_e", 100000)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"overlap join must stay an equi-join:\n$p")
  }

  test("inverted intervals fail loudly; NULL-bounded intervals drop, not match") {
    import spark.implicits._
    def df(rows: Seq[(Long, Long, Option[Timestamp], Option[Timestamp])], tag: String) =
      rows.toDF(s"${tag}_key", s"${tag}_k", s"${tag}_s", s"${tag}_e")
    val t0 = new Timestamp(1700000000000L)
    val t1 = new Timestamp(1700000060000L)
    val ok = df(Seq((1L, 1L, Some(t0), Some(t1))), "b")
    val inverted = df(Seq((1L, 1L, Some(t1), Some(t0))), "a")
    val ex = intercept[Exception] {
      graft.operators.OverlapJoin(inverted, ok, "a_k", "b_k", "a_s", "a_e", "b_s", "b_e", 60).count()
    }
    assert(ex.toString.contains("inverted interval") ||
      Option(ex.getCause).exists(_.toString.contains("inverted interval")), ex.toString)
    val nullBound = df(Seq((1L, 1L, None, Some(t1)), (2L, 1L, Some(t0), None)), "a")
    assert(graft.operators.OverlapJoin(nullBound, ok, "a_k", "b_k", "a_s", "a_e", "b_s", "b_e", 60)
      .count() == 0, "NULL-bounded intervals must produce no pairs")
  }
}

class ResampleSpec extends SparkSpec {
  import java.sql.Timestamp

  test("gridFill: dense step grid per key, forward-filled, gaps carry the last observation") {
    import spark.implicits._
    def ts(m: Int) = Timestamp.valueOf(f"2026-01-05 10:$m%02d:00")
    // key a: obs at :00 (v=1) and :07 (v=9) -> 2-min grid 00,02,04,06 fill 1; 07? grid is
    // 00,02,04,06 and ends < :07? sequence(00, 07, 2m) = 00,02,04,06 — mx :07 not aligned
    val obs = Seq(("a", ts(0), 1.0), ("a", ts(7), 9.0), ("b", ts(4), 5.0))
      .toDF("k", "ts", "v")
    val out = graft.operators.Resample.gridFill(obs, "k", "ts", 120, Seq("ts", "v"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2.getTime))
    val a = out.filter(_._1 == "a")
    assert(a.map(_._2) sameElements Array(ts(0), ts(2), ts(4), ts(6)),
      s"grid = min..max step 2m (end unaligned drops): ${a.mkString(", ")}")
    assert(a.forall(t => t._3 == ts(0) && t._4 == 1.0),
      s"every grid point before :07 forward-fills the :00 observation: ${a.mkString(", ")}")
    val b = out.filter(_._1 == "b")
    assert(b.length == 1 && b.head._2 == ts(4) && b.head._4 == 5.0,
      "single-observation key yields its one anchored grid point")
  }

  test("gridLinear: straight-line values between observations, raw values on them") {
    import spark.implicits._
    def ts(m: Int) = Timestamp.valueOf(f"2026-01-05 10:$m%02d:00")
    // a: 0.0@:00 -> 8.0@:08 -> 2.0@:10; 2-min grid
    val obs = Seq(("a", ts(0), 0.0), ("a", ts(8), 8.0), ("a", ts(10), 2.0),
      ("c", ts(3), 7.0)).toDF("k", "ts", "v")
    val out = graft.operators.Resample.gridLinear(obs, "k", "ts", "v", 120)
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2.getTime))
    val a = out.filter(_._1 == "a").map(t => t._2 -> t._3)
    assert(a sameElements Array(ts(0) -> 0.0, ts(2) -> 2.0, ts(4) -> 4.0,
      ts(6) -> 6.0, ts(8) -> 8.0, ts(10) -> 2.0),
      s"interp at 2/4/6, raw at 0/8/10: ${a.mkString(", ")}")
    assert(out.filter(_._1 == "c") sameElements Array(("c", ts(3), 7.0)),
      "single-observation key anchors its own point")
    // an interval shorter than the step contributes no aligned points and
    // must not make sequence() throw
    val tight = Seq(("d", ts(0), 1.0), ("d", new Timestamp(ts(0).getTime + 30000), 2.0))
      .toDF("k", "ts", "v")
    val d = graft.operators.Resample.gridLinear(tight, "k", "ts", "v", 120).collect()
    assert(d.length == 1 && d.head.getDouble(2) == 1.0, s"only the anchor: ${d.toSeq}")
  }
}

class ReconcileSpec extends SparkSpec {
  import graft.operators.Reconcile

  test("checksum is layout-independent and detects single-cell drift") {
    val li = graft.core.Tables(spark, sfDir, "lineitem")
    val cols = Seq(col("l_orderkey").cast("string"), col("l_partkey").cast("string"),
      col("l_suppkey").cast("string"), col("l_linestatus"))
    def sums(df: org.apache.spark.sql.DataFrame) = Reconcile.checksum(df, col("l_returnflag"), cols)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val base = sums(li)
    // same rows, radically different layout -> identical checksums
    assert(sums(li.repartition(17, col("l_partkey")).sortWithinPartitions("l_orderkey")) == base)
    // one cell changed in one row -> that group's checksum moves, count doesn't
    val drifted = sums(li.withColumn("l_linestatus",
      when(col("l_orderkey") === li.select(min("l_orderkey")).first().getLong(0), lit("X"))
        .otherwise(col("l_linestatus"))))
    assert(drifted != base)
    assert(drifted.map(t => (t._1, t._2)) == base.map(t => (t._1, t._2)), "row counts unchanged")
  }

  test("checksum distinguishes a value moving between nullable columns") {
    import spark.implicits._
    val ab = Seq((Option("x"), Option.empty[String])).toDF("c1", "c2")
    val ba = Seq((Option.empty[String], Option("x"))).toDF("c1", "c2")
    def s(df: org.apache.spark.sql.DataFrame) =
      Reconcile.checksum(df, lit("g"), Seq(col("c1"), col("c2"))).head().getLong(2)
    assert(s(ab) != s(ba), "('x', NULL) and (NULL, 'x') must hash differently")
  }
}

class ExpectationsSpec extends SparkSpec {
  import graft.operators.Expectations.{Rule, check, quarantine}

  test("quarantine tags each row with its violated rules, sorted; null predicate = violation") {
    import spark.implicits._
    val df = Seq((1, Option(5)), (2, Option(-1)), (3, Option.empty[Int])).toDF("id", "v")
    val out = quarantine(df, Seq(
      Rule("positive", col("v") > 0, 1.0),
      Rule("small_id", col("id") < 3, 1.0)))
      .collect().map(r => r.getInt(0) -> r.getString(2)).toMap
    assert(out(1) == "")
    assert(out(2) == "positive")
    assert(out(3) == "positive,small_id", "null predicate violates; names sort")
    // the clean/quarantine split covers the input exactly
    val q = quarantine(df, Seq(Rule("positive", col("v") > 0, 1.0)))
    assert(q.filter(col("violations") === "").count() +
      q.filter(col("violations") =!= "").count() == df.count())
  }

  test("expectations evaluate in one agg; null predicates count as failures") {
    import spark.implicits._
    val df = Seq(Option(5), Option(-1), Option.empty[Int]).toDF("v")
    val out = check(df, Seq(
      Rule("positive", col("v") > 0, 0.3), // 1/3 pass (null row FAILS)
      Rule("nonnull", col("v").isNotNull, 1.0)))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getBoolean(3))).toMap
    assert(math.abs(out("positive")._1 - 1.0 / 3) < 1e-15 && out("positive")._2)
    assert(out("nonnull")._1 == 2.0 / 3 && !out("nonnull")._2)
  }

  test("expectations fail closed on zero input rows") {
    import spark.implicits._
    val empty = Seq.empty[Int].toDF("v")
    val out = check(empty, Seq(
      Rule("must_hold", col("v") > 0, 1.0),
      Rule("vacuous", col("v") > 0, 0.0)))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getBoolean(3))).toMap
    assert(out("must_hold") == (0.0, false), "a broken empty ingest must FAIL the gate")
    assert(out("vacuous") == (0.0, true))
  }
}

class FunctionsSpec extends SparkSpec {
  test("cosine of identical vectors is 1; orthogonal is 0") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 0.0f), Array(1.0f, 0.0f), Array(0.0f, 1.0f))).toDF("a", "b", "c")
    val r = df.select(
      Vectors.cosine(col("a"), col("b")).as("same"),
      Vectors.cosine(col("a"), col("c")).as("orth")).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1)) < 1e-12)
  }

  test("moneyFmt renders two decimals") {
    import spark.implicits._
    val r = Seq(29.949, 5.0).toDF("p").select(Scalars.moneyFmt(col("p"))).collect()
    assert(r.map(_.getString(0)).toSeq == Seq("29.95", "5.00"))
  }

  test("shingles produces distinct token n-grams") {
    import spark.implicits._
    val r = Seq("a b c d a b c d").toDF("t")
      .select(Text.shingles(col("t"), 3).as("s")).head().getSeq[String](0)
    assert(r.toSet == Set("a b c", "b c d", "c d a", "d a b"))
  }

  test("langId picks the highest stopword ratio") {
    import spark.implicits._
    val r = Seq("the cat is on the mat", "el gato es un gato").toDF("t")
      .select(Text.langId(col("t"))).collect().map(_.getString(0)).toSeq
    assert(r == Seq("en", "es"))
  }

  test("timeOfDayBucket covers all hours") {
    import spark.implicits._
    val df = (0 to 23).map(h => Timestamp.valueOf(f"2024-01-01 $h%02d:30:00")).toDF("ts")
    val buckets = df.select(Scalars.timeOfDayBucket(col("ts"))).collect().map(_.getString(0))
    assert(buckets.forall(_.nonEmpty))
    // 9 CASE arms, but the first and last both say "late night" → 8 labels
    assert(buckets.distinct.length == 8)
  }
}
