package graft

import org.apache.spark.sql.functions._

import graft.operators.FuzzyMatch

class FuzzyMatchSpec extends SparkSpec {
  import spark.implicits._

  private def people = Seq(
    (1L, "jonathan smith", "A"),
    (2L, "jonathan smyth", "A"), // dist 1 from #1
    (3L, "jonathon smythe", "A"), // dist 2 from #2, dist 3 from #1
    (4L, "jonathan smith", "A"), // exact dup of #1
    (5L, "maria garcia", "B"),
    (6L, "mario garcia", "B"), // dist 1 from #5
    (7L, "jonathan smith", "B") // same name as #1 but different block
  ).toDF("id", "name", "blk")

  test("pairs only within a block, within the distance band, emitted once") {
    val out = FuzzyMatch.selfMatch(people, "id", "name", col("blk"), maxDist = 2, minDist = 1)
      .select("a_id", "b_id", "dist").as[(Long, Long, Int)].collect().toSet
    // (1,2) d1; (2,3) d2; (2,4) d1; (5,6) d1 — NOT (1,4)/(4,7) exact or cross
    // block, NOT (1,3) d3 past maxDist (threshold'd levenshtein returns -1
    // there and the band filter drops it)
    assert(out == Set((1L, 2L, 1), (2L, 3L, 2), (2L, 4L, 1), (5L, 6L, 1)))
  }

  test("minDist = 0 admits exact duplicates; each pair still emitted once") {
    val out = FuzzyMatch.selfMatch(people, "id", "name", col("blk"), maxDist = 1, minDist = 0)
      .select("a_id", "b_id", "dist").as[(Long, Long, Int)].collect().toSet
    assert(out == Set((1L, 2L, 1), (2L, 4L, 1), (1L, 4L, 0), (5L, 6L, 1)))
  }

  test("inverted band rejected") {
    intercept[IllegalArgumentException] {
      FuzzyMatch.selfMatch(people, "id", "name", col("blk"), maxDist = 1, minDist = 2)
    }
  }

  test("sortedNeighborhood: pairs come from sort adjacency, not key equality") {
    // sorted by name: anna(5) < anne(6) < bob(1) < bobb(2) < bpbb(3) < zed(4)
    val df = Seq(
      (1L, "bob"), (2L, "bobb"), (3L, "bpbb"), (4L, "zed"), (5L, "anna"), (6L, "anne")
    ).toDF("id", "name")
    val out = FuzzyMatch.sortedNeighborhood(df, "id", "name",
      sortCols = Seq("name"), windowSize = 3, maxDist = 2, minDist = 1)
      .select("a_id", "b_id", "gap", "dist").as[(Long, Long, Int, Int)].collect().toSet
    // window 3 → gaps 1..2 over sort positions; band [1,2]:
    //  anna-anne d1 g1; anna-bob d? (4) out; anne-bob d3 out (threshold -1);
    //  bob-bobb d1 g1; bob-bpbb d2 g2; bobb-bpbb d1 g1; bpbb-zed d4 out
    assert(out == Set((5L, 6L, 1, 1), (1L, 2L, 1, 1), (1L, 3L, 2, 2), (2L, 3L, 1, 1)))
  }

  test("sortedNeighborhood: windowSize bounds candidate gap") {
    val df = Seq((1L, "aaaa"), (2L, "aaab"), (3L, "aaba"), (4L, "abaa")).toDF("id", "name")
    val wide = FuzzyMatch.sortedNeighborhood(df, "id", "name", Seq("name"), windowSize = 4,
      maxDist = 3, minDist = 1)
    assert(wide.count() == 6) // all C(4,2) pairs within gap<=3, dist<=3
    val narrow = FuzzyMatch.sortedNeighborhood(df, "id", "name", Seq("name"), windowSize = 2,
      maxDist = 3, minDist = 1)
    assert(narrow.select("a_id", "b_id").as[(Long, Long)].collect().toSet ==
      Set((1L, 2L), (2L, 3L), (3L, 4L)))
  }
}

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private def rows = Seq(
    // (zip, age_band, diagnosis)
    ("02138", "20s", "flu"), ("02138", "20s", "flu"), ("02138", "20s", "flu"),
    ("02139", "30s", "flu"), ("02139", "30s", "cold"), ("02139", "30s", "covid"),
    ("02140", "40s", "flu")
  ).toDF("zip", "age_band", "diagnosis")

  test("k-anonymity and l-diversity violations are flagged per equivalence class") {
    val out = graft.operators.Privacy.violations(rows, Seq("zip", "age_band"), k = 3,
      sensitiveCol = Some("diagnosis"), l = 2)
      .select("zip", "group_size", "distinct_sensitive", "k_violation", "l_violation")
      .as[(String, Long, Long, Boolean, Boolean)].collect().map(r => r._1 -> r).toMap
    // 02138: size 3 (k ok) but 1 diagnosis → l violation only
    assert(out("02138") == ("02138", 3L, 1L, false, true))
    // 02139: size 3, 3 diagnoses → compliant, absent
    assert(!out.contains("02139"))
    // 02140: size 1 → both violations
    assert(out("02140") == ("02140", 1L, 1L, true, true))
  }

  test("without a sensitive column only k-anonymity is checked") {
    val out = graft.operators.Privacy.violations(rows, Seq("zip"), k = 4)
      .select("zip", "group_size", "l_violation").as[(String, Long, Boolean)].collect()
    assert(out.map(r => (r._1, r._2)).toSet == Set(("02138", 3L), ("02139", 3L), ("02140", 1L)))
    assert(out.forall(!_._3))
  }

  test("dpCounts: deterministic across layouts and reruns, noise scales as 1/epsilon, clamped at 0") {
    val big = (1 to 500).map(i => (s"g${i % 50}", i)).toDF("g", "x")
    def release(eps: Double, seed: Long, parts: Int) =
      graft.operators.Privacy.dpCounts(big.repartition(parts), Seq("g"), eps, seed)
        .as[(String, Long)].collect().toMap
    // keyed randomness: identical release on rerun AND on a different layout
    assert(release(0.5, 7L, 2) == release(0.5, 7L, 11))
    // a different seed draws different noise somewhere
    assert(release(0.5, 7L, 4) != release(0.5, 8L, 4))
    // 1/eps scaling: mean absolute deviation from the true count (10 per
    // group) shrinks by ~20x from eps=0.1 to eps=2 (clamping mutes the
    // low-eps side, so assert a loose but real separation)
    def mad(eps: Double) = release(eps, 7L, 4).values.map(v => math.abs(v - 10.0)).sum / 50.0
    assert(mad(0.1) > mad(2.0) * 4, s"mad(0.1)=${mad(0.1)} mad(2.0)=${mad(2.0)}")
    // tight noise at high eps: every released count near truth
    assert(release(20.0, 7L, 4).values.forall(v => math.abs(v - 10L) <= 1))
    // clamping: tiny groups + huge noise never release negatives
    assert(release(0.01, 7L, 4).values.forall(_ >= 0L))
  }

  test("dpCounts: boundary-ambiguous group keys draw INDEPENDENT noise (no shared draw leaks)") {
    // ("ab","c") vs ("a","bc") collide under any separator-concat key image;
    // a shared draw makes the two released counts' difference noise-free
    val df = (Seq.fill(40)(("ab", "c")) ++ Seq.fill(40)(("a", "bc"))).toDF("g1", "g2")
    val out = graft.operators.Privacy.dpCounts(df, Seq("g1", "g2"), epsilon = 0.3, seed = 5L)
      .as[(String, String, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    // equal true counts + independent noise: released values differ (a
    // shared draw would force exact equality for ANY seed — check several)
    val diverged = (1L to 6L).exists { seed =>
      val o = graft.operators.Privacy.dpCounts(df, Seq("g1", "g2"), 0.3, seed)
        .as[(String, String, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
      o(("ab", "c")) != o(("a", "bc"))
    }
    assert(diverged, s"boundary-colliding keys always released identical counts: $out")
  }

  test("selfMatch collapse path ≡ direct path, minDist 0 and 1, nulls included") {
    import spark.implicits._
    val df = Seq(
      (1L, "Customer#01", "b1"), (2L, "Customer#01", "b1"),   // clones, same block
      (3L, "Customer#02", "b1"), (4L, "Customer#99", "b1"),   // near + far
      (5L, "Customer#01", "b2"),                              // same name, other block
      (6L, null.asInstanceOf[String], "b1"), (7L, "Customer#03", null.asInstanceOf[String])
    ).toDF("id", "name", "blk")
    for (minD <- Seq(0, 1)) {
      val a = graft.operators.FuzzyMatch.selfMatch(df, "id", "name", col("blk"),
        maxDist = 2, minDist = minD).orderBy("a_id", "b_id").collect()
      val b = graft.operators.FuzzyMatch.selfMatch(df, "id", "name", col("blk"),
        maxDist = 2, minDist = minD, collapseIdentical = false)
        .orderBy("a_id", "b_id").collect()
      assert(a.length == b.length && (minD == 1 || a.nonEmpty),
        s"minDist=$minD counts: ${a.length} vs ${b.length}")
      a.zip(b).foreach { case (x, y) => assert(x == y, s"minDist=$minD diverged: $x vs $y") }
    }
  }
}
