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
}
