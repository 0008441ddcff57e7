package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("picks the latest right row at-or-before each left time, per key") {
    import spark.implicits._
    val events = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // between r1 and r2
      (2L, 10L, ts("2024-01-01 12:00:00")), // exactly at r2 (<= includes it)
      (3L, 10L, ts("2024-01-01 23:00:00")), // after r2
      (4L, 20L, ts("2024-01-01 10:00:00")), // key with no rights: dropped
      (5L, 30L, ts("2024-01-01 00:00:00"))) // before the only right: dropped
      .toDF("event_id", "k", "t")
    val state = Seq(
      (10L, ts("2024-01-01 09:00:00"), "r1"),
      (10L, ts("2024-01-01 12:00:00"), "r2"),
      (30L, ts("2024-01-01 05:00:00"), "r3"))
      .toDF("rk", "rt", "payload")

    val out = AsOfJoin(events, state, "k", "rk", "t", "rt", Seq("payload"))
      .orderBy("event_id")
      .select("event_id", "payload").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "r1"), (2L, "r2"), (3L, "r2")))
  }

  test("matches the naive max-per-group formulation on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val left = (1 to 400).map(i =>
      (i.toLong, (rnd.nextInt(5) + 1).toLong, new Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L)))
      .toDF("event_id", "k", "t")
    val right = (1 to 60).map(i =>
      ((rnd.nextInt(6) + 1).toLong, new Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L), i.toLong))
      .distinct.toDF("rk", "rt", "rid")
      // AsOfJoin contract: unique (key, time) on the right
      .groupBy("rk", "rt").agg(max("rid").as("rid"))

    val fast = AsOfJoin(left, right, "k", "rk", "t", "rt", Seq("rid"))
      .select("event_id", "rid").as[(Long, Long)].collect().toMap

    val naive = left.join(right, col("k") === col("rk") && col("rt") <= col("t"))
      .groupBy("event_id")
      .agg(max_by(col("rid"), struct(col("rt"), col("rid"))).as("rid"))
      .select("event_id", "rid").as[(Long, Long)].collect().toMap

    assert(fast == naive)
    assert(fast.nonEmpty)
  }

  test("null payload fields never stitch values from different right rows") {
    import spark.implicits._
    // R1(a=1, b=2) then R2(a=null, b=3): a left row after R2 must see R2 whole
    // — (null, 3) — not (1, 3); and a null in the FIRST payload column must
    // not drop the match
    val right = Seq(
      (10L, ts("2024-01-01 01:00:00"), Option(1L), Option(2L)),
      (10L, ts("2024-01-01 02:00:00"), Option.empty[Long], Option(3L)))
      .toDF("rk", "rt", "a", "b")
    val left = Seq((100L, 10L, ts("2024-01-01 03:00:00"))).toDF("event_id", "k", "t")
    val out = AsOfJoin(left, right, "k", "rk", "t", "rt", Seq("a", "b")).collect()
    assert(out.length == 1, "a null first payload column must not drop the match")
    assert(out.head.isNullAt(out.head.fieldIndex("a")))
    assert(out.head.getAs[Long]("b") == 3L)
  }

  test("plan: no join node at all — union + one window exchange") {
    import spark.implicits._
    val left = Seq((1L, 10L, ts("2024-01-01 10:00:00"))).toDF("event_id", "k", "t")
    val right = Seq((10L, ts("2024-01-01 09:00:00"), "r1")).toDF("rk", "rt", "payload")
    val plan = AsOfJoin(left, right, "k", "rk", "t", "rt", Seq("payload"))
      .queryExecution.executedPlan.toString
    // the scale contract: |L|+|R| through one hash exchange, zero replication
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    assert(plan.contains("Union"), plan)
    assert("hashpartitioning".r.findAllIn(plan).size >= 1)
  }
}
