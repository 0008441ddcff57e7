package graft

import graft.llmops.Retrieval

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def list(rows: (Long, Long, Long)*) =
    rows.toSeq.toDF("query_id", "doc_id", "rank")

  test("rrf: standard two-list fusion with overlap and singletons") {
    val a = list((1L, 10L, 1L), (1L, 11L, 2L))
    val b = list((1L, 11L, 1L), (1L, 12L, 2L))
    val out = Retrieval.rrf(Seq(a, b)).orderBy("rank")
      .as[(Long, Long, Double, Long)].collect()
    val e10 = 1.0 / 61.0
    val e11 = 1.0 / 62.0 + 1.0 / 61.0
    val e12 = 1.0 / 62.0
    assert(out.map(r => (r._2, r._3, r._4)).toSeq ==
      Seq((11L, e11, 1L), (10L, e10, 2L), (12L, e12, 3L)))
  }

  test("rrf: tied scores break on doc_id; k caps output") {
    // same rank in one list each → identical scores
    val a = list((1L, 20L, 1L), (1L, 30L, 2L), (1L, 40L, 3L))
    val b = list((1L, 30L, 1L), (1L, 20L, 2L), (1L, 40L, 3L))
    val out = Retrieval.rrf(Seq(a, b), k = 2).orderBy("rank")
      .as[(Long, Long, Double, Long)].collect()
    assert(out.length == 2)
    assert(out(0)._2 == 20L && out(1)._2 == 30L) // equal scores → lower id first
    assert(out(0)._3 == out(1)._3)
  }

  test("rrf: three lists fold in list order; queries don't mix") {
    val a = list((1L, 10L, 1L), (2L, 10L, 1L))
    val b = list((1L, 10L, 2L))
    val c = list((1L, 10L, 4L), (2L, 99L, 1L))
    val out = Retrieval.rrf(Seq(a, b, c)).as[(Long, Long, Double, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out((1L, 10L)) == 1.0 / 61.0 + 1.0 / 62.0 + 1.0 / 64.0)
    assert(out((2L, 10L)) == 1.0 / 61.0 + 0.0 + 0.0)
    assert(out((2L, 99L)) == 0.0 + 0.0 + 1.0 / 61.0)
  }

  test("rrf: empty list seq rejected") {
    intercept[IllegalArgumentException] { Retrieval.rrf(Seq.empty) }
  }
}
