package graft

import org.apache.spark.sql.functions._

import graft.llmops.Packing

class PackingSpec extends SparkSpec {

  test("packSequences: contiguous pieces, full sequences, short tail only") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c"),            // 3 toks
      (2L, ""),                 // 0 toks — must vanish
      (3L, "d e f g h i j"),    // 7 toks — crosses the 8-token boundary? no: 3+7=10 → splits at 8
      (4L, null.asInstanceOf[String]), // 0 toks
      (5L, (1 to 20).map(i => s"t$i").mkString(" ")), // 20 toks — spans 3+ sequences
      (6L, "x")                 // 1 tok
    ).toDF("doc_id", "text")
    val m = Packing.packSequences(docs, "text", "doc_id", seqLen = 8L)
      .orderBy("doc_id", "seq_id").collect()

    // empty docs appear nowhere
    assert(!m.exists(r => r.getLong(0) == 2L || r.getLong(0) == 4L))

    // per-doc pieces are contiguous in doc_start and sum to n_tokens
    m.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(2)) // by seq_id
      val total = sorted.map(_.getAs[Long]("piece_len")).sum
      assert(total == sorted.head.getAs[Long]("n_tokens"))
      var expectDocStart = 0L
      sorted.foreach { r =>
        assert(r.getAs[Long]("doc_start") == expectDocStart, s"gap in $r")
        expectDocStart += r.getAs[Long]("piece_len")
      }
    }

    // every sequence except the last is exactly full; none exceeds seqLen
    val bySeq = m.groupBy(_.getAs[Long]("seq_id")).view
      .mapValues(_.map(_.getAs[Long]("piece_len")).sum).toMap
    val lastSeq = bySeq.keys.max
    bySeq.foreach { case (s, tot) =>
      if (s < lastSeq) assert(tot == 8L, s"seq $s has $tot tokens")
      else assert(tot <= 8L && tot > 0L)
    }
    // total tokens conserved: 3 + 7 + 20 + 1 = 31 → seqs 0..3, last holds 7
    assert(bySeq.values.sum == 31L && lastSeq == 3L && bySeq(lastSeq) == 7L)

    // pieces tile each sequence without overlap
    m.groupBy(_.getAs[Long]("seq_id")).foreach { case (_, rows) =>
      val spans = rows.map(r => (r.getAs[Long]("seq_start"),
        r.getAs[Long]("seq_start") + r.getAs[Long]("piece_len"))).sortBy(_._1)
      spans.toSeq.sliding(2).foreach {
        case Seq((_, e1), (s2, _)) => assert(e1 == s2, "overlap or gap inside a sequence")
        case _ => ()
      }
      assert(spans.head._1 == 0L)
    }
  }

  test("packSequences is deterministic across partitionings and custom order works") {
    import spark.implicits._
    val docs = (1 to 200).map(i => (i.toLong, ("w " * (i % 7 + 1)).trim)).toDF("doc_id", "text")
    val a = Packing.packSequences(docs, "text", "doc_id", 16L).orderBy("doc_id", "seq_id").collect()
    val b = Packing.packSequences(docs.repartition(13), "text", "doc_id", 16L)
      .orderBy("doc_id", "seq_id").collect()
    assert(a.sameElements(b), "placement must not depend on the input layout")

    // descending order: doc 200 is first — its first piece starts at offset 0
    val d = Packing.packSequences(docs, "text", "doc_id", 16L,
      order = Seq(col("doc_id").desc))
      .filter(col("doc_id") === 200L).orderBy("seq_id").collect()
    assert(d.head.getAs[Long]("seq_id") == 0L && d.head.getAs[Long]("seq_start") == 0L)
  }
}
