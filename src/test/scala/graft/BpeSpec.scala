package graft

import org.apache.spark.sql.functions._

import graft.llmops.Bpe

class BpeSpec extends SparkSpec {

  private def fixture = {
    import spark.implicits._
    (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++ Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
  }

  test("train learns the hand-computed merges in order (weighted, deterministic ties)") {
    val m = Bpe.train(fixture, "text", numMerges = 2)
    // pair counts over {low:5, lower:2, newest:6, widest:3}: (e,s)=9 ties
    // (s,t)=9 -> lexicographic; then (es,t)=9 dominates
    assert(m.map(x => (x.left, x.right)) == Seq(("e", "s"), ("es", "t")))
    val again = Bpe.train(fixture, "text", numMerges = 2)
    assert(m == again, "training must be deterministic")
  }

  test("greedy encode applies merges by rank and always round-trips") {
    val merges = Bpe.train(fixture, "text", numMerges = 50) // runs to convergence
    val ranks = merges.map(x => (x.left, x.right) -> x.rank).toMap
    Seq("newest", "low", "lower", "widest", "unrelated").foreach { w =>
      val pieces = Bpe.encodeWord(w, ranks)
      assert(pieces.mkString == w, s"round trip broken for $w: ${pieces.toSeq}")
    }
    // every training word is frequent enough to fuse into a single token
    Seq("newest", "low", "lower", "widest").foreach { w =>
      assert(Bpe.encodeWord(w, ranks).length == 1, s"$w should be one learned token")
    }
    assert(Bpe.encodeWord("unrelated", ranks).length > 1, "unseen words stay segmented")
  }

  test("encodeStats compresses: words <= bpe tokens <= chars, exact on the fixture") {
    val merges = Bpe.train(fixture, "text", numMerges = 50)
    val out = Bpe.encodeStats(fixture, "text", "doc_id", merges).collect()
    out.foreach { r =>
      val (bpe, words, chars) =
        (r.getAs[Long]("n_bpe_tokens"), r.getAs[Long]("n_words"), r.getAs[Long]("n_chars"))
      assert(words <= bpe && bpe <= chars)
      assert(bpe == words, "fixture words all fuse fully, so bpe == words here")
    }
  }

  test("learned tokenization beats characters on real testdata") {
    val docs = graft.core.Tables(spark, sfDir, "documents")
    val merges = Bpe.train(docs, "text", numMerges = 200)
    assert(merges.nonEmpty)
    val agg = Bpe.encodeStats(docs, "text", "doc_id", merges)
      .agg(sum("n_bpe_tokens").as("bpe"), sum("n_words").as("w"), sum("n_chars").as("c"))
      .collect()(0)
    assert(agg.getAs[Long]("bpe") < agg.getAs[Long]("c"),
      "subwords must compress vs characters")
    assert(agg.getAs[Long]("bpe") >= agg.getAs[Long]("w"))
  }
}
