package graft

import org.apache.spark.sql.functions._

import graft.llmops.Dsir

class DsirSpec extends SparkSpec {

  /** Two planted vocabularies: target-like docs draw from code words,
    * background docs from prose words. */
  private def corpus(n: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    val code = Vector("def", "return", "import", "class", "self", "lambda", "yield", "async")
    val prose = Vector("the", "cat", "sat", "on", "warm", "windowsill", "every", "morning")
    (1 to n).map { i =>
      val isCode = i % 4 == 0 // 25% of raw looks like the target
      val vocab = if (isCode) code else prose
      val text = (1 to 30).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
      (i.toLong, text, isCode)
    }
  }

  test("importance weights recover the planted target distribution") {
    import spark.implicits._
    val raw = corpus(400, 13).toDF("doc_id", "text", "is_code")
    // the target corpus is pure code-vocabulary text (disjoint draw)
    val target = corpus(100, 77).filter(_._3).map(t => (t._1 + 10000, t._2))
      .toDF("doc_id", "text")
    val scored = Dsir.importanceWeights(raw, target, "text", buckets = 512)
    // every code doc must outscore every prose doc
    val byClass = scored.groupBy("is_code")
      .agg(min("avg_log_weight").as("lo"), max("avg_log_weight").as("hi"))
      .collect().map(r => r.getBoolean(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(byClass(true)._1 > byClass(false)._2,
      s"weakest code doc ${byClass(true)._1} <= strongest prose doc ${byClass(false)._2}")

    val kept = Dsir.resampleTopK(scored, "doc_id", k = 100)
    assert(kept.count() == 100)
    val codeIds = raw.filter(col("is_code")).select("doc_id").as[Long].collect().toSet
    val keptIds = kept.select("doc_id").as[Long].collect().toSet
    assert(keptIds == codeIds) // exactly the 100 planted target-like docs
  }

  test("weights are length-normalized and empty docs sink to the bottom") {
    import spark.implicits._
    val raw = Seq((1L, "def return import"), (2L, "def return import def return import"),
      (3L, ""), (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val target = Seq((9L, "def return import class")).toDF("doc_id", "text")
    val s = Dsir.importanceWeights(raw, target, "text", buckets = 64)
      .select("doc_id", "avg_log_weight").as[(Long, Double)].collect().toMap
    assert(math.abs(s(1L) - s(2L)) < 0.7) // same distribution, ~same per-gram score
    assert(s(3L) == Double.NegativeInfinity)
    assert(s(4L) == Double.NegativeInfinity) // null text: zero grams, no NPE
  }
}
