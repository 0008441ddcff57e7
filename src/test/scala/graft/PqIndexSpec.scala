package graft

import org.apache.spark.sql.functions._

import graft.vector.{KnnJoin, PqIndex}

class PqIndexSpec extends SparkSpec {

  private val dim = 32
  private val m = 8

  /** 160 tight seeded clusters × 5 members: each vector's true top-4 is
    * exactly its 4 cluster mates (intra-cluster cosine ≈ 0.995,
    * inter-cluster ≈ 0 for gaussian centers) — a well-separated ground truth,
    * not a quasi-tie set that quantization noise can legitimately reorder.
    */
  private lazy val corpus: Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(31)
    val centers = Array.fill(160)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    (0 until 800).map { i =>
      val c = centers(i % 160)
      (i.toLong, c.map(x => x + 0.05f * rnd.nextGaussian().toFloat))
    }
  }

  private def corpusDf = {
    import spark.implicits._
    corpus.toDF("nid", "nvec")
  }

  test("training is deterministic and codes compress to m bytes per vector") {
    val cb1 = PqIndex.train(corpusDf, "nvec", m = m, ks = 16, iterations = 3)
    val cb2 = PqIndex.train(corpusDf, "nvec", m = m, ks = 16, iterations = 3)
    assert(cb1.m == cb2.m && cb1.subDim == cb2.subDim)
    cb1.cents.zip(cb2.cents).foreach { case (a, b) =>
      a.zip(b).foreach { case (x, y) => assert(x.sameElements(y)) }
    }
    val enc = PqIndex.encode(corpusDf, "nvec", cb1)
    val lens = enc.select(length(col("pq_code"))).distinct().collect().map(_.getInt(0)).toSeq
    assert(lens == Seq(m), s"every code must be exactly $m bytes, got $lens")
  }

  test("ADC recall is solid and exact rerank recovers near-perfect recall") {
    import spark.implicits._
    val cb = PqIndex.train(corpusDf, "nvec", m = m, ks = 16, iterations = 3)
    val encoded = PqIndex.encode(corpusDf, "nvec", cb)
    val queries = corpus.take(15).map { case (id, v) => (id, v) }.toDF("qid", "qvec")

    val k = 4
    def hits(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("qid", "nid").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }

    val exact = hits(KnnJoin(queries, corpusDf, k))
    val adc = hits(PqIndex.search(queries, "qid", "qvec", encoded, "nid", cb, k))
    val reranked = hits(PqIndex.searchRerank(queries, "qid", "qvec", encoded, "nid", "nvec", cb, k))

    def recall(got: Map[Long, Set[Long]]): Double = {
      val per = exact.map { case (q, want) => (got.getOrElse(q, Set.empty) & want).size.toDouble / want.size }
      per.sum / per.size
    }
    val rAdc = recall(adc)
    val rRe = recall(reranked)
    assert(rAdc >= 0.7, s"ADC recall@$k too low: $rAdc")
    assert(rRe >= 0.95, s"reranked recall@$k too low: $rRe")
    assert(rRe >= rAdc, s"rerank must not lose recall: $rRe vs $rAdc")
  }

  test("zero-norm vectors encode deterministically (no NaN codes)") {
    import spark.implicits._
    val cb = PqIndex.train(corpusDf, "nvec", m = m, ks = 16, iterations = 2)
    val z = Seq((999L, Array.fill(dim)(0f))).toDF("nid", "nvec")
    val code = PqIndex.encode(z, "nvec", cb).select("pq_code").head().getAs[Array[Byte]](0)
    assert(code.length == m)
  }
}
