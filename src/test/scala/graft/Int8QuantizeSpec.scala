package graft

import org.apache.spark.sql.functions._
import graft.functions.Vectors

/** Int8 symmetric quantization: error bound, scale-cancellation in cosine,
  * recall of the quantized knn against exact float knn.
  */
class Int8QuantizeSpec extends SparkSpec {

  test("native Int8Quantize is bit-identical to the HOF reference on real embeddings") {
    val emb = core.Tables(spark, sfDir, "embeddings")
    val both = emb.select(col("vec_id"),
        Vectors.int8Quantize(col("embedding")).as("n"),
        Vectors.int8QuantizeHof(col("embedding")).as("h"))
      .withColumn("same",
        col("n.scale") === col("h.scale") && col("n.q") === col("h.q"))
    assert(both.filter(!col("same")).isEmpty)
    // edge vectors the testdata may not contain: empty and all-zero
    import spark.implicits._
    val edge = Seq((1L, Seq.empty[Float]), (2L, Seq(0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
      .select(Vectors.int8Quantize(col("embedding")).as("n"),
        Vectors.int8QuantizeHof(col("embedding")).as("h"))
      .collect()
    edge.foreach { r =>
      assert(r.getStruct(0).getDouble(0) == 0.0)
      assert(r.getStruct(0) == r.getStruct(1))
    }
  }

  test("reconstruction error is bounded by scale/2 per element; extremes hit ±127") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0f, -2.0f, 0.5f, 127.4f)),
      (2L, Seq(0.0f, 0.0f)),            // zero vector -> scale 0, codes 0
      (3L, Seq(-3.5f))                   // single negative -> code -127
    ).toDF("vec_id", "embedding")
    val out = df.select(col("vec_id"), col("embedding"),
        Vectors.int8Quantize(col("embedding")).as("z"))
      .select(col("vec_id"), col("embedding"), col("z.scale").as("scale"),
        col("z.q").as("q"), Vectors.int8Dequantize(col("z")).as("back"))
      .collect()
    out.foreach { r =>
      val (emb, scale, q, back) = (r.getSeq[Float](1), r.getDouble(2),
        r.getSeq[Byte](3), r.getSeq[Float](4))
      assert(q.length == emb.length && back.length == emb.length)
      emb.zip(back).foreach { case (x, x2) =>
        assert(math.abs(x - x2) <= scale / 2 + 1e-6, s"|$x - $x2| > ${scale / 2}")
      }
      if (r.getLong(0) == 2L) assert(scale == 0.0 && q.forall(_ == 0))
      else assert(q.map(_.toInt).map(math.abs).max == 127,
        "the absmax element must land on +-127 exactly")
    }
  }

  test("quantized cosine ranks without dequantization: recall@3 >= 0.9 vs exact knn") {
    val emb = graft.core.Tables(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 30)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val corpus = emb.select(col("vec_id").as("nid"), col("embedding").as("nv"))
    def topk(sim: org.apache.spark.sql.Column): Map[Long, Set[Long]] = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("sim").desc, col("nid"))
      corpus.join(broadcast(queries), col("qid") =!= col("nid"))
        .select(col("qid"), col("nid"), sim.as("sim"))
        .withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
        .collect().groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    }
    val exact = topk(Vectors.cosine(col("qv"), col("nv")))
    val quant = topk(Vectors.int8Cosine(
      Vectors.int8Quantize(col("qv")).getField("q"),
      Vectors.int8Quantize(col("nv")).getField("q")))
    // .toSeq first: mapping over the Map's keySET would dedupe equal recall
    // values before the sum (a Set[Double] of mostly-1.0s collapses to one)
    val recall = exact.keys.toSeq.map { q =>
      (exact(q) intersect quant.getOrElse(q, Set.empty)).size.toDouble / exact(q).size
    }.sum / exact.size
    assert(recall >= 0.9, s"int8 knn recall@3 $recall below 0.9")
  }

  test("scale cancellation: int8Cosine(q,q') == cosine(dequantized, dequantized') bit-for-bit") {
    import spark.implicits._
    val df = Seq((1L, Seq(0.3f, -1.7f, 2.2f, 0.9f), Seq(1.1f, 0.4f, -0.6f, 2.0f)))
      .toDF("id", "a", "b")
      .select(Vectors.int8Quantize(col("a")).as("za"), Vectors.int8Quantize(col("b")).as("zb"))
    val r = df.select(
      Vectors.int8Cosine(col("za.q"), col("zb.q")).as("codes"),
      Vectors.cosine(Vectors.int8Dequantize(col("za")), Vectors.int8Dequantize(col("zb"))).as("dequant"))
      .head()
    // 1e-6: int8Dequantize narrows through FLOAT, so the two paths differ by
    // one float rounding per element, not bit-zero
    assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-6,
      "scales must cancel: ranking over codes IS ranking over dequantized floats")
  }
}
