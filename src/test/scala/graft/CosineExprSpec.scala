package graft

import org.apache.spark.sql.functions._

import graft.functions.Vectors
import graft.plans.CosineSimilarity

class CosineExprSpec extends SparkSpec {

  test("native expression is bit-identical to the HOF formulation on real embeddings") {
    val emb = graft.core.Tables(spark, sfDir, "embeddings")
    val pairs = emb.limit(50).select(col("vec_id").as("ida"), col("embedding").as("a"))
      .crossJoin(emb.limit(50).select(col("vec_id").as("idb"), col("embedding").as("b")))
    val diff = pairs.select(
      CosineSimilarity(col("a"), col("b")).as("native"),
      Vectors.cosineHof(col("a"), col("b")).as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(diff.count() == 0, "native and HOF cosine must agree bit-for-bit")
  }

  test("SQL registration via GraftExtensions FunctionRegistry path") {
    // register into the live session's registry (same builder the extension uses)
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
    org.apache.spark.sql.graft.Bridge // touch the bridge package
    spark.sessionState.functionRegistry.registerFunction(
      new FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1)))
    graft.core.Tables(spark, sfDir, "embeddings").limit(5).createOrReplaceTempView("emb_v")
    val r = spark.sql(
      "SELECT cosine_similarity(a.embedding, a.embedding) AS c FROM emb_v a").collect()
    assert(r.forall(x => math.abs(x.getDouble(0) - 1.0) < 1e-9))
  }

  test("type checking rejects non-float arrays") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0), Array(1.0, 2.0))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(CosineSimilarity(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("cosine") || e.getMessage.contains("ARRAY<FLOAT>"))
  }

  test("jlProject: exact basis-vector norms, approximate distance preservation") {
    import spark.implicits._
    // ±1 matrix scaled by 1/√16 = 0.25: every basis vector maps to a vector of
    // EXACTLY unit norm (16 · 0.25² = 1, all doubles exact)
    val basis = (0 until 64).map(i => (i.toLong, Array.tabulate(64)(j => if (j == i) 1.0f else 0.0f)))
    val pb = basis.toDF("id", "v")
      .select(col("id"), Vectors.jlProject(col("v"), 16).as("p")).collect()
      .map(r => r.getSeq[Double](1)).toSeq
    pb.foreach { p =>
      assert(p.length == 16)
      assert(p.map(x => x * x).sum == 1.0) // exact, not approximate
    }
    // distance preservation on real embeddings: JL with 16 dims is coarse, so
    // assert a loose-but-meaningful band on pairwise L2 ratios
    val emb = graft.core.Tables(spark, sfDir, "embeddings").limit(12)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getSeq[Float](1).map(_.toDouble).toArray)
    def proj(v: Array[Double]): Array[Double] =
      Array.tabulate(16)(k => 0.25 * v.indices.map(j =>
        v(j) * (if (((j.toLong * 73856093L + k.toLong * 19349663L) % 1000003L) % 2 == 0) 1.0 else -1.0)).sum)
    def l2(a: Array[Double], b: Array[Double]): Double =
      math.sqrt(a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum)
    val ratios = for {
      i <- emb.indices; j <- emb.indices if i < j
      d = l2(emb(i), emb(j)) if d > 1e-9
    } yield l2(proj(emb(i)), proj(emb(j))) / d
    assert(ratios.nonEmpty)
    assert(ratios.forall(r => r > 0.2 && r < 2.2),
      s"JL distance ratios out of band: min=${ratios.min} max=${ratios.max}")
  }
}
