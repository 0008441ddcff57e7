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
}
