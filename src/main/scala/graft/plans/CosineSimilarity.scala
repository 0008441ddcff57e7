package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** Native Catalyst expression for cosine similarity over ARRAY<FLOAT>.
  *
  * The composable formulation (`aggregate(zip_with(...))` in
  * graft.functions.Vectors) is already codegen'd, but materialises two
  * intermediate arrays per row (the casted copies and the product array) and
  * walks the vectors three times (dot, norm-a, norm-b). This expression's
  * doGenCode emits one fused loop with zero allocation — the kernel a knn over
  * a 100 TB corpus spends its time in.
  *
  * Accumulation order (left-to-right, doubles) matches the composable version
  * and DuckDB's list_dot_product bit-for-bit, so swapping it into oracle
  * queries changes nothing but speed.
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"cosine_similarity expects two ARRAY<FLOAT> arguments, got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.getFloat($i);
         |  double $yi = (double) $b.getFloat($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))
  }
}

/** SparkSessionExtensions installer: exposes graft's function surface to SQL.
  * Wire with `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  *
  * `cosine_similarity` is a native expression; the rest are Column-composition
  * functions lifted to Expression builders through the Bridge — they expand to
  * the same codegen'd expression trees the DataFrame API produces.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def lift1(name: String, f: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
  : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = {
    import org.apache.spark.sql.graft.Bridge
    (new FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftExtensions].getName, name),
      (children: Seq[Expression]) => Bridge.resolvedExpression(f(Bridge.column(children.head))))
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))),
    (new FunctionIdentifier("graft_l2_normalize"),
      new ExpressionInfo(classOf[L2Normalize].getName, "graft_l2_normalize"),
      (children: Seq[Expression]) => L2Normalize(children.head)),
    (new FunctionIdentifier("graft_mean_pool"),
      new ExpressionInfo(classOf[MeanPool].getName, "graft_mean_pool"),
      (children: Seq[Expression]) => MeanPool(children.head)),
    (new FunctionIdentifier("graft_int8_quantize"),
      new ExpressionInfo(classOf[Int8Quantize].getName, "graft_int8_quantize"),
      (children: Seq[Expression]) => Int8Quantize(children.head)),
    (new FunctionIdentifier("graft_int8_cosine"),
      new ExpressionInfo(classOf[Int8Cosine].getName, "graft_int8_cosine"),
      (children: Seq[Expression]) => Int8Cosine(children(0), children(1))),
    lift1("graft_quality_score", graft.functions.Text.qualityScore),
    lift1("graft_lang_id", graft.functions.Text.langId),
    lift1("graft_token_count", c => graft.functions.Text.tokenCount(c).cast("long")),
    lift1("graft_hash_bucket", graft.llmops.Curation.hashBucket),
    lift1("graft_money_fmt", graft.functions.Scalars.moneyFmt),
    lift1("graft_clean_text", graft.llmops.Curation.cleanText),
    lift1("graft_normalize_text", graft.llmops.Curation.normalizeText),
    // jl_project's outDim must be a literal (it shapes the output type):
    // SELECT graft_jl_project(embedding, 16) FROM embeddings
    (new FunctionIdentifier("graft_jl_project"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "graft_jl_project"),
      (children: Seq[Expression]) => {
        import org.apache.spark.sql.graft.Bridge
        if (children.length != 2)
          throw new IllegalArgumentException(
            s"graft_jl_project(vec, outDim) takes 2 arguments, got ${children.length}")
        val dim = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_jl_project(vec, outDim): outDim must be an INT literal, got $other")
        }
        Bridge.resolvedExpression(
          graft.functions.Vectors.jlProject(Bridge.column(children.head), dim))
      }))

  /** Register into an already-built session (getOrCreate ignores
    * withExtensions when a session exists in the JVM). Also registers the
    * model-invocation UDFs, which need a live session.
    */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    registerModelUdfs(spark)
  }

  /** ML_PREDICT's SQL form. The reference's `LATERAL TABLE(ML_PREDICT('m', x))`
    * is 1-row-in/1-row-out at every observed call site (SURVEY.md §2.3 J3), so
    * a scalar function is the faithful SQL surface — no parser extension
    * needed: `SELECT ml_predict('local-textgen', text) FROM docs`.
    *
    * The model registry is snapshotted on the DRIVER here and the (Serializable)
    * models ship inside the UDF closure — executors on a real cluster have
    * their own JVM-local ModelCatalog that never saw runtime registrations, so
    * resolving by name inside the task would fail anywhere but local mode.
    * After a `CREATE MODEL` (catalog registration), call this again to refresh
    * the snapshot; graft.sql.SqlFrontend does so automatically.
    */
  def registerModelUdfs(spark: org.apache.spark.sql.SparkSession): Unit = {
    val textgens = graft.ml.ModelCatalog.textGenSnapshot
    val embedders = graft.ml.ModelCatalog.embeddingSnapshot
    spark.udf.register("ml_predict", (model: String, text: String) =>
      textgens.getOrElse(model, sys.error(s"no textgen model '$model'"))
        .generate(Option(text).getOrElse("")))
    spark.udf.register("ml_embed", (model: String, text: String) =>
      embedders.getOrElse(model, sys.error(s"no embedding model '$model'"))
        .embed(Option(text).getOrElse("")))
  }
}
