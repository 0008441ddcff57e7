package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}

/** Native L2 normalization over ARRAY<FLOAT> — project to the unit sphere.
  *
  * The embedding-pipeline staple ahead of cosine ANN (normalized vectors turn
  * cosine into dot product and make IVF/LSH bucket geometry sane). A
  * HOF formulation (`transform(v, x -> x / norm(v))`) hits the documented
  * re-evaluation trap: CollapseProject inlines the derived `norm(v)` into the
  * lambda and the aggregate re-runs PER ELEMENT — O(d²) per row (BASELINE.md,
  * HOF perf trap). This expression is one fused two-pass loop per row with a
  * single output allocation; codegen'd, null-intolerant.
  *
  * Numerics: squares accumulate left-to-right in double (matching a DuckDB
  * `list_reduce` left fold bit-for-bit), `sqrt` and the divide are IEEE
  * exact-rounded, the final narrow to float is exact-rounded — so the oracle
  * hash-matches. A zero (or all-zero) vector has no direction: it returns
  * unchanged rather than NaN-ing, and the oracle encodes the same rule.
  */
case class L2Normalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"l2_normalize expects ARRAY<FLOAT>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "l2_normalize"

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) { val xi = x.getFloat(i).toDouble; ss += xi * xi; i += 1 }
    val nrm = math.sqrt(ss)
    val out = new Array[Float](n)
    i = 0
    while (i < n) {
      out(i) = if (nrm > 0.0) (x.getFloat(i).toDouble / nrm).toFloat else x.getFloat(i)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val ss = ctx.freshName("ss")
      val nrm = ctx.freshName("nrm")
      val xi = ctx.freshName("xi")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |double $ss = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.getFloat($i);
         |  $ss += $xi * $xi;
         |}
         |double $nrm = java.lang.Math.sqrt($ss);
         |float[] $out = new float[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = $nrm > 0.0 ? (float) (((double) $a.getFloat($i)) / $nrm) : $a.getFloat($i);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object L2Normalize {
  def apply(v: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(L2Normalize(Bridge.expression(v)))
  }
}

/** Native mean pooling over ARRAY<ARRAY<FLOAT>> — token embeddings to one
  * document embedding, the standard sentence-embedding reduction.
  *
  * One fused loop (tokens outer, dims inner, double accumulators per dim);
  * per-dim addition order is token order, matching a DuckDB left fold for the
  * oracle. NULL token entries are skipped (they carry no vector); an input
  * with no usable tokens pools to NULL (no direction to report). Dimensions
  * follow the FIRST token's vector; ragged inputs fail loudly rather than
  * silently truncate.
  *
  * CodegenFallback is deliberate here: the row cost is the O(tokens·dims)
  * accumulation loop itself — already a tight primitive-array walk in
  * nullSafeEval — so interpreter dispatch is noise, unlike the per-element
  * scalar kernels where fusion matters (CosineSimilarity/L2Normalize).
  */
case class MeanPool(child: Expression) extends UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(ArrayType(FloatType, _), _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mean_pool expects ARRAY<ARRAY<FLOAT>>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "mean_pool"

  override def nullSafeEval(v: Any): Any = {
    val rows = v.asInstanceOf[ArrayData]
    val nRows = rows.numElements()
    var acc: Array[Double] = null
    var cnt = 0
    var r = 0
    while (r < nRows) {
      if (!rows.isNullAt(r)) {
        val vec = rows.getArray(r)
        if (acc == null) acc = new Array[Double](vec.numElements())
        if (vec.numElements() != acc.length)
          throw new IllegalArgumentException(
            s"mean_pool: ragged input — vector $r has ${vec.numElements()} dims, expected ${acc.length}")
        var d = 0
        while (d < acc.length) { acc(d) += vec.getFloat(d).toDouble; d += 1 }
        cnt += 1
      }
      r += 1
    }
    if (cnt == 0) null
    else {
      val out = new Array[Float](acc.length)
      var d = 0
      while (d < acc.length) { out(d) = (acc(d) / cnt).toFloat; d += 1 }
      UnsafeArrayData.fromPrimitiveArray(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MeanPool {
  def apply(v: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(MeanPool(Bridge.expression(v)))
  }
}
