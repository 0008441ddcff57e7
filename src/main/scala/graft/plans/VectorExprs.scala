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

/** Native symmetric int8 quantization: ARRAY<FLOAT> →
  * STRUCT<scale: DOUBLE, q: ARRAY<TINYINT>>, scale = max|x|/127,
  * code = floor(x/scale + 0.5) (the all-zero vector quantizes to scale 0,
  * all-zero codes).
  *
  * The HOF formulation hit the documented re-evaluation trap at its worst:
  * `absmax` (itself an O(d) transform + array_max) appears inside the code
  * lambda, so CollapseProject inlining re-ran it PER ELEMENT — O(d²) work and
  * ~2d transient arrays per row (measured 21 s to quantize 20k×64-dim at sf1;
  * this expression: two plain passes, one output allocation). Double math is
  * kept operation-for-operation identical to the HOF form — abs/max in
  * double, one divide by the shared scale, floor(+0.5), narrow to byte — so
  * the q135 oracle still hashes and codes stay in [-127, 127].
  *
  * CodegenFallback for the MeanPool reason: the row cost IS the two-pass
  * primitive loop; per-row interpreter dispatch is noise.
  */
case class Int8Quantize(child: Expression) extends UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.types.{ByteType, DoubleType, StructField, StructType}

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"int8_quantize expects ARRAY<FLOAT>, got ${other.simpleString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("q", ArrayType(ByteType, containsNull = false), nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "int8_quantize"

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    var absmax = Double.NegativeInfinity
    var i = 0
    while (i < n) {
      // fail LOUDLY on NaN / null elements: Java's `>` skips NaN where the
      // spec-pinned HOF twin's array_max treats NaN as greatest (and ANSI
      // cast then errors), and ArrayData.getFloat silently reads a null slot
      // as 0.0f — either input would make the two paths diverge, so neither
      // is a valid embedding here
      if (x.isNullAt(i))
        throw new IllegalArgumentException(
          s"int8_quantize: null element at index $i — not a valid embedding")
      val f = x.getFloat(i)
      if (java.lang.Float.isNaN(f) || java.lang.Float.isInfinite(f))
        throw new IllegalArgumentException(
          s"int8_quantize: non-finite element at index $i — not a valid embedding")
      val a = math.abs(f.toDouble)
      if (a > absmax) absmax = a
      i += 1
    }
    val out = new Array[Byte](n)
    val scale = if (n > 0 && absmax > 0.0) {
      val s = absmax / 127.0
      i = 0
      while (i < n) {
        out(i) = math.floor(x.getFloat(i).toDouble / s + 0.5).toLong.toByte
        i += 1
      }
      s
    } else 0.0
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](scale, UnsafeArrayData.fromPrimitiveArray(out)))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Int8Quantize {
  def apply(v: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(Int8Quantize(Bridge.expression(v)))
  }
}

/** Native cosine over int8 CODE arrays — the scale-cancelling knn hot-path
  * kernel ([[graft.functions.Vectors.int8Quantize]]). Same fused
  * zero-allocation loop as [[CosineSimilarity]]; byte → double widening is
  * exact, so it is bit-identical to casting the codes to float and running
  * the float kernel (the previous formulation — which allocated two
  * transformed copies per PAIR on the O(queries·corpus) join).
  */
case class Int8Cosine(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  import org.apache.spark.sql.types.{ByteType, DoubleType}

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(ByteType, _), ArrayType(ByteType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"int8_cosine expects two ARRAY<TINYINT> arguments, got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "int8_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xi = x.getByte(i).toDouble
      val yi = y.getByte(i).toDouble
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
         |  double $xi = (double) $a.getByte($i);
         |  double $yi = (double) $b.getByte($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Int8Cosine {
  def apply(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(Int8Cosine(Bridge.expression(a), Bridge.expression(b)))
  }
}
