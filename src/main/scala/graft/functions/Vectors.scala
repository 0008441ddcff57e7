package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math as Column expressions built from higher-order functions
  * (`zip_with`/`aggregate`), i.e. no UDFs — these evaluate inside codegen'd
  * projections and distribute trivially (pure row-local compute).
  *
  * Embeddings are `ARRAY<FLOAT>` on disk (reference: terraform/core/main.tf:529);
  * math is done in double, accumulated left-to-right, which matches DuckDB's
  * `list_dot_product` on `DOUBLE[]` bit-for-bit — letting the oracle verify
  * cosine rankings exactly.
  */
object Vectors {

  def toDoubleArr(v: Column): Column = transform(v, _.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(toDoubleArr(a), toDoubleArr(b), _ * _), lit(0.0), _ + _)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity — native Catalyst expression with a fused, allocation-
    * free codegen loop (graft.plans.CosineSimilarity). Bit-identical to
    * [[cosineHof]]; ~2× faster on the knn hot path.
    */
  def cosine(a: Column, b: Column): Column = graft.plans.CosineSimilarity(a, b)

  /** Composable-functions formulation of cosine (zip_with + aggregate) — kept
    * as the cross-check reference for the native expression.
    */
  def cosineHof(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** L2 normalization to the unit sphere — native fused expression
    * (graft.plans.L2Normalize): the HOF form `transform(v, x / norm(v))`
    * re-evaluates the norm PER ELEMENT once CollapseProject inlines it
    * (the documented O(d²) trap); the native expression is one two-pass
    * loop. Zero vectors pass through unchanged (no direction, no NaN).
    */
  def l2Normalize(v: Column): Column = graft.plans.L2Normalize(v)

  /** Mean pooling ARRAY<ARRAY<FLOAT>> → ARRAY<FLOAT> (token embeddings to a
    * document embedding); native expression, null tokens skipped, all-null
    * pools to NULL, ragged inputs fail loudly.
    */
  def meanPool(vs: Column): Column = graft.plans.MeanPool(vs)

  /** Squared L2 distance, same codegen-friendly shape. */
  def l2sq(a: Column, b: Column): Column = {
    val d = zip_with(toDoubleArr(a), toDoubleArr(b), (x, y) => x - y)
    aggregate(transform(d, x => x * x), lit(0.0), _ + _)
  }

  /** Johnson–Lindenstrauss random projection to `outDim` dims with a sparse
    * ±1 matrix (Achlioptas 2003 — database-friendly random projections): the
    * 100 TB scan-bandwidth lever for embedding pipelines (64→16 dims = 4×
    * less shuffle/storage for ANN candidate generation, with pairwise
    * distances preserved to 1±ε whp). Row-local codegen HOFs, zero shuffle.
    *
    * The projection entry sign(j,k) is a deterministic integer mix
    * (((j·73856093 + k·19349663) mod 1000003) mod 2 → ±1) rather than a
    * seeded PRNG so any engine — and the DuckDB oracle — reproduces the
    * matrix from the formula alone. Accumulation is double, left-to-right,
    * scaled by 1/√outDim (exact for power-of-4 dims, e.g. 16 → 0.25) and
    * `+0.0`-normalised so signed zeros can't diverge across engines.
    */
  def jlProject(v: Column, outDim: Int): Column = {
    require(outDim >= 1, s"outDim must be >= 1, got $outDim")
    // Imperative kernel (the 18th documented UDF kernel): the HOF form
    // below is outDim × |v| interpreted lambda steps per row — ~5·10⁸ at
    // sf1's 500k × 64→16 (q90 measured 10.4 s; 3.2 s with this loop).
    // Same arithmetic in the same order: elements cast to double, sign from
    // the (j, k) integer mix, left-to-right accumulation, ·scale, +0.0 —
    // [[jlProjectHof]] stays as the cross-check reference (PropertySpec
    // pins bit-equality) and the null algebra matches it exactly: NULL v
    // and empty v → zeros, a null ELEMENT → every output dim null (a
    // corrupt embedding must stay visibly null, not become the zero
    // vector).
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    val n = outDim
    val u = udf { arr: Seq[java.lang.Double] =>
      if (arr == null) Array.fill[java.lang.Double](n)(0.0)
      else if (arr.exists(_ == null)) Array.fill[java.lang.Double](n)(null)
      else {
        val a = arr
        val out = new Array[java.lang.Double](n)
        var k = 0
        while (k < n) {
          var s = 0.0
          var j = 0
          while (j < a.length) {
            val sign = if ((j * 73856093L + k * 19349663L) % 1000003L % 2 == 0) 1.0 else -1.0
            s += a(j).doubleValue() * sign
            j += 1
          }
          out(k) = s * scale + 0.0
          k += 1
        }
        out
      }
    }
    u(transform(v, x => x.cast("double")))
  }

  /** Composable-HOF formulation of [[jlProject]] — the cross-check
    * reference for the imperative kernel (PropertySpec pins bit-equality).
    * Do NOT use on hot paths: the fold is interpreted per element per
    * output dim.
    */
  private[graft] def jlProjectHof(v: Column, outDim: Int): Column = {
    require(outDim >= 1, s"outDim must be >= 1, got $outDim")
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    transform(sequence(lit(0), lit(outDim - 1)), k =>
      when(size(v) > 0,
        aggregate(v,
          struct(lit(0.0).as("s"), lit(0L).as("j")),
          (acc, x) => struct(
            (acc.getField("s") + x.cast("double") *
              when(((acc.getField("j") * lit(73856093L) + k.cast("long") * lit(19349663L)) % 1000003L % 2) === 0,
                lit(1.0)).otherwise(lit(-1.0))).as("s"),
            (acc.getField("j") + 1L).as("j")),
          acc => acc.getField("s") * lit(scale) + lit(0.0)))
        .otherwise(lit(0.0)))
  }

  /** Symmetric per-vector int8 quantization: scale = max|x| / 127,
    * q_i = floor(x_i/scale + 0.5) as TINYINT — the storage/bandwidth lever
    * for embedding tables (4× smaller than FLOAT, the standard serving-side
    * compression ahead of PQ). Returns STRUCT(scale DOUBLE, q ARRAY<TINYINT>).
    *
    * floor(x + 0.5) is written out instead of round() because both engines
    * (and the DuckDB oracle) define it identically — round()'s half-even vs
    * half-away tie rules differ across engines. By construction |x_i/scale|
    * ≤ 127 so no clamp is needed (the extremes land on ±127 exactly). A zero
    * or empty vector quantizes to scale 0 with all-zero codes.
    *
    * Cosine over int8 codes needs NO dequantization: the two scales cancel,
    * so [[int8Cosine]] ranks identically to cosine over `q` directly —
    * quantization error comes only from the rounding, not the arithmetic.
    */
  def int8Quantize(v: Column): Column = graft.plans.Int8Quantize(v)

  /** Composable-functions formulation of [[int8Quantize]] — kept as the
    * cross-check reference for the native expression. Do NOT use on hot
    * paths: `absmax` inlines into the code lambda under CollapseProject and
    * re-evaluates per element — the same O(d²) trap [[l2Normalize]] documents
    * (measured 21 s vs sub-second to quantize 20k×64-dim at sf1).
    */
  private[graft] def int8QuantizeHof(v: Column): Column = {
    val absmax = array_max(transform(v, x => abs(x.cast("double"))))
    val scale = when(absmax > 0, absmax / lit(127.0)).otherwise(lit(0.0))
    struct(
      scale.as("scale"),
      transform(v, x =>
        when(absmax > 0, floor(x.cast("double") / scale + lit(0.5)).cast("tinyint"))
          .otherwise(lit(0).cast("tinyint"))).as("q"))
  }

  /** Cosine similarity over two int8 code arrays (scales cancel — see
    * [[int8Quantize]]); fused native kernel over the bytes directly
    * (graft.plans.Int8Cosine) — bit-identical to casting codes to float and
    * running [[cosine]], without the two per-pair array copies.
    */
  def int8Cosine(qa: Column, qb: Column): Column = graft.plans.Int8Cosine(qa, qb)

  /** Reconstruct the float vector from (scale, q) — for consumers that need
    * magnitudes (dot products, L2), where the scale does NOT cancel.
    */
  def int8Dequantize(quantized: Column): Column =
    transform(quantized.getField("q"),
      x => (x.cast("double") * quantized.getField("scale")).cast("float"))
}
