package graft.vector

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Vectors
import graft.operators.TopK

/** Product quantization (PQ) — the memory-compressed ANN path (Jégou et al.,
  * "Product Quantization for Nearest Neighbor Search", TPAMI 2011; the same
  * design FAISS's IVF-PQ indexes use).
  *
  * Each L2-normalized vector is split into `m` subspaces of `dim/m`
  * components; every subspace gets its own `ks`-centroid codebook, and a
  * vector is stored as `m` one-byte codes — 64-dim float (256 B) → 8 B at
  * m=8, a 32× scan-bandwidth reduction. Search is asymmetric distance
  * computation (ADC): the query stays exact, each subspace contributes
  * `dot(query_j, centroid_{j,code_j})` via an m·ks lookup table computed once
  * per query, so a candidate's approximate cosine costs m table lookups
  * instead of dim multiplies.
  *
  * Scale architecture:
  *   - TRAIN on a bounded deterministic sample collected to the driver
  *     (standard practice — codebooks are small-data; FAISS trains on a
  *     sample too). The codebook is m·ks·(dim/m) floats — broadcastable.
  *   - ENCODE distributedly: a row-local UDF over the broadcast codebook;
  *     the corpus never leaves executors.
  *   - SEARCH with the same broadcast-queries + bounded map-side TopKAgg
  *     shape as KnnJoin: shuffle stays O(queries·k) while the corpus side
  *     reads m-byte codes, not full vectors.
  *   - RERANK the ADC top-(k·factor) with exact cosine over the full vectors
  *     of only those candidates (an id equi-join on O(queries·k·factor)
  *     rows) — the classic two-stage recall recovery.
  */
object PqIndex {

  /** cents(j)(c) = centroid c of subspace j (length dim/m each). */
  final case class Codebook(m: Int, ks: Int, subDim: Int,
                            cents: Array[Array[Array[Float]]]) extends Serializable

  private def l2normalize(v: Array[Float]): Array[Float] = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i); i += 1 }
    val n = math.sqrt(s)
    if (n == 0.0) v else v.map(x => (x / n).toFloat)
  }

  /** Train per-subspace codebooks with Lloyd iterations on a deterministic
    * hash-ordered sample. `ks` ≤ 256 (codes are bytes). Vectors are
    * L2-normalized first so ADC dot sums approximate cosine directly.
    */
  def train(corpus: DataFrame, embCol: String, m: Int, ks: Int = 256,
            sampleSize: Int = 8192, iterations: Int = 4): Codebook = {
    require(ks >= 2 && ks <= 256, s"ks must be in [2,256] (codes are bytes), got $ks")
    val sample = corpus.select(col(embCol))
      .withColumn("__h", xxhash64(col(embCol).cast("string")))
      .orderBy("__h").limit(sampleSize)
      .collect().map(r => l2normalize(r.getSeq[Float](0).toArray))
    require(sample.nonEmpty, "PQ training sample is empty")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim must be divisible by m=$m")
    val subDim = dim / m

    val cents = Array.tabulate(m) { j =>
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, j * subDim, (j + 1) * subDim))
      kmeans(sub, math.min(ks, sub.length), iterations)
    }
    Codebook(m, ks, subDim, cents)
  }

  /** Driver-side Lloyd on a (bounded) sample: deterministic init = first k
    * DISTINCT points in the hash order; empty clusters keep their previous
    * centroid (no randomness anywhere).
    */
  private def kmeans(points: Array[Array[Float]], k: Int, iterations: Int): Array[Array[Float]] = {
    val distinct = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
    val seen = scala.collection.mutable.HashSet.empty[Seq[Float]]
    points.foreach { p => if (distinct.size < k && seen.add(p.toSeq)) distinct += p }
    var cents = distinct.toArray
    if (cents.isEmpty) return Array(points.head)
    for (_ <- 1 to iterations) {
      val sums = Array.fill(cents.length)(new Array[Double](points.head.length))
      val counts = new Array[Long](cents.length)
      points.foreach { p =>
        val c = nearestSub(p, cents)
        counts(c) += 1
        var i = 0; while (i < p.length) { sums(c)(i) += p(i); i += 1 }
      }
      cents = cents.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old
        else sums(c).map(x => (x / counts(c)).toFloat)
      }
    }
    cents
  }

  /** Nearest sub-centroid by squared L2 (ties → lowest code, deterministic). */
  private def nearestSub(p: Array[Float], cents: Array[Array[Float]]): Int = {
    var best = 0; var bestD = Double.MaxValue; var c = 0
    while (c < cents.length) {
      var d = 0.0; var i = 0
      val cc = cents(c)
      while (i < p.length) { val t = p(i) - cc(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Distributed encoding: adds a `pq_code` binary column (m bytes/row). */
  def encode(df: DataFrame, embCol: String, cb: Codebook): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(cb)
    val enc = udf((v: Seq[Float]) => {
      val b = bc.value
      val nv = l2normalize(v.toArray)
      val out = new Array[Byte](b.m)
      var j = 0
      while (j < b.m) {
        val sub = java.util.Arrays.copyOfRange(nv, j * b.subDim, (j + 1) * b.subDim)
        out(j) = nearestSub(sub, b.cents(j)).toByte
        j += 1
      }
      out
    })
    df.withColumn("pq_code", enc(col(embCol)))
  }

  /** One codebook broadcast shared by every UDF of a search call — callers
    * broadcast once and hand the handle to [[mkTableUdf]]/[[adcUdf]], instead
    * of each factory shipping (and never freeing) its own copy.
    */
  private[vector] def broadcastCodebook(spark: SparkSession, cb: Codebook)
      : org.apache.spark.broadcast.Broadcast[Codebook] =
    spark.sparkContext.broadcast(cb)

  /** Per-query ADC lookup table UDF (m·ks subspace dots, once per query). */
  private[vector] def mkTableUdf(bc: org.apache.spark.broadcast.Broadcast[Codebook]) = {
    udf((v: Seq[Float]) => {
      val b = bc.value
      val nq = l2normalize(v.toArray)
      val table = new Array[Float](b.m * b.ks)
      var j = 0
      while (j < b.m) {
        var c = 0
        while (c < b.cents(j).length) {
          var d = 0.0; var i = 0
          val cc = b.cents(j)(c)
          while (i < b.subDim) { d += nq(j * b.subDim + i) * cc(i); i += 1 }
          table(j * b.ks + c) = d.toFloat
          c += 1
        }
        j += 1
      }
      table
    })
  }

  /** ADC score UDF: m byte-lookups per candidate. */
  private[vector] def adcUdf(bc: org.apache.spark.broadcast.Broadcast[Codebook]) = {
    udf((table: Seq[Float], code: Array[Byte]) => {
      val b = bc.value
      var s = 0.0; var j = 0
      while (j < b.m) { s += table(j * b.ks + (code(j) & 0xff)); j += 1 }
      s
    })
  }

  /** ADC top-k over an encoded corpus: per-query lookup table (m·ks dots,
    * computed once in a projection over the broadcast query side), then each
    * candidate costs m byte-lookups. Same O(queries·k) shuffle as KnnJoin.
    */
  def search(queries: DataFrame, qidCol: String, qvecCol: String,
             encoded: DataFrame, nidCol: String, cb: Codebook, k: Int): DataFrame = {
    val bc = broadcastCodebook(queries.sparkSession, cb)
    val mkTable = mkTableUdf(bc)
    val adc = adcUdf(bc)
    val q = queries.select(col(qidCol), mkTable(col(qvecCol)).as("__tab"))
    val sims = encoded
      .join(broadcast(q), col(qidCol) =!= col(nidCol))
      .select(col(qidCol), col(nidCol), adc(col("__tab"), col("pq_code")).as("sim"))
    val agg = sims.groupBy(qidCol).agg(TopK.topK(k)(col("sim"), col(nidCol)).as("nn"))
    TopK.explodeRanked(agg, "nn", Seq(col(qidCol)))
      .select(col(qidCol), col("rank"), col("id").as(nidCol), col("score").as("sim"))
  }

  /** Persist a codebook as parquet: one row per (subspace, code) centroid
    * plus the shape. Small (m·ks rows) — reads back on any cluster.
    */
  def saveCodebook(spark: SparkSession, cb: Codebook, path: String): Unit = {
    import spark.implicits._
    val rows = for (j <- 0 until cb.m; c <- cb.cents(j).indices)
      yield (j, c, cb.cents(j)(c).toSeq)
    rows.toDF("j", "c", "centroid").write.mode("overwrite").parquet(s"$path/cents")
    Seq((cb.m, cb.ks, cb.subDim)).toDF("m", "ks", "subDim")
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  def loadCodebook(spark: SparkSession, path: String): Codebook = {
    val meta = spark.read.parquet(s"$path/meta").head()
    val (m, ks, subDim) = (meta.getInt(0), meta.getInt(1), meta.getInt(2))
    val cents = Array.fill(m)(Array.empty[Array[Float]])
    val byJ = spark.read.parquet(s"$path/cents").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2).toArray))
      .groupBy(_._1)
    for (j <- 0 until m)
      cents(j) = byJ(j).sortBy(_._2).map(_._3)
    Codebook(m, ks, subDim, cents)
  }

  /** Two-stage search: ADC top-(k·rerankFactor) candidates, then exact cosine
    * on the full vectors of just those candidates, re-ranked to the final
    * top-k. The rerank join touches O(queries·k·rerankFactor) rows — noise
    * next to the corpus scan — and recovers the recall ADC's 8-byte
    * approximation gives up.
    */
  def searchRerank(queries: DataFrame, qidCol: String, qvecCol: String,
                   encoded: DataFrame, nidCol: String, nvecCol: String,
                   cb: Codebook, k: Int, rerankFactor: Int = 4): DataFrame = {
    val cand = search(queries, qidCol, qvecCol, encoded, nidCol, cb, k * rerankFactor)
      .select(col(qidCol), col(nidCol))
    val exact = cand
      .join(encoded.select(col(nidCol), col(nvecCol)), nidCol)
      .join(broadcast(queries.select(col(qidCol), col(qvecCol))), qidCol)
      .select(col(qidCol), col(nidCol), Vectors.cosine(col(qvecCol), col(nvecCol)).as("sim"))
    val agg = exact.groupBy(qidCol).agg(TopK.topK(k)(col("sim"), col(nidCol)).as("nn"))
    TopK.explodeRanked(agg, "nn", Seq(col(qidCol)))
      .select(col(qidCol), col("rank"), col("id").as(nidCol), col("score").as("sim"))
  }
}
