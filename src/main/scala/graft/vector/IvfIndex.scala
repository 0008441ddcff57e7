package graft.vector

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Vectors
import graft.operators.TopK

/** IVF (inverted-file) approximate nearest neighbor — the scale path for
  * similarity search when brute force over the corpus per query is too
  * expensive.
  *
  * Build: pick `nLists` centroids (deterministic k-means|| style: hash-seeded
  * sample, a few Lloyd iterations — all in Spark), assign every corpus vector
  * to its nearest centroid (one narrow shuffle on centroid id).
  *
  * Search: route each query to its `nProbes` nearest centroids, then score
  * only vectors in those lists — an equi-join on centroid id instead of a
  * cross join, cutting scored candidates by ~nLists/nProbes. The candidate
  * scoring reuses the bounded TopKAgg, so the shuffle stays O(queries·k).
  *
  * At 100 TB: the assigned corpus is written bucketed/partitioned by list_id
  * once; every subsequent query joins only the probed partitions (partition
  * pruning on list_id), and centroids (nLists × dim floats) broadcast.
  */
object IvfIndex {

  /** Assign each row its nearest centroid id (broadcast centroids, row-local).
    * Centroid norms are precomputed once in the broadcast and the row norm
    * once per row — the inner loop over nLists centroids is dot-products
    * only (at auto-sized lists this loop is the whole build cost: 4·√N
    * centroids × N rows × dim).
    */
  def assign(df: DataFrame, centroids: DataFrame, embCol: String): DataFrame =
    assignCollected(df, collectCentroids(centroids), embCol)

  /** The one centroid-frame collect every assign/probe shares: ordered by
    * list_id so broadcast contents (and the -1-init tie-breaks downstream)
    * are layout-independent.
    */
  private[vector] def collectCentroids(centroids: DataFrame): Array[(Long, Array[Float])] =
    centroids.orderBy("list_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

  /** [[assign]] body against an ALREADY-collected centroid array — lets build
    * reuse its final collect for both the assignment broadcast and the exact
    * nLists count (r17: the lazy centroids.count() was one extra job on the
    * first search of every index).
    */
  private def assignCollected(df: DataFrame, cents: Array[(Long, Array[Float])],
                              embCol: String): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(
      (cents.map(_._1), cents.map(_._2), cents.map(c => IvfIndex.norm(c._2))))
    val nearest = udf((v: Seq[Float]) => {
      val arr = v.toArray
      val (ids, vecs, norms) = bc.value
      val qn = IvfIndex.norm(arr)
      var best = -1L; var bestSim = Double.MinValue
      var i = 0
      while (i < ids.length) {
        val sim = IvfIndex.guardedCosine(arr, vecs(i), qn, norms(i))
        if (sim > bestSim || (sim == bestSim && ids(i) < best)) { bestSim = sim; best = ids(i) }
        i += 1
      }
      best
    })
    df.withColumn("list_id", nearest(col(embCol)))
  }

  /** Full IVF build: k-means with `iterations` Lloyd steps (mean of assigned
    * vectors per list, computed distributedly via posexplode + groupBy).
    *
    * `nLists <= 0` sizes the index from the corpus: 4·√N clamped to
    * [16, 4096] (the FAISS guidance). Finer lists at a FIXED candidate
    * budget probe more precisely — measured on the lab3 fixture at
    * numCandidates = 100 (1/5 of the corpus scored), 16 lists → 0.91
    * recall@3, 64 → 0.99.
    *
    * The projected (id, vec) frame is pinned ONCE up front: the build is
    * inherently multi-pass (each Lloyd step scans the corpus, and [[assign]]
    * collects the centroid frame), and the caller's corpus lineage is often
    * expensive — lab3's is a full-corpus ML embed, which pre-pin re-ran on
    * EVERY pass (the whole build cost 6+ embed passes). Only the FINAL
    * centroid frame is checkpointed (it is multi-consumer: the assignment
    * below plus every search's probe collect); each intermediate frame is
    * consumed exactly once, by the next iteration's assign collect.
    */
  def build(corpus: DataFrame, idCol: String, embCol: String,
            nLists: Int, iterations: Int = 2): Ivf = {
    val vecs = corpus.select(col(idCol), col(embCol)).localCheckpoint()
    // one count over the pinned blocks serves BOTH the auto-lists sizing and
    // the searchNumCandidates nVectors invariant (r16 optimization round: the
    // lazy assigned.count() in Ivf was a full extra assignment pass over the
    // corpus — at 100 TB that is a corpus × nLists cosine scan spent on a
    // row count the build already knows, since assign() is a projection)
    val nVecs = vecs.count()
    val lists = if (nLists > 0) nLists
      else math.max(16, math.min(4096, (4.0 * math.sqrt(nVecs.toDouble)).toInt))
    var centroids = vecs
      .select(col(embCol).as("centroid"))
      .withColumn("__h", xxhash64(col("centroid").cast("string")))
      .orderBy("__h").limit(lists)
      .withColumn("list_id", (row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("__h")) - 1).cast("long"))
      .select("list_id", "centroid")
    for (_ <- 1 to iterations) {
      val assigned = assign(vecs, centroids, embCol)
      // new centroid = element-wise mean of member vectors (distributed).
      // ORDER-INDEPENDENT mean (r16, VERDICT r15 #5): a plain float/double
      // avg() sums in partition-layout order, so a re-layout (AQE, a
      // different file split at 100 TB) could move centroids — and no
      // engine-independent value gate could ever pin the ANN family. Summing
      // as DECIMAL(38,12) is exact and commutative (each float32 member
      // rounds once, deterministically HALF_UP at scale 12 — noise ~5e-13,
      // five orders below float32's own resolution), and the mean is ONE
      // double division of that exact sum — bit-stable under any layout, so
      // the whole build (init sample → Lloyd → assignment) is a pure
      // function of the corpus VALUES. Gate: tools/check_ivf.py transcribes
      // it end-to-end. Cost: the decimal agg adds ~O(N·dim) decimal adds to
      // a step dominated by the O(N·dim·nLists) assignment loop (measured
      // <5% of build; BASELINE r16 audit row).
      // ONE shuffle instead of two (r16 optimization round, guide §2.4): the
      // posexplode → groupBy(list_id, pos) → groupBy(list_id) chain shuffled
      // dim× exploded rows and then re-assembled arrays with a second
      // exchange + collect_list sort. [[VecMeanAgg]] computes the identical
      // element-wise exact-decimal mean in a single groupBy(list_id) pass
      // with mergeable partial buffers (nLists × dim BigIntegers per task).
      // Bit-parity argument is in VecMeanAgg's scaladoc; gate:
      // tools/check_ivf.py / check_ivfpq.py / check_semdedup.py.
      centroids = assigned.groupBy("list_id")
        .agg(vecMeanUdaf(col(embCol)).as("centroid"))
        .filter(size(col("centroid")) > 0)
    }
    // Only the FINAL centroid frame is checkpointed (r16 optimization round):
    // each intermediate frame is consumed exactly once — by the next
    // iteration's assign(), whose collect() runs its aggregation chain once
    // anyway (the chain reads the pinned `vecs` blocks plus already-collected
    // centroid broadcasts, never the caller's corpus lineage) — so the
    // per-iteration localCheckpoint was one extra materialization job per
    // Lloyd step with nothing reusing it. The final frame IS multi-consumer
    // (the assignment below + every search's probeLists collect + listStats),
    // so it keeps the pin. Values unchanged: a checkpoint is a
    // materialization barrier, not a computation (check_ivf.py still
    // fingerprint-exact).
    val pinnedCentroids = centroids.localCheckpoint()
    // one collect serves the final assignment broadcast AND the exact list
    // count (NOT `lists`: drained lists are filtered out, and searchNum-
    // Candidates' nProbes must see the same count the old centroids.count()
    // returned)
    val cents = collectCentroids(pinnedCentroids)
    val assigned = assignCollected(vecs, cents, embCol)
      .select(col(idCol).as("nid"), col(embCol).as("nvec"), col("list_id"))
    Ivf(pinnedCentroids, assigned, nVectorsKnown = Some(nVecs),
      nListsKnown = Some(cents.length.toLong))
  }

  final case class Ivf(centroids: DataFrame, assigned: DataFrame,
                       nVectorsKnown: Option[Long] = None,
                       nListsKnown: Option[Long] = None) {

    // index invariants, computed once per Ivf (a per-search count() would
    // re-run the whole assignment lineage over the corpus); build passes the
    // counts it already knows (assign() is a projection: |assigned| == |vecs|,
    // and the auto-lists sizing fixed nLists — r17: the lazy centroids.count()
    // was one extra job on the first search of every index), mutation paths
    // (add/remove) and load fall back to counting
    private lazy val nVectors: Long =
      math.max(nVectorsKnown.getOrElse(assigned.count()), 1L)
    private lazy val nLists: Long = math.max(nListsKnown.getOrElse(centroids.count()), 1L)

    /** Approximate top-k: probe `nProbes` lists per query.
      *
      * `excludeSelf` (default true) drops the corpus row whose id EQUALS the
      * query id — the self-knn contract (q36). Callers whose query ids are
      * surrogates (VectorSearchAgg's `__qid`) must pass false: a surrogate
      * colliding with a real corpus id would silently hide that neighbor.
      */
    def search(queries: DataFrame, qidCol: String, qvecCol: String,
               k: Int, nProbes: Int, excludeSelf: Boolean = true): DataFrame = {
      val probed = IvfIndex.probeLists(queries, centroids, qidCol, qvecCol, nProbes)
      // queries are the small side by the ann contract (the corpus-sized
      // `assigned` must never build the hash side at 100 TB) — broadcast
      // explicitly like distributed()/KnnJoin do, instead of relying on the
      // optimizer's stats for the probed frame (r17, guide §3.1)
      val joined = broadcast(probed).join(assigned, "list_id")
      val sims = (if (excludeSelf) joined.filter(col(qidCol) =!= col("nid")) else joined)
        .select(col(qidCol), col("nid"),
          Vectors.cosine(col(qvecCol), col("nvec")).as("sim"))
      val agg = sims.groupBy(qidCol).agg(TopK.topK(k)(col("sim"), col("nid")).as("nn"))
      TopK.explodeRanked(agg, "nn", Seq(col(qidCol)))
        .select(col(qidCol), col("rank"), col("id").as("nid"), col("score").as("sim"))
    }

    /** Reference-vocabulary entry point: the ANN breadth knob the reference's
      * vector tables configure is `numCandidates` (e.g.
      * `'mongodb.numCandidates' = '500'`,
      * terraform/lab2-vector-search/main.tf:215). For IVF that translates to
      * probing enough lists to cover ≥ numCandidates vectors on average —
      * clamped to [1, nLists], and always ≥ enough to return k.
      */
    def searchNumCandidates(queries: DataFrame, qidCol: String, qvecCol: String,
                            k: Int, numCandidates: Int = 500,
                            excludeSelf: Boolean = true): DataFrame = {
      val avgPerList = math.max(nVectors / nLists, 1L)
      val wanted = math.max(numCandidates.toLong, k.toLong)
      val nProbes = math.min(nLists, math.max(1L, (wanted + avgPerList - 1) / avgPerList)).toInt
      search(queries, qidCol, qvecCol, k, nProbes, excludeSelf)
    }

    /** Pin both sides for multi-consumer use (a prebuilt store searched per
      * micro-batch, or one index reused across many query sets): every
      * search re-reads the checkpointed assignment instead of re-running the
      * k-means lineage — build (and any upstream embed) executes exactly
      * once, at pin time.
      */
    def pinned(): Ivf =
      copy(centroids = centroids.localCheckpoint(), assigned = assigned.localCheckpoint())

    /** Persist the index: corpus partitioned by list_id (so loads prune to the
      * probed lists), centroids alongside. This is the 100 TB layout — the
      * one-time partitionBy write buys every subsequent query a scan of
      * nProbes/nLists of the corpus via partition pruning.
      */
    def save(path: String): Unit = {
      assigned.write.mode("overwrite").partitionBy("list_id").parquet(s"$path/assigned")
      centroids.write.mode("overwrite").parquet(s"$path/centroids")
    }

    /** Incremental ADD — index maintenance without a retrain: new vectors
      * assign to the EXISTING centroids (broadcast, row-local) and append to
      * their lists. Centroids deliberately do not move: a retrain would
      * re-shuffle the whole corpus for a marginal recall change, and drift
      * only matters once the data distribution shifts — watch [[listStats]]
      * imbalance and rebuild when it degrades (the FAISS operational rule).
      */
    def add(newVectors: DataFrame, idCol: String, embCol: String): Ivf = {
      val fresh = IvfIndex.assign(
          newVectors.select(col(idCol).as("nid"), col(embCol).as("nvec")), centroids, "nvec")
        .select(col("nid"), col("nvec"), col("list_id"))
      // vectors changed (recount), centroids did not (count carries over)
      Ivf(centroids, assigned.unionByName(fresh), nListsKnown = nListsKnown)
    }

    /** Incremental REMOVE: drop ids from the lists (anti-join on the
      * broadcastable id set). The in-memory twin of a delete-file/compaction
      * pass on the saved layout.
      */
    def remove(ids: DataFrame, idCol: String): Ivf =
      Ivf(centroids, assigned.join(broadcast(ids.select(col(idCol).as("nid"))),
        Seq("nid"), "leftanti"), nListsKnown = nListsKnown)

    /** Per-list occupancy — the drift/imbalance signal that schedules a
      * rebuild (max/mean creeping up = centroids no longer fit the data).
      * EVERY list reports, including drained ones (n = 0) — an empty list is
      * the strongest degradation signal and must not vanish from the report.
      */
    def listStats: DataFrame =
      centroids.select("list_id")
        .join(assigned.groupBy("list_id").agg(count(lit(1)).as("n")), Seq("list_id"), "left")
        .select(col("list_id"), coalesce(col("n"), lit(0L)).as("n"))
  }

  /** Append new vectors to a SAVED index layout in place: assign against the
    * stored centroids, then append the new rows into the partitionBy(list_id)
    * directory — only the touched lists gain files; nothing rewrites. This is
    * the 100 TB maintenance path ([[Ivf.save]]'s layout contract holds:
    * subsequent loads prune to probed lists, now including the appended
    * rows).
    */
  def appendToSaved(spark: SparkSession, path: String, newVectors: DataFrame,
                    idCol: String, embCol: String): Unit = {
    val centroids = spark.read.parquet(s"$path/centroids")
    assign(newVectors.select(col(idCol).as("nid"), col(embCol).as("nvec")), centroids, "nvec")
      .select(col("nid"), col("nvec"), col("list_id"))
      .write.mode("append").partitionBy("list_id").parquet(s"$path/assigned")
  }

  /** Load a saved index. `search` on the result joins on the partition column,
    * and a probed-list filter reaches the scan as a PartitionFilter — only the
    * probed lists' files are read.
    */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): Ivf =
    Ivf(
      centroids = spark.read.parquet(s"$path/centroids"),
      assigned = spark.read.parquet(s"$path/assigned"))

  /** Mutable partial state of [[VecMeanAgg]]: per-dimension exact sums as
    * UNSCALED scale-12 decimal integers (BigInteger adds are exact and
    * commutative — merge-order independent, the property the whole
    * order-independent-Lloyd design rests on) plus per-dimension counts
    * (vectors can differ in length; a shorter vector contributes to fewer
    * positions, exactly like the posexplode rows it replaces).
    */
  private[vector] final case class VecMeanBuf(var sums: Array[java.math.BigInteger],
                                              var counts: Array[Long])

  /** Element-wise exact-decimal mean of float vectors — the single-shuffle
    * twin of `posexplode → sum(cast(col AS DECIMAL(38,12)))/count → re-pack`.
    * Bit-parity, term by term:
    *   - `cast(float AS decimal(38,12))` is Decimal(f.toDouble) rounded
    *     HALF_UP to scale 12 — here java.math.BigDecimal.valueOf(f.toDouble)
    *     .setScale(12, HALF_UP), whose unscaled BigInteger is summed exactly;
    *   - the SQL decimal sum is exact within precision 38 (never approached:
    *     elements are float-sized), so BigInteger addition reproduces it;
    *   - `.cast("double")` is BigDecimal.doubleValue on the exact sum;
    *   - `/ count(col)` is one IEEE double division;
    *   - the final `cast("float")` is Double.toFloat.
    * A null or empty input vector contributes nothing (posexplode emitted no
    * rows for it); a group with ONLY such vectors yields an empty array,
    * dropped by the caller's size() filter exactly where the old chain's
    * aggregation produced no row at all.
    *
    * Precondition: vector ELEMENTS are non-null (the ExpressionEncoder input
    * cannot represent a null Float the way the old posexplode chain skipped
    * one per position). Every embed path emits dense float arrays, so this
    * is latent; a future nullable-element source must pre-clean.
    */
  private[vector] object VecMeanAgg
    extends org.apache.spark.sql.expressions.Aggregator[Seq[Float], VecMeanBuf, Seq[Float]] {
    private val HALF_UP = java.math.RoundingMode.HALF_UP
    override def zero: VecMeanBuf = VecMeanBuf(Array.empty, Array.empty)
    private def grow(b: VecMeanBuf, n: Int): Unit = if (b.sums.length < n) {
      val s = new Array[java.math.BigInteger](n)
      val c = new Array[Long](n)
      System.arraycopy(b.sums, 0, s, 0, b.sums.length)
      System.arraycopy(b.counts, 0, c, 0, b.counts.length)
      var i = b.sums.length
      while (i < n) { s(i) = java.math.BigInteger.ZERO; i += 1 }
      b.sums = s
      b.counts = c
    }
    override def reduce(b: VecMeanBuf, v: Seq[Float]): VecMeanBuf = {
      if (v != null && v.nonEmpty) {
        grow(b, v.length)
        var i = 0
        while (i < v.length) {
          b.sums(i) = b.sums(i).add(
            java.math.BigDecimal.valueOf(v(i).toDouble).setScale(12, HALF_UP).unscaledValue())
          b.counts(i) += 1
          i += 1
        }
      }
      b
    }
    override def merge(a: VecMeanBuf, b: VecMeanBuf): VecMeanBuf = {
      grow(a, b.sums.length)
      var i = 0
      while (i < b.sums.length) {
        a.sums(i) = a.sums(i).add(b.sums(i))
        a.counts(i) += b.counts(i)
        i += 1
      }
      a
    }
    override def finish(b: VecMeanBuf): Seq[Float] = {
      val out = new Array[Float](b.sums.length)
      var i = 0
      while (i < b.sums.length) {
        out(i) = (new java.math.BigDecimal(b.sums(i), 12).doubleValue() /
          b.counts(i).toDouble).toFloat
        i += 1
      }
      scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
    }
    override def bufferEncoder: org.apache.spark.sql.Encoder[VecMeanBuf] =
      org.apache.spark.sql.Encoders.kryo[VecMeanBuf]
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[Float]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]()
  }

  private[vector] lazy val vecMeanUdaf =
    org.apache.spark.sql.functions.udaf(VecMeanAgg,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]())

  /** Route each query row to its nProbes nearest centroid list ids. */
  private[vector] def probeLists(queries: DataFrame, centroids: DataFrame,
                                 qidCol: String, qvecCol: String, nProbes: Int): DataFrame = {
    val cents = centroids.orderBy("list_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val bc = queries.sparkSession.sparkContext.broadcast(
      cents.map { case (id, c) => (id, c, IvfIndex.norm(c)) })
    val probes = udf((v: Seq[Float]) => {
      val arr = v.toArray
      val qn = IvfIndex.norm(arr)
      bc.value.map { case (id, c, cn) => (IvfIndex.guardedCosine(arr, c, qn, cn), id) }
        .sortBy { case (s, id) => (-s, id) }.take(nProbes).map(_._2)
    })
    queries.withColumn("list_id", explode(probes(col(qvecCol))))
  }

  /** Cosine with a zero-norm guard: a zero vector (or zero centroid) would
    * yield NaN, which fails every `>` comparison — assign() would emit
    * list_id = -1 (a nonexistent list: the row becomes unsearchable) and probe
    * ordering would be garbage. -1.0 keeps such rows deterministically routed
    * to a real list (lowest id wins the tie-break).
    */
  private[vector] def safeCosine(a: Array[Float], c: Array[Float]): Double =
    guardedCosine(a, c, norm(a), norm(c))

  private[vector] def norm(a: Array[Float]): Double = {
    var na = 0.0; var i = 0
    while (i < a.length) { na += a(i).toDouble * a(i); i += 1 }
    math.sqrt(na)
  }

  /** [[safeCosine]] with the norms precomputed by the caller (the hot loops
    * in [[assign]]/[[probeLists]] reuse them across rows/centroids).
    *
    * All three terms (dot and both norms) are computed over the SAME span:
    * the caller's precomputed norms are valid only when dims match, so a
    * length mismatch recomputes both norms over the shared prefix — a
    * full-array norm against a prefix dot would deflate scores and route
    * mismatched rows nondeterministically. The guard is on the PRODUCT of
    * the norms: two denormal norms can multiply to exactly 0.0 even when
    * neither factor is zero, and dividing by that is Inf, not a score.
    */
  private[vector] def guardedCosine(a: Array[Float], c: Array[Float],
                                    normA: Double, normC: Double): Double = {
    val n = math.min(a.length, c.length)
    val (na, nc) =
      if (a.length == c.length) (normA, normC)
      else {
        var sa = 0.0; var sc = 0.0; var i = 0
        while (i < n) { sa += a(i).toDouble * a(i); sc += c(i).toDouble * c(i); i += 1 }
        (math.sqrt(sa), math.sqrt(sc))
      }
    val denom = na * nc
    if (denom == 0.0) return -1.0
    var dot = 0.0; var i = 0
    while (i < n) { dot += a(i).toDouble * c(i); i += 1 }
    dot / denom
  }
}
