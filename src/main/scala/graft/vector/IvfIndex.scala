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

  /** Assign each row its nearest centroid id (broadcast centroids, row-local). */
  def assign(df: DataFrame, centroids: DataFrame, embCol: String): DataFrame = {
    val cents = centroids.orderBy("list_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val bc = df.sparkSession.sparkContext.broadcast(cents)
    val nearest = udf((v: Seq[Float]) => {
      val arr = v.toArray
      var best = -1L; var bestSim = Double.MinValue
      bc.value.foreach { case (id, c) =>
        val sim = IvfIndex.safeCosine(arr, c)
        if (sim > bestSim || (sim == bestSim && id < best)) { bestSim = sim; best = id }
      }
      best
    })
    df.withColumn("list_id", nearest(col(embCol)))
  }

  /** Full IVF build: k-means with `iterations` Lloyd steps (mean of assigned
    * vectors per list, computed distributedly via posexplode + groupBy).
    */
  def build(corpus: DataFrame, idCol: String, embCol: String,
            nLists: Int, iterations: Int = 2): Ivf = {
    val spark = corpus.sparkSession
    var centroids = corpus
      .select(col(embCol).as("centroid"))
      .withColumn("__h", xxhash64(col("centroid").cast("string")))
      .orderBy("__h").limit(nLists)
      .withColumn("list_id", (row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("__h")) - 1).cast("long"))
      .select("list_id", "centroid")
    for (_ <- 1 to iterations) {
      val assigned = assign(corpus, centroids, embCol)
      // new centroid = element-wise mean of member vectors (distributed)
      val dims = assigned.select(col("list_id"), posexplode(col(embCol)))
        .groupBy("list_id", "pos").agg(avg(col("col").cast("double")).as("m"))
      centroids = dims.groupBy("list_id")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m").cast("float")).as("centroid"))
    }
    val assigned = assign(corpus, centroids, embCol)
      .select(col(idCol).as("nid"), col(embCol).as("nvec"), col("list_id"))
    Ivf(centroids, assigned)
  }

  final case class Ivf(centroids: DataFrame, assigned: DataFrame) {

    // index invariants, computed once per Ivf (a per-search count() would
    // re-run the whole assignment lineage over the corpus)
    private lazy val nVectors: Long = math.max(assigned.count(), 1L)
    private lazy val nLists: Long = math.max(centroids.count(), 1L)

    /** Approximate top-k: probe `nProbes` lists per query. */
    def search(queries: DataFrame, qidCol: String, qvecCol: String,
               k: Int, nProbes: Int): DataFrame = {
      val probed = IvfIndex.probeLists(queries, centroids, qidCol, qvecCol, nProbes)
      val sims = probed
        .join(assigned, "list_id")
        .filter(col(qidCol) =!= col("nid"))
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
                            k: Int, numCandidates: Int = 500): DataFrame = {
      val avgPerList = math.max(nVectors / nLists, 1L)
      val wanted = math.max(numCandidates.toLong, k.toLong)
      val nProbes = math.min(nLists, math.max(1L, (wanted + avgPerList - 1) / avgPerList)).toInt
      search(queries, qidCol, qvecCol, k, nProbes)
    }

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
      Ivf(centroids, assigned.unionByName(fresh))
    }

    /** Incremental REMOVE: drop ids from the lists (anti-join on the
      * broadcastable id set). The in-memory twin of a delete-file/compaction
      * pass on the saved layout.
      */
    def remove(ids: DataFrame, idCol: String): Ivf =
      Ivf(centroids, assigned.join(broadcast(ids.select(col(idCol).as("nid"))),
        Seq("nid"), "leftanti"))

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

  /** Route each query row to its nProbes nearest centroid list ids. */
  private[vector] def probeLists(queries: DataFrame, centroids: DataFrame,
                                 qidCol: String, qvecCol: String, nProbes: Int): DataFrame = {
    val cents = centroids.orderBy("list_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val bc = queries.sparkSession.sparkContext.broadcast(cents)
    val probes = udf((v: Seq[Float]) => {
      val arr = v.toArray
      bc.value.map { case (id, c) => (IvfIndex.safeCosine(arr, c), id) }
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
  private[vector] def safeCosine(a: Array[Float], c: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val n = math.min(a.length, c.length)
    while (i < n) { dot += a(i).toDouble * c(i); na += a(i).toDouble * a(i); nb += c(i).toDouble * c(i); i += 1 }
    if (na * nb == 0.0) -1.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }
}
