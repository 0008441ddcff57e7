package graft.vector

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Vectors
import graft.operators.TopK

/** IVF-PQ — the composed 100 TB ANN architecture (FAISS's IndexIVFPQ shape):
  * an inverted-file coarse quantizer bounds WHICH vectors are scored
  * (`nProbes`/`nLists` of the corpus via [[IvfIndex]] routing + partition
  * pruning on the saved layout), and product-quantized codes bound the COST
  * of each scored candidate (m bytes + m table lookups via [[PqIndex]] ADC,
  * instead of a dim-float read + dim multiplies). The two compressions
  * multiply: at nLists=1024, nProbes=8, m=8 over 64-dim floats, a query
  * touches ~1/128 of the rows at ~1/32 the bytes each — ~4000× less scan
  * work than brute force, which is why this is the layout vector databases
  * actually deploy at corpus scale.
  *
  * Search = route → ADC over probed lists only → exact-cosine rerank of the
  * ADC top-(k·rerankFactor) (recall recovery; the rerank join touches
  * O(queries·k·factor) rows). All three stages keep the corpus distributed:
  * queries broadcast, candidates aggregate through the bounded map-side
  * TopKAgg, the full vectors are read only for reranked ids.
  *
  * The saved layout partitions codes AND vectors by `list_id` (probed-list
  * partition pruning, the [[IvfIndex.Ivf.save]] contract) with the codebook
  * alongside; [[IvfIndex.appendToSaved]]-style maintenance applies (assign +
  * encode + append — codebooks, like centroids, do not move on add).
  */
object IvfPq {

  final case class Index(centroids: DataFrame, cb: PqIndex.Codebook, encoded: DataFrame) {

    /** Approximate top-k: probe `nProbes` lists, ADC-score only their codes,
      * exact-rerank the top k·rerankFactor.
      */
    def search(queries: DataFrame, qidCol: String, qvecCol: String,
               k: Int, nProbes: Int, rerankFactor: Int = 4): DataFrame = {
      val spark = queries.sparkSession
      val bcCb = PqIndex.broadcastCodebook(spark, cb)
      val mkTable = PqIndex.mkTableUdf(bcCb)
      val adc = PqIndex.adcUdf(bcCb)
      // routing (qid, list_id) and the per-query ADC table travel as TWO
      // broadcast relations joined after the list fan-out: the m·ks-float
      // table is built once per query and broadcast once per query, not
      // rebuilt/recopied nProbes times inside an exploded projection.
      val lidType = encoded.schema("list_id").dataType // saved layouts infer Int; live is Long
      val probes = IvfIndex.probeLists(queries, centroids, qidCol, qvecCol, nProbes)
        .select(col(qidCol), col("list_id").cast(lidType).as("list_id"))
      val tabs = queries.select(col(qidCol), mkTable(col(qvecCol)).as("__tab"))
      // static probed-list pruning: collect the ≤ min(nLists, queries·nProbes)
      // probed ids (re-running the cheap routing job) and filter with literals,
      // so a saved partitionBy(list_id) layout prunes at plan time instead of
      // hoping dynamic-partition-pruning heuristics fire on a udf lineage.
      val probedIds = probes.select("list_id").distinct().collect().map(_.get(0))
      val cand = encoded.select(col("nid"), col("list_id"), col("pq_code"))
        .filter(col("list_id").isInCollection(probedIds))
        .join(broadcast(probes), Seq("list_id"))
        .filter(col(qidCol) =!= col("nid"))
        .join(broadcast(tabs), Seq(qidCol))
        .select(col(qidCol), col("nid"), adc(col("__tab"), col("pq_code")).as("sim"))
      val shortlist = TopK.explodeRanked(
          cand.groupBy(qidCol).agg(TopK.topK(k * rerankFactor)(col("sim"), col("nid")).as("nn")),
          "nn", Seq(col(qidCol)))
        .select(col(qidCol), col("id").as("nid"))
      val exact = broadcast(shortlist) // O(queries·k·factor) ids — never sort-merge the corpus
        .join(encoded.filter(col("list_id").isInCollection(probedIds)) // rerank ids all live in probed lists
          .select(col("nid"), col("nvec")), "nid")
        .join(broadcast(queries.select(col(qidCol), col(qvecCol))), qidCol)
        .select(col(qidCol), col("nid"),
          Vectors.cosine(col(qvecCol), col("nvec")).as("sim"))
      TopK.explodeRanked(
          exact.groupBy(qidCol).agg(TopK.topK(k)(col("sim"), col("nid")).as("nn")),
          "nn", Seq(col(qidCol)))
        .select(col(qidCol), col("rank"), col("id").as("nid"), col("score").as("sim"))
    }

    /** Persist: codes+vectors partitioned by list_id (probed-list pruning),
      * centroids and codebook alongside.
      */
    def save(path: String): Unit = {
      encoded.write.mode("overwrite").partitionBy("list_id").parquet(s"$path/encoded")
      centroids.write.mode("overwrite").parquet(s"$path/centroids")
      PqIndex.saveCodebook(encoded.sparkSession, cb, s"$path/codebook")
    }
  }

  /** Build: IVF coarse structure + PQ codebook trained on the same corpus,
    * codes attached to every assigned row.
    */
  def build(corpus: DataFrame, idCol: String, embCol: String,
            nLists: Int, m: Int, ks: Int = 256, iterations: Int = 2,
            pqIterations: Int = 4, pqSampleSize: Int = 8192): Index = {
    val ivf = IvfIndex.build(corpus, idCol, embCol, nLists, iterations)
    // the PQ codebook (not the coarse centroids) is the recall lever — its
    // training knobs are first-class, not hidden defaults
    val cb = PqIndex.train(corpus, embCol, m, ks, pqSampleSize, pqIterations)
    Index(ivf.centroids, cb, PqIndex.encode(ivf.assigned, "nvec", cb))
  }

  def load(spark: SparkSession, path: String): Index =
    Index(
      centroids = spark.read.parquet(s"$path/centroids"),
      cb = PqIndex.loadCodebook(spark, s"$path/codebook"),
      encoded = spark.read.parquet(s"$path/encoded"))
}
