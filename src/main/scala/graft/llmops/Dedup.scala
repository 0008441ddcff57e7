package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Text, Vectors}
import graft.operators.TopK
import graft.vector.KnnJoin

/** Deduplication operators for large-scale corpus curation. All are
  * shuffle-architected for 100 TB:
  *  - exact: one hash-groupBy on the fingerprint (partial agg map-side);
  *  - MinHash+LSH: shingle → signature (row-local, codegen higher-order fns),
  *    band → bucket groupBy; candidate pairs only ever materialise per-bucket,
  *    never the O(N²) cross product;
  *  - SimHash: row-local 64-bit signature, bucket on rotated prefixes;
  *  - n-gram Jaccard: exact verification used on candidate pairs (or small
  *    subsets) — the expensive step LSH exists to avoid.
  */
object Dedup {

  /** Exact dedup: keep the lowest-id row per content fingerprint. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.withColumn("fp", Text.fingerprint(col(textCol)))
      .groupBy("fp")
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))

  /** MinHash signature as a codegen-only column: for each of `numHashes` seeds,
    * min over shingles of xxhash64(shingle, seed). No UDF, no shuffle.
    */
  def minHashSignature(textCol: Column, shingleSize: Int, numHashes: Int): Column = {
    val sh = Text.shingles(textCol, shingleSize)
    transform(sequence(lit(0), lit(numHashes - 1)),
      seed => array_min(transform(sh, s => xxhash64(s, seed))))
  }

  /** LSH candidate pairs: signatures banded `numBands` ways; docs sharing any
    * band bucket become a candidate pair, then pairs are verified with exact
    * n-gram Jaccard and filtered by `threshold`.
    *
    * Output: (id_a, id_b, jaccard) with id_a < id_b.
    */
  def minHashLsh(df: DataFrame, textCol: String, idCol: String,
                 shingleSize: Int = 3, numHashes: Int = 16, numBands: Int = 4,
                 threshold: Double = 0.5): DataFrame = {
    val rowsPerBand = numHashes / numBands
    val sig = df.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .withColumn("sig", minHashSignature(col("text"), shingleSize, numHashes))
    val banded = sig.select(col("doc_id"), col("text"),
      posexplode(transform(sequence(lit(0), lit(numBands - 1)),
        b => slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)))))
      .select(col("doc_id"), col("text"), col("pos").as("band"), hash(col("col")).as("bucket"))
    // per-bucket self-join (shuffle keyed on (band, bucket)); distinct pairs
    val a = banded.select(col("band"), col("bucket"), col("doc_id").as("id_a"), col("text").as("text_a"))
    val b = banded.select(col("band"), col("bucket"), col("doc_id").as("id_b"), col("text").as("text_b"))
    val pairs = a.join(b, Seq("band", "bucket")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "text_a", "text_b").distinct()
    pairs
      .withColumn("jaccard", jaccardShingles(col("text_a"), col("text_b"), shingleSize))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Exact token-n-gram Jaccard between two text columns (row-local). */
  def jaccardShingles(a: Column, b: Column, n: Int): Column = {
    val sa = Text.shingles(a, n)
    val sb = Text.shingles(b, n)
    val inter = size(array_intersect(sa, sb)).cast("double")
    inter / (size(sa) + size(sb) - size(array_intersect(sa, sb))).cast("double")
  }

  /** All-pairs exact n-gram Jaccard over a (small or pre-filtered) corpus —
    * the quadratic oracle LSH approximates. Self-joins on a shared shingle so
    * only pairs with ≥1 common shingle are scored (an inverted-index join,
    * not a cross product).
    */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                        shingleSize: Int = 3, threshold: Double = 0.5): DataFrame = {
    val sh = df.select(col(idCol).as("doc_id"),
      Text.shingles(col(textCol), shingleSize).as("sh"))
      .withColumn("n_sh", size(col("sh")))
    val inv = sh.select(col("doc_id"), col("n_sh"), explode(col("sh")).as("shingle"))
    val a = inv.select(col("shingle"), col("doc_id").as("id_a"), col("n_sh").as("n_a"))
    val b = inv.select(col("shingle"), col("doc_id").as("id_b"), col("n_sh").as("n_b"))
    a.join(b, Seq("shingle")).filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "n_a", "n_b")
      .agg(count(lit(1)).as("common"))
      .withColumn("jaccard",
        col("common").cast("double") / (col("n_a") + col("n_b") - col("common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** 64-bit SimHash over tokens, as a row-local column expression: bit i of the
    * signature is set when the sum over tokens of sign(bit i of xxhash64(token))
    * is positive.
    */
  def simHash(textCol: Column): Column = {
    val toks = Text.tokens(textCol)
    val hashes = transform(toks, t => xxhash64(t))
    aggregate(
      sequence(lit(0), lit(63)),
      lit(0L),
      (acc, i) => {
        val bitSum = aggregate(hashes, lit(0L),
          (s, h) => s + when(call_function("shiftright", h, i).bitwiseAND(1) === 1, 1L).otherwise(-1L))
        acc.bitwiseOR(when(bitSum > 0, call_function("shiftleft", lit(1L), i)).otherwise(0L))
      })
  }

  /** Near-dup pairs by SimHash: bucket on 4×16-bit signature quarters (docs
    * within Hamming distance `maxHamming` ≤ 3 of each other share at least one
    * exact quarter), verify Hamming distance on candidates.
    */
  def simHashPairs(df: DataFrame, textCol: String, idCol: String, maxHamming: Int = 3): DataFrame = {
    val sig = df.select(col(idCol).as("doc_id"), simHash(col(textCol)).as("sig"))
    val banded = sig.select(col("doc_id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(3)),
        q => call_function("shiftright", col("sig"), q * 16).bitwiseAND(0xFFFFL))))
      .select(col("doc_id"), col("sig"), col("pos").as("quarter"), col("col").as("qbits"))
    val a = banded.select(col("quarter"), col("qbits"), col("doc_id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("quarter"), col("qbits"), col("doc_id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("quarter", "qbits")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding near-dup: pairs with cosine ≥ threshold. Inverted-index-free
    * exact variant (broadcast one side); for web-scale use LSH bucketing on
    * random hyperplanes first.
    */
  def embeddingNearDup(df: DataFrame, embCol: String, idCol: String, threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(embCol).as("emb_a"))
    val b = df.select(col(idCol).as("id_b"), col(embCol).as("emb_b"))
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), Vectors.cosine(col("emb_a"), col("emb_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
