package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Byte-pair-encoding subword tokenizer (Sennrich et al., ACL 2016) as a
  * pipeline step: TRAIN on the corpus' word-frequency table, ENCODE row-local.
  *
  * Scale split mirrors IvfIndex/PqIndex codebook training: the distributed
  * part is ONE map-side-combined `groupBy(word).count()` — vocabulary-sized
  * output, orders of magnitude smaller than the corpus — collected to the
  * driver where the classic merge loop runs (numMerges × vocab × word-length;
  * tokenizer training corpora are deliberately bounded — pre-sample with
  * [[Curation.sample]] for 100 TB inputs). Encoding broadcasts the merge
  * ranks and applies the standard greedy lowest-rank-first merge per word in
  * a UDF — row-local, zero shuffle.
  *
  * Determinism: merge ties break on (pair count DESC, left ASC, right ASC);
  * training twice on the same frame yields identical merge tables (spec).
  */
object Bpe {

  case class Merge(rank: Int, left: String, right: String)

  /** Learn `numMerges` merges from the lowercased word-frequency table of
    * `textCol`. Stops early when no adjacent pair occurs twice (weighted).
    */
  def train(df: DataFrame, textCol: String, numMerges: Int): Seq[Merge] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val freq = df
      .select(explode(Text.tokens(lower(coalesce(col(textCol), lit(""))))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))

    var seqs: Array[(Array[String], Long)] =
      freq.map { case (w, c) => (w.map(_.toString).toArray, c) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val pairCounts = new java.util.HashMap[(String, String), Long]()
      seqs.foreach { case (s, c) =>
        var i = 0
        while (i < s.length - 1) {
          pairCounts.merge((s(i), s(i + 1)), c, (a, b) => a + b)
          i += 1
        }
      }
      import scala.jdk.CollectionConverters._
      val best = pairCounts.asScala.filter(_._2 >= 2).toSeq
        .sortBy { case ((l, r), c) => (-c, l, r) }.headOption
      best match {
        case None => done = true
        case Some(((l, r), _)) =>
          merges += Merge(rank, l, r)
          val fused = l + r
          seqs = seqs.map { case (s, c) =>
            if (s.length < 2) (s, c)
            else {
              val out = scala.collection.mutable.ArrayBuffer.empty[String]
              var i = 0
              while (i < s.length) {
                if (i < s.length - 1 && s(i) == l && s(i + 1) == r) { out += fused; i += 2 }
                else { out += s(i); i += 1 }
              }
              (out.toArray, c)
            }
          }
          rank += 1
      }
    }
    merges.toSeq
  }

  /** Greedy BPE encoding of one word: repeatedly fuse the adjacent pair with
    * the LOWEST merge rank until none applies (the standard inference rule —
    * merge order, not left-to-right scan order).
    */
  private[graft] def encodeWord(word: String, ranks: Map[(String, String), Int]): Array[String] = {
    var s = word.map(_.toString).toArray
    var go = s.length >= 2
    while (go) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < s.length - 1) {
        ranks.get((s(i), s(i + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; bestAt = i }
        }
        i += 1
      }
      if (bestAt < 0) go = false
      else {
        s = (s.take(bestAt) :+ (s(bestAt) + s(bestAt + 1))) ++ s.drop(bestAt + 2)
        go = s.length >= 2
      }
    }
    s
  }

  /** Per-doc BPE token stats under a trained merge table: subword count vs
    * whitespace-word and char counts (the compression the tokenizer buys).
    * Row-local; the merge table rides the closure/broadcast.
    */
  def encodeStats(df: DataFrame, textCol: String, idCol: String, merges: Seq[Merge]): DataFrame = {
    val ranks: Map[(String, String), Int] =
      merges.map(m => (m.left, m.right) -> m.rank).toMap
    val bc = df.sparkSession.sparkContext.broadcast(ranks)
    // per-task type cache: the closure deserializes once per task, so the
    // map amortizes the greedy merge loop across the partition's massive
    // token/type repetition (natural corpora re-encode 'the' billions of
    // times); memory is bounded by the partition's TYPE vocabulary
    val cache = new java.util.HashMap[String, Int]()
    val statsUdf = udf { text: String =>
      val words = graft.llmops.Dedup.RowHash.tokens(
        if (text == null) "" else text.toLowerCase(java.util.Locale.ROOT)).filter(_.nonEmpty)
      var bpe = 0L
      var chars = 0L
      words.foreach { w =>
        var n = cache.getOrDefault(w, -1)
        if (n < 0) { n = encodeWord(w, bc.value).length; cache.put(w, n) }
        bpe += n
        chars += w.length
      }
      (bpe, words.length.toLong, chars)
    }
    graft.core.Parallelism.defend(df)
      .select(col(idCol).as("doc_id"), statsUdf(col(textCol)).as("__s"))
      .select(col("doc_id"), col("__s._1").as("n_bpe_tokens"),
        col("__s._2").as("n_words"), col("__s._3").as("n_chars"))
  }
}
