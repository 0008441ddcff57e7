package graft

import org.apache.spark.sql.functions._
import graft.llmops.QualityClassifier

/** Learned quality filter: trains on real-vs-corrupted docs and separates a
  * holdout; the scoring expression is plain arithmetic over the fixed
  * feature vector (no mllib types at scoring time).
  */
class QualityClassifierSpec extends SparkSpec {

  // corrupted negatives: symbol/digit soup and degenerate repetition — the
  // failure modes the heuristic features are built to see
  private def corrupt(id: Long, text: String): String = id % 3 match {
    case 0 => text.take(120).flatMap(c => s"$c#7")
    case 1 => ("spam " * 60).trim
    case _ => "@@@ 111 $$$ 222 %%% 333 ^^^ 444 " * 8
  }

  private lazy val labeled = {
    import spark.implicits._
    val docs = graft.core.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val rows = docs.map { case (id, t) => (id, t, 1.0) } ++
      docs.map { case (id, t) => (id + 1000000L, corrupt(id, t), 0.0) }
    rows.toSeq.toDF("doc_id", "text", "label")
  }

  test("trains to >= 0.9 holdout accuracy separating real docs from corruptions") {
    val feats = QualityClassifier.featurize(labeled, "text")
    val train = feats.filter(col("doc_id") % 5 =!= 0)
    val holdout = feats.filter(col("doc_id") % 5 === 0)
    val m = QualityClassifier.train(train)
    val scored = QualityClassifier.score(holdout, "text", m)
      .select(col("label"), col("quality_prob")).collect()
    assert(scored.nonEmpty)
    val acc = scored.count(r =>
      (r.getDouble(1) >= 0.5) == (r.getDouble(0) == 1.0)).toDouble / scored.length
    assert(acc >= 0.9, s"holdout accuracy $acc below 0.9")
  }

  test("logit is the documented left-to-right fold and prob its sigmoid") {
    import spark.implicits._
    val m = QualityClassifier.Model(Array(0.1, 0.05, 3.0, 1.0, 2.0, -4.0, -4.0, -2.0), -2.0)
    val row = QualityClassifier.score(
        Seq((1L, "the quick brown fox jumps over the lazy dog")).toDF("id", "text"), "text", m)
      .select("quality_logit", "quality_prob").head()
    val feats = QualityClassifier.featurize(
        Seq((1L, "the quick brown fox jumps over the lazy dog")).toDF("id", "text"), "text")
      .select("features").head().getSeq[Double](0)
    val expect = m.weights.zip(feats).foldLeft(m.intercept) { case (acc, (w, f)) => acc + f * w }
    assert(row.getDouble(0) == expect, "bit-identical fold")
    assert(math.abs(row.getDouble(1) - 1.0 / (1.0 + math.exp(-expect))) < 1e-15)
  }

  test("model arity is validated against the feature vector") {
    intercept[IllegalArgumentException] {
      QualityClassifier.Model(Array(1.0, 2.0), 0.0)
    }
  }
}
