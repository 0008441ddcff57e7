package graft

import org.apache.spark.sql.functions._

import graft.functions.Text

/** Parity gate for [[Text.langQualityFused]] (r16 optimization round): the
  * fused one-pass UDF must be BIT-identical to the Column formulations it
  * replaces on the curation hot path — including the edge semantics the
  * Column twins inherit from Spark builtins (ASCII-space-only trim, empties
  * kept by split, code-point char counts, null → ("de", null)).
  */
class TextFusedSpec extends SparkSpec {

  private def compare(texts: Seq[String]): Unit = {
    import spark.implicits._
    val df = texts.toDF("text")
    val rows = df.select(
      col("text"),
      Text.langId(col("text")).as("lang_col"),
      Text.qualityScore(col("text")).as("q_col"),
      Text.langQualityFused(col("text")).getField("lang_pred").as("lang_fused"),
      Text.langQualityFused(col("text")).getField("quality").as("q_fused"))
      .collect()
    rows.foreach { r =>
      val t = if (r.isNullAt(0)) "<NULL>" else s"'${r.getString(0)}'"
      assert(r.getString(1) == r.getString(3), s"lang mismatch on $t: ${r.getString(1)} vs ${r.getString(3)}")
      val (qc, qf) = (r.isNullAt(2), r.isNullAt(4))
      assert(qc == qf, s"quality nullness mismatch on $t")
      if (!qc) {
        // bit-identical, not approximately equal: the transcription gates
        // (check_curation/check_recipe) fingerprint these doubles
        assert(java.lang.Double.doubleToRawLongBits(r.getDouble(2)) ==
          java.lang.Double.doubleToRawLongBits(r.getDouble(4)),
          s"quality mismatch on $t: ${r.getDouble(2)} vs ${r.getDouble(4)}")
      }
    }
  }

  test("fused lang+quality is bit-identical to the Column twins on adversarial inputs") {
    compare(Seq(
      null,
      "", "   ", " ", "\t", "\t tab lead", "trail tab\t", "\n\nx\n\n",
      "a  b", "the of and to in", "el la de y que en", "der die das und zu",
      "x", "the", "el", "der",
      // ties: equal scores must break en > es > de exactly like the when-chain
      "the el der", "el der", "de", // "de" is BOTH an es and de stopword
      "the. of, and; to! in?", "123 456 789", "!!!", "???", "1",
      "  the  ", "THE OF AND", "one\ntwo\nthe",
      // unicode: astral chars (code-point counting), combining marks, NBSP
      // (U+00A0 is NOT \s in Java regex — stays inside a token)
      "𝕏 astral 𝄞 the the", "café naïve the",
      "a b the", " ", "niño el la",
      // punctuation-heavy + digits + long doc (lenScore saturation)
      ("the word " * 50).trim, ("x9! " * 100).trim,
      // all-stopword doc (stopRatio saturation)
      ("the of and " * 30).trim))
  }

  test("fused lang+quality matches the Column twins on the sf0.001 corpus") {
    val docs = graft.core.Tables(spark, "/root/testdata/sf0.001", "documents")
    val diff = docs.select(
      Text.langId(col("text")).as("lang_col"),
      Text.qualityScore(col("text")).as("q_col"),
      Text.langQualityFused(col("text")).getField("lang_pred").as("lang_fused"),
      Text.langQualityFused(col("text")).getField("quality").as("q_fused"))
      .filter(col("lang_col") =!= col("lang_fused") ||
        !(col("q_col") <=> col("q_fused")))
      .count()
    assert(diff == 0, s"$diff corpus rows diverge between fused and Column lang/quality")
  }
}
