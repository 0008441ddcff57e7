package graft

import org.apache.spark.sql.functions._

object SemProbe {
  def main(args: Array[String]): Unit = {
    val spark = Bench.session("4")
    import spark.implicits._
    val rows = Seq(
      null.asInstanceOf[String], "", "   ", "\t tab lead", "a  b", "the of and to in",
      "el la de y que", "der die das und zu", "x", "𝕏 astral 𝄞 the the",
      "the. of, and; to! in?", "123 456 the", "  the  ", "THE OF AND",
      "the nbsp of", "one\ntwo\nthe").toDF("text")
    val out = rows.select(
      col("text"),
      graft.functions.Text.langId(col("text")).as("lang"),
      graft.functions.Text.qualityScore(col("text")).as("q"),
      size(graft.functions.Text.tokens(col("text"))).as("ntoks"))
    out.collect().foreach { r =>
      val t = if (r.isNullAt(0)) "<NULL>" else "'" + r.getString(0).replace("\n","\\n") + "'"
      val q = if (r.isNullAt(2)) "null" else r.getDouble(2).toString
      val n = if (r.isNullAt(3)) "null" else r.getInt(3).toString
      val lang = if (r.isNullAt(1)) "null" else r.getString(1)
      println(s"[sem] $t -> lang=$lang q=$q ntoks=$n")
    }
    spark.stop()
  }
}
