package graft

import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.llmops.Curation

class TextQualitySpec extends SparkSpec {

  private def one(text: String, c: org.apache.spark.sql.Column): org.apache.spark.sql.Row = {
    import spark.implicits._
    Seq(text).toDF("text").select(Text.tokens(col("text")).as("toks")).select(c).head()
  }

  test("meanWordLen and alphaWordRatio on crafted docs") {
    val r = one("aa bbbb cc 1234", struct(
      Text.meanWordLen(col("toks")).as("mwl"),
      Text.alphaWordRatio(col("toks")).as("awr")))
    assert(r.getStruct(0).getDouble(0) == (2 + 4 + 2 + 4) / 4.0)
    assert(r.getStruct(0).getDouble(1) == 3 / 4.0) // "1234" has no letter
  }

  test("dupNgramFrac flags within-doc repetition that dedup misses") {
    val boiler = Seq.fill(20)("click here to subscribe").mkString(" ")
    val clean = (1 to 80).map(i => s"w$i").mkString(" ")
    val dupB = one(boiler, Text.dupNgramFrac(col("toks"), 3)).getDouble(0)
    val dupC = one(clean, Text.dupNgramFrac(col("toks"), 3)).getDouble(0)
    assert(dupB > 0.9, s"boilerplate 3-gram dup frac $dupB")
    assert(dupC == 0.0, s"distinct doc should have zero dup frac, got $dupC")
  }

  test("dupNgramFrac is 0 for docs shorter than n (single partial gram)") {
    val d = one("solo", Text.dupNgramFrac(col("toks"), 3)).getDouble(0)
    assert(d == 0.0)
  }

  test("piiRedact replaces every span and counts match; clean text untouched") {
    import spark.implicits._
    val txt = "mail a.b+c@ex-ample.co.uk or x@y.io, host 192.168.0.1 tel 555-0199 end"
    val r = Seq(txt).toDF("t").select(
      Curation.piiRedact(col("t")).as("red"),
      Curation.piiCount(col("t"), "email").as("ne"),
      Curation.piiCount(col("t"), "ip").as("ni"),
      Curation.piiCount(col("t"), "phone").as("np")).head()
    assert(r.getAs[String]("red") == "mail <EMAIL> or <EMAIL>, host <IP> tel <PHONE> end")
    assert((r.getAs[Long]("ne"), r.getAs[Long]("ni"), r.getAs[Long]("np")) == ((2L, 1L, 1L)))

    val clean = "no personal data here, just 42 words and 3.14"
    val r2 = Seq(clean).toDF("t").select(Curation.piiRedact(col("t"))).head().getString(0)
    assert(r2 == clean)
  }

  test("piiRedact order: the email pass must not leave partial-IP digit runs") {
    import spark.implicits._
    // an email whose local part looks like a dotted quad — if the IP pass ran
    // first it would corrupt the address instead of redacting it whole
    val r = Seq("from 10.0.0.1@corp.example.com sender").toDF("t")
      .select(Curation.piiRedact(col("t"))).head().getString(0)
    assert(r == "from <EMAIL> sender")
  }
}
