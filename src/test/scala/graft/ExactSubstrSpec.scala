package graft

import org.apache.spark.sql.functions._

import graft.llmops.Dedup

/** ExactSubstr dedup (Lee et al. 2021) — exactSubstringSpans + cutSpans.
  * Span offsets are 1-based inclusive chars, keeper = globally-first
  * occurrence by (doc_id, pos).
  */
class ExactSubstrSpec extends SparkSpec {

  // 60-char boilerplate block with no internal >=40-char repeats
  private val B = "licensed under the apache license version two point zero ok!"
  private val P1 = "alpha unique preamble one aaaa"  // 30 chars
  private val P2 = "beta distinct preamble two bbb"  // 30 chars

  test("cross-doc duplicated block: span covers exactly the block, only in the later doc") {
    import spark.implicits._
    assert(B.length == 60 && P1.length == 30 && P2.length == 30)
    val df = Seq((1L, P1 + B), (2L, P2 + B)).toDF("doc_id", "text")
    val spans = Dedup.exactSubstringSpans(df, "text", "doc_id", minLen = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // doc 1 holds every gram's first occurrence -> no spans; doc 2's block
    // windows (31..51) merge to one span covering the block exactly (31..90)
    assert(spans == Seq((2L, 31L, 90L)))
  }

  test("within-doc repetition: second occurrence flagged, first kept") {
    import spark.implicits._
    val blk = "zero one two three four five six seven eight!" // 45 chars
    assert(blk.length == 45)
    val u1 = "unrelated opening words padding padding x "    // 42 chars
    // no trailing space: a shared preceding char would legitimately extend
    // the duplicated substring one char left of the block
    val u2 = " middle filler text of this document yyyyy"    // 42 chars
    val text = u1 + blk + u2 + blk
    val df = Seq((7L, text)).toDF("doc_id", "text")
    val spans = Dedup.exactSubstringSpans(df, "text", "doc_id", minLen = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val start2 = (u1.length + blk.length + u2.length + 1).toLong
    assert(spans == Seq((7L, start2, start2 + blk.length - 1)))
  }

  test("duplicates shorter than minLen are invisible") {
    import spark.implicits._
    val short = "shared 30-char boilerplate ok!"
    assert(short.length == 30)
    val df = Seq(
      (1L, "first document body goes here " + short),
      (2L, "second document body different " + short)).toDF("doc_id", "text")
    assert(Dedup.exactSubstringSpans(df, "text", "doc_id", minLen = 40).isEmpty)
  }

  test("hashWidth 128 (md5 keys) produces identical spans") {
    val docs = core.Tables(spark, sfDir, "documents")
    val h64 = Dedup.exactSubstringSpans(docs, "text", "doc_id", minLen = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val h128 = Dedup.exactSubstringSpans(docs, "text", "doc_id", minLen = 40, hashWidth = 128)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(h64.nonEmpty, "testdata should contain planted >=40-char duplicates")
    assert(h64 == h128)
  }

  test("cutSpans removes exactly the spans; keeper doc and span-free docs pass through") {
    import spark.implicits._
    val df = Seq((1L, P1 + B), (2L, P2 + B), (3L, "totally unrelated short text"))
      .toDF("doc_id", "text")
    val spans = Dedup.exactSubstringSpans(df, "text", "doc_id", minLen = 40)
    val out = Dedup.cutSpans(df, "text", "doc_id", spans)
      .select("doc_id", "dedup_text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == P1 + B)  // keeper copy survives in full
    assert(out(2L) == P2)      // block excised, unique prefix intact
    assert(out(3L) == "totally unrelated short text")
  }

  test("cutSpans: null text stays null; multiple disjoint spans cut in order") {
    import spark.implicits._
    val blkA = "duplicated block alpha forty-five characters!" // 45
    val blkB = "duplicated block bravo forty-five characters!" // 45
    assert(blkA.length == 45 && blkB.length == 45)
    val mid = " unique middle section of document three "
    val df = Seq(
      (1L, blkA), (2L, blkB),
      (3L, blkA + mid + blkB),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val spans = Dedup.exactSubstringSpans(df, "text", "doc_id", minLen = 40)
    val out = Dedup.cutSpans(df, "text", "doc_id", spans)
      .select("doc_id", "dedup_text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(3L) == mid)     // both borrowed blocks cut, middle survives
    assert(out(4L) == null)
  }

  test("the corpus-level spans match a brute-force single-node reference") {
    // independent O(n^2)-ish reference on a small slice: collect texts, find
    // duplicated 40-grams with a HashMap, merge intervals in plain Scala
    val L = 40
    val docs = core.Tables(spark, sfDir, "documents")
      .filter(col("doc_id") < 120).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val occ = scala.collection.mutable.HashMap.empty[String, Int]
    for ((_, t) <- docs; p <- 1 to t.length - L + 1 if t.length >= L)
      occ.updateWith(t.substring(p - 1, p - 1 + L)) { c => Some(c.getOrElse(0) + 1) }
    val seenFirst = scala.collection.mutable.HashSet.empty[String]
    val expected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    for ((id, t) <- docs if t.length >= L) {
      val red = (1 to t.length - L + 1).filter { p =>
        val g = t.substring(p - 1, p - 1 + L)
        occ(g) > 1 && !seenFirst.add(g)
      }
      var i = 0
      while (i < red.length) {
        var j = i
        while (j + 1 < red.length && red(j + 1) <= red(j) + L) j += 1
        expected += ((id, red(i).toLong, (red(j) + L - 1).toLong))
        i = j + 1
      }
    }
    val got = Dedup.exactSubstringSpans(
        core.Tables(spark, sfDir, "documents").filter(col("doc_id") < 120),
        "text", "doc_id", minLen = L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected.toSet)
  }

  test("rolling gram-hash path matches the expression path on surrogate-heavy docs (r16)") {
    import spark.implicits._
    // astral-plane chars (surrogate pairs in UTF-16) interleaved with a
    // duplicated 40-char run: the 64-bit rolling route must fall back to
    // per-window encoding and produce the SAME spans the md5 expression
    // route finds (both are exact; the hashes differ, the span set must not)
    val dup = "the quick brown fox jumps over the lazy dog!"  // 45 chars
    val astral = "\uD835\uDD4F\uD834\uDD1E" // 𝕏𝄞
    val docs = Seq(
      (1L, s"$astral prefix $dup suffix one $astral"),
      (2L, s"other lead-in text $dup trailing tail $astral$astral"),
      (3L, s"$dup$astral$dup"),
      (4L, "no duplicate content here just filler " + astral * 12),
      (5L, astral * 30)).toDF("doc_id", "text")
    def spans(hw: Int) = Dedup.exactSubstringSpans(docs, "text", "doc_id",
        minLen = 40, hashWidth = hw)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(spans(64) == spans(128), "64-bit rolling route diverged from the md5 route")
    assert(spans(64).nonEmpty, "fixture should contain duplicated 40-grams")
  }
}
