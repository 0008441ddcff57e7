package graft

import java.sql.Timestamp

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.anomaly.AnomalyDetector

/** Property-based invariants (SURVEY.md §5 test plan item 4). Uses seeded
  * ScalaCheck generators directly (scalatestplus bridge not available in the
  * offline dependency cache) — deterministic across runs.
  */
class PropertySpec extends SparkSpec {

  private def forAll[A](gen: Gen[A], n: Int = 60)(f: A => Unit): Unit =
    (0 until n).foreach { i => f(gen.pureApply(Gen.Parameters.default, Seed(42L + i))) }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    (0 until 60).foreach { i =>
      f(ga.pureApply(Gen.Parameters.default, Seed(42L + i)),
        gb.pureApply(Gen.Parameters.default, Seed(1042L + i)))
    }

  private def whenever(cond: Boolean)(f: => Unit): Unit = if (cond) f

  private val seriesGen: Gen[List[Double]] =
    Gen.listOfN(40, Gen.choose(0.0, 1000.0))

  test("anomaly: never emits a detection before minTrainingSize history rows") {
    forAll(seriesGen, Gen.choose(2, 10)) { (vals, minTrain) =>
      val cfg = AnomalyDetector.Config(minTrain, 50, 95.0)
      val out = AnomalyDetector.detectSeries(vals, cfg)
      out.take(math.min(minTrain, vals.length)).foreach { case (f, hi, lo, anom) =>
        assert(f.isEmpty && hi.isEmpty && lo.isEmpty && !anom)
      }
    }
  }

  test("anomaly: is_anomaly is exactly 'outside the band'") {
    forAll(seriesGen) { vals =>
      val cfg = AnomalyDetector.Config(3, 20, 95.0)
      AnomalyDetector.detectSeries(vals, cfg).zip(vals).foreach {
        case ((Some(_), Some(hi), Some(lo), anom), v) =>
          assert(anom == (v > hi || v < lo))
          assert(lo <= hi)
        case ((None, _, _, anom), _) => assert(!anom)
        case other                   => fail(s"inconsistent detection $other")
      }
    }
  }

  test("anomaly: constant series has zero-width band and no anomalies after warm-up") {
    forAll(Gen.choose(1.0, 100.0)) { c =>
      val cfg = AnomalyDetector.Config(3, 10, 95.0)
      val out = AnomalyDetector.detectSeries(List.fill(20)(c), cfg)
      out.drop(3).foreach { case (f, hi, lo, anom) =>
        // repeated-addition rounding makes mean ≈ c, not == c
        assert(math.abs(f.get - c) < 1e-9)
        assert(hi.get - lo.get < 1e-6, "band must be (numerically) zero-width")
        assert(!anom)
      }
    }
  }

  test("window assignment: every ts falls in exactly its epoch-aligned bucket") {
    forAll(Gen.choose(0L, 4102444800L), Gen.oneOf(60L, 300L, 3600L, 21600L)) { (epochS, widthS) =>
      val start = (epochS / widthS) * widthS
      assert(start <= epochS && epochS < start + widthS)
    }
  }

  test("inverse normal CDF: symmetric, monotone") {
    forAll(Gen.choose(0.001, 0.499)) { p =>
      val z = graft.anomaly.Gaussian.invCdf(p)
      val zMirror = graft.anomaly.Gaussian.invCdf(1.0 - p)
      assert(math.abs(z + zMirror) < 1e-7, s"symmetry at $p")
      assert(z < 0)
    }
    forAll(Gen.choose(0.01, 0.98), Gen.choose(0.001, 0.009)) { (p, d) =>
      assert(graft.anomaly.Gaussian.invCdf(p) < graft.anomaly.Gaussian.invCdf(p + d))
    }
  }

  test("confluent framing: round-trips arbitrary payloads and ids") {
    forAll(Gen.choose(0, Int.MaxValue), Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))) {
      (id, body) =>
        val (gotId, gotBody) = graft.streaming.KafkaIO.confluentUnframe(
          graft.streaming.KafkaIO.confluentFrame(id, body.toArray))
        assert(gotId == id && gotBody.toSeq == body)
    }
  }

  test("money format: always two decimals, round-trips within half a cent") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    forAll(Gen.listOfN(20, Gen.choose(0.0, 100000.0))) { vals =>
      whenever(vals.nonEmpty) {
        val out = vals.toDF("v").select(graft.functions.Scalars.moneyFmt(col("v"))).collect()
        out.map(_.getString(0)).zip(vals).foreach { case (s, v) =>
          assert(s.matches("-?\\d+\\.\\d{2}"), s"'$s' not money-shaped")
          assert(math.abs(s.toDouble - v) <= 0.005 + 1e-9)
        }
      }
    }
  }

  test("chunkForRag: covers every token, overlaps exactly, token accounting closes") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = (0 until 60).map { i =>
      val len = 1 + (i * 37) % 120
      (i.toLong, (1 to len).map(j => s"w$j").mkString(" "))
    }
    for ((size, overlap) <- Seq((40, 10), (20, 0), (15, 14), (1, 0))) {
      val out = graft.llmops.Curation
        .chunkForRag(docs.toDF("doc_id", "text"), "text", "doc_id", size, overlap)
        .collect().groupBy(_.getAs[Long]("doc_id"))
      docs.foreach { case (id, text) =>
        val len = text.split(" ").length
        val chunks = out(id).sortBy(_.getAs[Int]("chunk_idx"))
          .map(r => (r.getAs[String]("chunk_text").split(" ").toSeq, r.getAs[Long]("n_tokens")))
        // coverage: concatenating de-overlapped chunks reproduces the doc
        val stride = size - overlap
        val rebuilt = chunks.head._1 ++ chunks.tail.flatMap(_._1.drop(overlap))
        assert(rebuilt == text.split(" ").toSeq, s"coverage broken: doc $id size=$size ov=$overlap")
        // accounting: Σ n_tokens = len + overlap · (chunks − 1)
        assert(chunks.map(_._2).sum == len + overlap.toLong * (chunks.length - 1))
        chunks.foreach { case (c, n) => assert(c.length.toLong == n) }
        // every chunk but the last is full
        chunks.dropRight(1).foreach { case (c, _) => assert(c.length == size) }
      }
    }
  }

  test("lineDedup: no surviving chunk text appears twice corpus-wide") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val chunkOf = (tag: String) => (1 to 20).map(j => s"$tag$j").mkString(" ")
    val docs = (0 until 40).map { i =>
      // every third doc shares the boilerplate chunk; the rest are unique
      val parts = (if (i % 3 == 0) Seq(chunkOf("shared")) else Nil) :+ chunkOf(s"u$i")
      (i.toLong, parts.mkString(" "))
    }
    val out = graft.llmops.Dedup
      .lineDedup(docs.toDF("doc_id", "text"), "text", "doc_id", chunkWords = 20)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val allChunks = out.flatMap { case (_, text) =>
      text.split(" ").grouped(20).map(_.mkString(" ")).filter(_.nonEmpty)
    }
    assert(allChunks.distinct.length == allChunks.length,
      "a duplicated chunk survived in two places")
    // the winner (doc 0) keeps the shared chunk; every later sharer lost it
    val byId = out.toMap
    assert(byId(0L).startsWith("shared1 "))
    assert((3 until 40 by 3).forall(i => byId(i.toLong) == chunkOf(s"u$i")))
  }

  test("jlProject is linear: proj(a + b) == proj(a) + proj(b) up to float error") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val pairs = (0 until 60).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1), Array.fill(64)(rnd.nextFloat() * 2 - 1))
    }
    val out = pairs.toDF("id", "a", "b")
      .select(col("id"),
        graft.functions.Vectors.jlProject(col("a"), 16).as("pa"),
        graft.functions.Vectors.jlProject(col("b"), 16).as("pb"),
        graft.functions.Vectors.jlProject(
          zip_with(col("a"), col("b"), (x, y) => x + y), 16).as("pab"))
      .collect()
    out.foreach { r =>
      val (pa, pb, pab) = (r.getSeq[Double](1), r.getSeq[Double](2), r.getSeq[Double](3))
      pa.indices.foreach { k =>
        assert(math.abs(pa(k) + pb(k) - pab(k)) < 1e-5,
          s"linearity violated at dim $k: ${pa(k)} + ${pb(k)} vs ${pab(k)}")
      }
    }
  }

  test("merge: applyChangelog equals a naive map fold on random changelogs") {
    import spark.implicits._
    val changeGen = Gen.listOfN(30, for {
      k <- Gen.choose(1L, 8L)
      op <- Gen.oneOf("I", "U", "D")
      v <- Gen.alphaStr.map(_.take(4))
    } yield (k, v, op))
    forAll(changeGen, 12) { changes =>
      // unique (key, seq): seq = position in the log, the natural LSN
      val withSeq = changes.zipWithIndex.map { case ((k, v, op), i) => (k, v, op, i.toLong) }
      val base = (1L to 5L).map(k => (k, s"base$k"))
      val naive = withSeq.foldLeft(base.toMap) { case (acc, (k, v, op, _)) =>
        if (op == "D") acc - k else acc + (k -> v)
      }
      val got = graft.operators.Merge.applyChangelog(
          base.toDF("k", "v"), withSeq.toDF("k", "v", "op", "seq"), Seq("k"))
        .as[(Long, String)].collect().sortBy(_._1).toSeq
      // sorted-seq compare, NOT toMap: a map would silently swallow a
      // duplicate-key regression (base row leaking through beside its upsert)
      assert(got == naive.toSeq.sortBy(_._1), s"log=$withSeq")
    }
  }

  test("totalSort: positions are a permutation consistent with the sort key on random data") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dataGen = Gen.listOfN(200, Gen.choose(0, 25))
    (0 until 8).foreach { i =>
      val vs = dataGen.pureApply(Gen.Parameters.default, Seed(7L + i))
      val parts = 1 + i % 7
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      val out = graft.operators.Layout.totalSort(df, Seq(col("v"), col("id")),
          numShards = 3, numPartitions = parts)
        .select("id", "v", "global_pos").as[(Long, Int, Long)].collect().sortBy(_._3)
      assert(out.map(_._3).toSeq == (1L to vs.length))
      out.sliding(2).foreach { case Array((i1, v1, _), (i2, v2, _)) =>
        assert(v1 < v2 || (v1 == v2 && i1 < i2), "positions must follow (v, id) order")
      case _ => ()
      }
    }
  }

  test("jlProject imperative kernel ≡ HOF reference bit-for-bit (edges included)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(3)
    val rows: Seq[(Long, Seq[java.lang.Float])] =
      (1L to 50L).map(i => (i, Seq.fill(64)(java.lang.Float.valueOf(rnd.nextFloat() * 2 - 1)))) ++
        Seq((100L, Seq.empty[java.lang.Float]),
          (101L, null.asInstanceOf[Seq[java.lang.Float]]),
          (102L, Seq[java.lang.Float](1.0f, null, 2.0f))) // corrupt: null element
    val df = rows.toDF("id", "v")
    val got = df.select(col("id"),
        graft.functions.Vectors.jlProject(col("v"), 16).as("a"),
        graft.functions.Vectors.jlProjectHof(col("v"), 16).as("b"))
      .collect()
    got.foreach { r =>
      val a = r.getSeq[java.lang.Double](1)
      val b = r.getSeq[java.lang.Double](2)
      assert((a == null) == (b == null) && (a == null || a == b),
        s"id=${r.getLong(0)} diverged: $a vs $b")
    }
  }
}
