package graft

import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingTemporalJoin

class StreamingTemporalJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("probes join the version valid at their time; emission waits for the watermark") {
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sq = spark.sqlContext
      implicit val enc = Encoders.product[(String, Timestamp, String)]
      val probes = MemoryStream[(String, Timestamp, String)]
      val versions = MemoryStream[(String, Timestamp, String)]
      val joined = StreamingTemporalJoin(
        probes.toDF().toDF("k", "pts", "amount"),
        versions.toDF().toDF("k", "vts", "rate"),
        "5 seconds", "k", "pts", "amount", "k", "vts", "rate", leftJoin = true)
      val q = joined.writeStream.format("memory").queryName("tj_sink")
        .outputMode("append").start()
      try {
        versions.addData(
          ("EUR", ts("2024-01-01 00:00:00"), "1.05"),
          ("EUR", ts("2024-01-01 12:00:00"), "1.10"),
          ("GBP", ts("2024-01-01 00:00:00"), "1.25"))
        probes.addData(
          ("EUR", ts("2024-01-01 06:00:00"), "100"),
          ("EUR", ts("2024-01-01 18:00:00"), "200"),
          ("GBP", ts("2024-01-01 12:00:00"), "50"),
          ("JPY", ts("2024-01-01 12:00:00"), "10")) // no version ever -> left null
        q.processAllAvailable()
        // the union watermark is the MIN of both sides: probes reach 17:59:55
        // but versions only 11:59:55 — so the lagging version stream holds
        // every probe at-or-after 12:00 back, and only EUR@06:00 may emit
        val first = spark.table("tj_sink").collect()
        assert(first.length == 1 && first.head.getAs[Timestamp]("probe_ts") == ts("2024-01-01 06:00:00"),
          "only probes below the min(probe, version) watermark may emit")

        // advance BOTH watermarks (the union tracks the minimum)
        probes.addData(("ZZZ", ts("2024-01-02 00:00:00"), "0"))
        versions.addData(("ZZZ", ts("2024-01-02 00:00:00"), "0"))
        q.processAllAvailable()

        val got = spark.table("tj_sink")
          .filter(col("key") =!= "ZZZ")
          .collect().map(r => (r.getAs[String]("key"), r.getAs[Timestamp]("probe_ts").toString,
            r.getAs[String]("payload"), Option(r.getAs[String]("state")))).toSet
        assert(got == Set(
          ("EUR", "2024-01-01 06:00:00.0", "100", Some("1.05")),
          ("EUR", "2024-01-01 18:00:00.0", "200", Some("1.10")),
          ("GBP", "2024-01-01 12:00:00.0", "50", Some("1.25")),
          ("JPY", "2024-01-01 12:00:00.0", "10", None)))
      } finally q.stop()
    } finally {
      prior match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None    => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming result equals batch AsOfJoin on a closed randomized input") {
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sq = spark.sqlContext
      implicit val enc = Encoders.product[(String, Timestamp, String)]
      import spark.implicits._
      val rnd = new scala.util.Random(23)
      val base = 1700000000000L
      // distinct version timestamps per key (AsOfJoin's uniqueness contract)
      val vRows = (for (k <- Seq("a", "b", "c"); i <- 0 until 40)
        yield (k, new Timestamp(base + (rnd.nextInt(5000) * 37L + i) * 1000L), s"$k-v$i"))
      val pRows = (for (k <- Seq("a", "b", "c", "d"); i <- 0 until 60)
        yield (k, new Timestamp(base + rnd.nextInt(200000) * 1000L), s"$k-p$i"))

      val probes = MemoryStream[(String, Timestamp, String)]
      val versions = MemoryStream[(String, Timestamp, String)]
      val joined = StreamingTemporalJoin(
        probes.toDF().toDF("k", "pts", "amount"),
        versions.toDF().toDF("k", "vts", "rate"),
        "5 seconds", "k", "pts", "amount", "k", "vts", "rate")
      val q = joined.writeStream.format("memory").queryName("tj_rand_sink")
        .outputMode("append").start()
      try {
        // one batch per side: random timestamps across batches would be
        // late-dropped by the watermark (correctly) but kept by the batch
        // oracle — in-batch disorder still exercises the operator fully
        versions.addData(vRows: _*); probes.addData(pRows: _*)
        q.processAllAvailable()
        val close = new Timestamp(base + 500000000L)
        versions.addData(("zz", close, "z")); probes.addData(("zz", close, "z"))
        q.processAllAvailable()
      } finally q.stop()

      // batch oracle: AsOfJoin over everything that was in-order (the stream
      // dropped nothing here — each batch's data is far above the previous
      // watermark... except cross-batch late rows, so feed ordered batches)
      val batch = graft.operators.AsOfJoin(
        pRows.toDF("k", "pts", "amount"), vRows.toDF("k2", "vts", "rate"),
        "k", "k2", "pts", "vts", Seq("vts", "rate"))
        .select(col("k"), col("pts"), col("amount"), col("vts"), col("rate"))
      val streamed = spark.table("tj_rand_sink").filter(col("key") =!= "zz")
        .select(col("key").as("k"), col("probe_ts").as("pts"), col("payload").as("amount"),
          col("version_ts").as("vts"), col("state").as("rate"))
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        "closed streaming temporal join must equal batch AsOfJoin")
      assert(streamed.count() == batch.count() && batch.count() > 50)
    } finally {
      prior match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None    => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
