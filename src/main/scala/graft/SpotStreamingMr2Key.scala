package graft

import org.apache.spark.sql.functions._

/** Scale spot-run for multi-column PARTITION BY on streaming MATCH_RECOGNIZE
  * (r13): replay the events table as a TRUE multi-micro-batch stream and run
  * a TWO-key-column pattern CTAS through the FULL standing-statement path
  * ([[graft.sql.StreamPlanner]] — KeyImage composite state key, hidden
  * all-variables SUBSET re-emitting the typed key columns), then check span
  * + measure-value parity against the batch scan route on the same rows.
  *
  * Bounded-stream contract (the SpotStreamingMr discipline): streamed rows
  * must be a subset of the batch rows missing at most one open tail per
  * COMPOSITE key; everything present must match value-exactly (symmetric
  * exceptAll counts, nothing collected to the driver).
  *
  * `restartAfter` (arg 3, r14 — the composite-key recovery proof): > 0
  * kills the standing statement after that many committed micro-batches —
  * every composite key holds mid-pattern KeyImage state — and resumes it
  * from its own checkpoint via [[graft.sql.StatementCatalog.relightStanding]]
  * (the FULL planner path, not a hand-built writeStream); the parity gate is
  * unchanged, so a pass proves the KeyImage state key + typed re-emission +
  * timers all ride the checkpoint at sf10 volume.
  *
  * Usage: runMain graft.SpotStreamingMr2Key <sfDir> [slices] [restartAfter]
  */
object SpotStreamingMr2Key {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("benchdata/sf10")
    val slices = args.lift(1).map(_.toInt).getOrElse(20)
    val restartAfter = args.lift(2).map(_.toInt).getOrElse(0)
    require(restartAfter < slices,
      s"restartAfter=$restartAfter must be < slices=$slices (one batch per slice)")
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import graft.sources.TableRegistry
    import graft.sql.{SqlFrontend, StatementCatalog}

    val tmp = java.nio.file.Files.createTempDirectory("mr2key").toString
    val (feed, ev) = SpotStreamingMr.makeFeed(spark, sfDir, slices, tmp)
    println(s"[mr2key] feed ready: $slices slices")

    val schema = spark.read.parquet(feed).schema
    TableRegistry.createTable(TableRegistry.TableDef("mr2k_events", Some(schema),
      load = s => s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema),
      loadStream = Some(s => s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(feed))))

    // each (user, event_type) sub-stream is its own CEP partition — proving
    // the state key is the COMPOSITE, not user_id alone, at sf10 volume
    val mrSql = """
      |SELECT * FROM %s
      |  MATCH_RECOGNIZE (
      |    PARTITION BY user_id, event_type
      |    ORDER BY ts, event_id
      |    MEASURES FIRST(S.ts) AS s_ts, FINAL LAST(U.value) AS top,
      |             FINAL count(M.*) AS n_rows, FINAL sum(M.value) AS m_sum
      |    ONE ROW PER MATCH
      |    PATTERN (S D+ U+)
      |    SUBSET M = (S, D, U)
      |    DEFINE D AS D.value < PREV(D.value), U AS U.value > PREV(U.value)
      |  )""".stripMargin

    val t0 = System.nanoTime()
    SqlFrontend.execute(spark, "CREATE TABLE mr2k_matches AS" + mrSql.format("mr2k_events"))
    val q = StatementCatalog.get("mr2k_matches").collect {
      case s: StatementCatalog.Standing => s.query
    }.getOrElse(sys.error("multi-key MR CTAS must register a standing statement"))
    if (restartAfter <= 0) { try q.processAllAvailable() finally q.stop() }
    else {
      // kill mid-drain: wait for `restartAfter` committed batches, stop the
      // statement, and RELIGHT it from its own checkpoint (r14). A query that
      // dies before committing that many batches must abort the harness loudly
      // — lastProgress plateaus on failure and the loop would spin forever.
      val deadline = System.nanoTime() + 30L * 60 * 1000 * 1000 * 1000
      while (Option(q.lastProgress).forall(_.batchId < restartAfter.toLong)) {
        q.exception.foreach(e => throw e)
        if (System.nanoTime() > deadline)
          sys.error(s"mr2key: no batch $restartAfter after 30 min (lastProgress=${Option(q.lastProgress).map(_.batchId)})")
        Thread.sleep(200)
      }
      q.stop()
      println(s"[mr2key] killed after batch ${q.lastProgress.batchId}; relighting from checkpoint")
      val r = StatementCatalog.relightStanding("mr2k_matches")
      try r.processAllAvailable() finally r.stop()
    }
    val sec = (System.nanoTime() - t0) / 1e9

    def shape(df: org.apache.spark.sql.DataFrame) = df.select(
      col("user_id").cast("long"), col("event_type").cast("string"),
      unix_micros(col("s_ts").cast("timestamp")).as("s_us"),
      col("top").cast("double"), col("n_rows").cast("long"),
      col("m_sum").cast("decimal(38,6)"))
    val streamed = shape(SqlFrontend.execute(spark, "SELECT * FROM mr2k_matches"))
    ev.createOrReplaceTempView("mr2k_batch")
    val batch = shape(SqlFrontend.execute(spark, mrSql.format("mr2k_batch")))

    val nStream = streamed.count()
    val nBatch = batch.count()
    val extra = streamed.exceptAll(batch).count() // must be empty
    val missing = batch.exceptAll(streamed).count() // <= one open tail per composite key
    val nKeys = ev.select("user_id", "event_type").distinct().count()
    val nEvents = ev.count()
    val ok = nStream > 0 && extra == 0 && missing <= nKeys
    println(f"""[mr2key] {"sec":$sec%.1f,"slices":$slices,"events":$nEvents,"eventsPerSec":${(nEvents / sec).toLong},"streamMatches":$nStream,"batchMatches":$nBatch,"extra":$extra,"missingFinal":$missing,"compositeKeys":$nKeys,"ok":$ok}""")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
