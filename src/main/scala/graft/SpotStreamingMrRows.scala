package graft

import org.apache.spark.sql.functions._

/** Scale spot-run for streaming ALL ROWS PER MATCH / exclusion / SUBSET
  * (r12): replay the events table as a TRUE multi-micro-batch stream
  * ([[SpotStreamingMr.makeFeed]]'s time-sliced files, maxFilesPerTrigger =
  * 1), drain one of the r12 standing shapes through
  * [[graft.streaming.StreamingMatchRecognize]], and check PER-ROW value
  * parity against the batch scan route on the same rows.
  *
  * Modes (arg 3):
  *   - `q173` — ALL ROWS with CLASSIFIER + RUNNING LAST(D/U.value) +
  *     FINAL LAST(U.value) (the q165/q173 catalog shape);
  *   - `q178` — ALL ROWS with `{- D+ -}` exclusion + FINAL count(D.*);
  *   - `q177` — ONE ROW with SUBSET M = (D, U) pooled aggregates.
  *
  * Bounded-stream contract (the SpotStreamingMr discipline): a match still
  * OPEN when the file stream ends never emits — so the streamed MATCH SPAN
  * set must be a subset of the batch set missing at most one final span per
  * key, and on the COMMON spans the per-row output must match the batch scan
  * EXACTLY (symmetric exceptAll counts after a span semi-join; nothing
  * collected to the driver).
  *
  * `restartAfter` (arg 4, r13): > 0 kills the standing query after that many
  * committed micro-batches — EVERY key holds mid-pattern state at a slice
  * boundary — and restarts a NEW query instance on the same checkpoint; the
  * parity gate is unchanged, so a pass proves checkpoint-restart recovery of
  * the full Buf state (buffered rows, cursor, matchSeq) at sf10 volume on
  * the RocksDB engine, the production-shaped twin of RecoverySpec's
  * MemoryStream proof.
  *
  * Mode `q167` (r14): ALL ROWS under `AFTER MATCH SKIP TO LAST U` with
  * MATCH_NUMBER — the overlapping-runs strategy (each match re-anchors at
  * the previous peak), value-parity against the batch scan per row AND per
  * ordinal.
  *
  * `engine` (arg 5, r14): `rocksdb` (default — transformWithState + RocksDB,
  * the Bench.session route) or `heap` (flatMapGroupsWithState on the
  * HDFS-backed heap provider) — the two state engines share one processKey,
  * and running the same mode under both then diffing sinks
  * (tools/compare_dumps.py) is the at-scale engine-equality gate.
  * `dumpDir` (arg 6): copy the streamed sink to `<dumpDir>/<mode>/` for that
  * diff.
  *
  * Usage: runMain graft.SpotStreamingMrRows <sfDir> [slices] [mode]
  * [restartAfter] [engine] [dumpDir]
  */
object SpotStreamingMrRows {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("benchdata/sf10")
    val slices = args.lift(1).map(_.toInt).getOrElse(20)
    val mode = args.lift(2).getOrElse("q173")
    val restartAfter = args.lift(3).map(_.toInt).getOrElse(0)
    val engine = args.lift(4).getOrElse("rocksdb")
    val dumpDir = args.lift(5)
    require(Set("q173", "q178", "q177", "q167", "mnseq").contains(mode), s"unknown mode '$mode'")
    require(Set("rocksdb", "heap").contains(engine), s"unknown engine '$engine'")
    // a restart target at/past the feed's batch count would spin the wait
    // loop forever once the stream drains (r13 ADVICE) — refuse up front
    require(restartAfter < slices,
      s"restartAfter=$restartAfter must be < slices=$slices (the feed yields one batch per slice)")
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    if (engine == "heap")
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
    import graft.operators.{MatchRecognize, MrPattern}
    import graft.streaming.StreamingMatchRecognize
    import graft.streaming.StreamingMatchRecognize.{MrAggMeasure, MrMeasure}

    val tmp = java.nio.file.Files.createTempDirectory("mrrows").toString
    val (feed, ev) = SpotStreamingMr.makeFeed(spark, sfDir, slices, tmp)
    println(s"[mrrows] feed ready: $slices slices, mode=$mode")

    val pattern = if (mode == "q178") "S {- D+ -} U+" else "S D+ U+"
    val (bs, names) = MrPattern.expand(pattern)
    val nidx = names.zipWithIndex.toMap
    val branches = bs.map(_.map(t =>
      MatchRecognize.BTok(nidx(t.name), t.lo, t.hi, t.reluctant, t.excluded)).toIndexedSeq)
    val defs = Seq(None, Some("D.value < PREV(D.value)"), Some("U.value > PREV(U.value)"))
    val allRows = mode != "q177" && mode != "mnseq"
    // q167 (r14): the overlapping-runs strategy — the cursor re-anchors AT
    // each match's peak row, so a peak that seeds the next fall starts a new
    // match the skip-past modes consume away.
    // mnseq (r15): MATCH_NUMBER under SKIP TO NEXT ROW — every start decides
    // independently and decided winners defer behind the undecided frontier
    // so ordinals flush in start order (the r15 deferral buffer at scale).
    val skipStrategy: MatchRecognize.Skip = mode match {
      case "q167" => MatchRecognize.SkipToLast(nidx("U"))
      case "mnseq" => MatchRecognize.SkipToNextRow
      case _ => MatchRecognize.SkipPastLastRow
    }
    val matchNumberAlias =
      if (mode == "q167" || mode == "mnseq") Some("match_seq") else None
    val (measures, aggMeasures, subsets) = mode match {
      case "q173" => (Seq(
        MrMeasure(isFirst = false, nidx("D"), "value", "run_bottom", running = true),
        MrMeasure(isFirst = false, nidx("U"), "value", "run_top", running = true),
        MrMeasure(isFirst = false, nidx("U"), "value", "final_top")),
        Seq.empty[MrAggMeasure], Seq.empty[(String, Seq[Int])])
      case "q178" => (Seq(
        MrMeasure(isFirst = false, nidx("U"), "value", "final_top")),
        Seq(MrAggMeasure("cnt", nidx("D"), "*", "n_down")),
        Seq.empty[(String, Seq[Int])])
      case "q167" | "mnseq" => (Seq(
        MrMeasure(isFirst = false, nidx("U"), "value", "final_top")),
        Seq.empty[MrAggMeasure], Seq.empty[(String, Seq[Int])])
      case _ => (Seq( // q177: SUBSET M = (D, U) at tok = nTok
        MrMeasure(isFirst = true, names.size, "value", "move_first"),
        MrMeasure(isFirst = false, names.size, "value", "move_last")),
        Seq(MrAggMeasure("cnt", names.size, "*", "move_rows"),
          MrAggMeasure("sum", names.size, "value", "move_sum"),
          MrAggMeasure("min", names.size, "value", "move_min")),
        Seq(("M", Seq(nidx("D"), nidx("U")))))
    }

    val schema = spark.read.parquet(feed).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(feed)
    // peak retained buffer rows for any key (post-batch, after eviction)
    val probe = new graft.streaming.StreamingOps.MaxAccumulator
    spark.sparkContext.register(probe, "mr_peak_state_rows")
    val matched = StreamingMatchRecognize.applyPattern(
      stream, "user_id", condCols = Seq("value"), tsCol = "ts", tieCol = "event_id",
      varNames = names, branches = branches, defs = defs, skip = skipStrategy,
      stateProbe = Some(probe),
      measures = measures, aggMeasures = aggMeasures, allRows = allRows,
      subsets = subsets, tree = Some(MrPattern.parse(pattern)),
      matchNumberAlias = matchNumberAlias)
    val t0 = System.nanoTime()
    def startQ() = matched.writeStream.format("parquet")
      .option("path", s"$tmp/sink").option("checkpointLocation", s"$tmp/ckpt")
      .outputMode("append").start()
    val q = startQ()
    val q2 =
      if (restartAfter <= 0) { try q.processAllAvailable() finally q.stop(); q }
      else {
        // kill mid-drain: wait for `restartAfter` committed batches, stop,
        // and resume a NEW instance from the checkpoint
        while (Option(q.lastProgress).forall(_.batchId < restartAfter.toLong))
          Thread.sleep(200)
        q.stop()
        println(s"[mrrows] killed after batch ${q.lastProgress.batchId}; " +
          "restarting from checkpoint")
        val r = startQ()
        try r.processAllAvailable() finally r.stop()
        r
      }
    val sec = (System.nanoTime() - t0) / 1e9
    // state-store telemetry from the final progress line (r13): total keyed
    // state rows and the store's own memory reading — with the RocksDB
    // provider (the Bench.session default) that memory is off-heap
    val stateOp = q2.recentProgress.reverse.find(_.stateOperators.nonEmpty)
      .map(_.stateOperators.head)
    val stateRows = stateOp.map(_.numRowsTotal).getOrElse(-1L)
    val stateMem = stateOp.map(_.memoryUsedBytes).getOrElse(-1L)

    // ---- the batch scan route on the same rows, projected to the streamed
    // shape (start_tie identifies the match on every emitted row)
    ev.createOrReplaceTempView("mrrows_events")
    val batchSql = mode match {
      case "q173" => """
        SELECT * FROM mrrows_events MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts, event_id
          MEASURES FIRST(S.event_id) AS m_start_tie, CLASSIFIER() AS cls,
                   LAST(D.value) AS run_bottom, LAST(U.value) AS run_top,
                   FINAL LAST(U.value) AS final_top
          ALL ROWS PER MATCH
          PATTERN (S D+ U+)
          DEFINE D AS D.value < PREV(D.value), U AS U.value > PREV(U.value)
        )"""
      case "q178" => """
        SELECT * FROM mrrows_events MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts, event_id
          MEASURES FIRST(S.event_id) AS m_start_tie, CLASSIFIER() AS cls,
                   FINAL LAST(U.value) AS final_top, FINAL count(D.*) AS n_down
          ALL ROWS PER MATCH
          PATTERN (S {- D+ -} U+)
          DEFINE D AS D.value < PREV(D.value), U AS U.value > PREV(U.value)
        )"""
      case "q167" => """
        SELECT * FROM mrrows_events MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts, event_id
          MEASURES FIRST(S.event_id) AS m_start_tie, CLASSIFIER() AS cls,
                   FINAL LAST(U.value) AS final_top, MATCH_NUMBER() AS match_seq
          ALL ROWS PER MATCH
          AFTER MATCH SKIP TO LAST U
          PATTERN (S D+ U+)
          DEFINE D AS D.value < PREV(D.value), U AS U.value > PREV(U.value)
        )"""
      case "mnseq" => """
        SELECT * FROM mrrows_events MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts, event_id
          MEASURES FIRST(S.event_id) AS m_start_tie,
                   LAST(U.value) AS final_top, MATCH_NUMBER() AS match_seq
          ONE ROW PER MATCH
          AFTER MATCH SKIP TO NEXT ROW
          PATTERN (S D+ U+)
          DEFINE D AS D.value < PREV(D.value), U AS U.value > PREV(U.value)
        )"""
      case _ => """
        SELECT * FROM mrrows_events MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts, event_id
          MEASURES FIRST(S.event_id) AS m_start_tie,
                   FIRST(M.value) AS move_first, LAST(M.value) AS move_last,
                   count(M.*) AS move_rows, sum(M.value) AS move_sum,
                   min(M.value) AS move_min
          ONE ROW PER MATCH
          PATTERN (S D+ U+)
          SUBSET M = (D, U)
          DEFINE D AS D.value < PREV(D.value), U AS U.value > PREV(U.value)
        )"""
    }
    val batch0 = graft.sql.SqlFrontend.execute(spark, batchSql)
    val streamed0 = spark.read.parquet(s"$tmp/sink")
    val (batch, streamed) = mode match {
      case "q177" =>
        (batch0.select(col("user_id").cast("string").as("key"),
          col("m_start_tie").cast("long").as("start_tie"),
          col("move_first"), col("move_last"), col("move_rows").cast("long"),
          col("move_sum").cast("decimal(38,6)"), col("move_min")),
          streamed0.select(col("key"), col("start_tie"),
            col("move_first"), col("move_last"), col("move_rows"),
            col("move_sum"), col("move_min")))
      case "q167" =>
        // per-row AND per-ordinal parity: match_seq rides every emitted row,
        // so a single scrambled ordinal fails the exceptAll gate
        (batch0.select(col("user_id").cast("string").as("key"),
          col("m_start_tie").cast("long").as("start_tie"),
          unix_micros(col("ts").cast("timestamp")).as("row_us"),
          col("event_id").cast("long").as("row_tie"), col("value"),
          col("cls"), col("final_top"), col("match_seq").cast("long")),
          streamed0.select(col("key"), col("start_tie"),
            unix_micros(col("row_ts")).as("row_us"),
            col("row_tie"), col("value"), col("cls"), col("final_top"),
            col("match_seq")))
      case "mnseq" =>
        // ONE ROW: (key, start_tie) identifies the match; match_seq rides it,
        // so a single scrambled ordinal fails the exceptAll gate
        (batch0.select(col("user_id").cast("string").as("key"),
          col("m_start_tie").cast("long").as("start_tie"),
          col("final_top"), col("match_seq").cast("long")),
          streamed0.select(col("key"), col("start_tie"),
            col("final_top"), col("match_seq")))
      case "q178" =>
        (batch0.select(col("user_id").cast("string").as("key"),
          col("m_start_tie").cast("long").as("start_tie"),
          unix_micros(col("ts").cast("timestamp")).as("row_us"),
          col("event_id").cast("long").as("row_tie"), col("value"),
          col("cls"), col("final_top"), col("n_down").cast("long")),
          streamed0.select(col("key"), col("start_tie"),
            unix_micros(col("row_ts")).as("row_us"),
            col("row_tie"), col("value"), col("cls"), col("final_top"), col("n_down")))
      case _ =>
        (batch0.select(col("user_id").cast("string").as("key"),
          col("m_start_tie").cast("long").as("start_tie"),
          unix_micros(col("ts").cast("timestamp")).as("row_us"),
          col("event_id").cast("long").as("row_tie"), col("value"),
          col("cls"), col("run_bottom"), col("run_top"), col("final_top")),
          streamed0.select(col("key"), col("start_tie"),
            unix_micros(col("row_ts")).as("row_us"),
            col("row_tie"), col("value"), col("cls"),
            col("run_bottom"), col("run_top"), col("final_top")))
    }
    // decided spans must be a subset of the batch spans missing at most the
    // one open tail per key; on common spans the rows must match EXACTLY
    val streamedSpans = streamed.select("key", "start_tie").distinct()
    val batchSpans = batch.select("key", "start_tie").distinct()
    val extraSpans = streamedSpans.exceptAll(batchSpans).count()
    val missingSpans = batchSpans.exceptAll(streamedSpans).count()
    val common = batch.join(streamedSpans, Seq("key", "start_tie"), "left_semi")
    val extraRows = streamed.exceptAll(common).count()
    val missingRows = common.exceptAll(streamed).count()
    val nKeys = ev.select("user_id").distinct().count()
    val nEvents = ev.count()
    val nStream = streamed.count()
    val nBatch = batch.count()
    // engine A/B support (r14): persist the PROJECTED streamed output for
    // tools/compare_dumps.py (heap vs RocksDB hash equality at sf10)
    dumpDir.foreach { d =>
      streamed.write.mode("overwrite").parquet(s"$d/$mode")
      println(s"[mrrows] dump written: $d/$mode (engine=$engine)")
    }
    // mnseq: SKIP TO NEXT ROW can leave SEVERAL open starts per key at the
    // bounded-stream tail (every position in the final wave is its own
    // start), so the one-final-span-per-key bound doesn't apply. The
    // replacement gate is stronger where it matters: the streamed matches
    // must be exactly the batch list's PREFIX per key — common spans value-
    // AND-ordinal exact (exceptAll) and per-key max(match_seq) == count
    // (consecutive from 1, no gap where a deferred winner was lost).
    val prefixBad =
      if (mode != "mnseq") 0L
      else streamed.groupBy("key")
        .agg(max(col("match_seq")).as("mx"), count(lit(1)).as("n"))
        .filter(col("mx") =!= col("n")).count()
    val ok = nStream > 0 && extraSpans == 0 &&
      (if (mode == "mnseq") prefixBad == 0 else missingSpans <= nKeys) &&
      extraRows == 0 && missingRows == 0
    println(f"""[mrrows] {"mode":"$mode","engine":"$engine","restartAfter":$restartAfter,"sec":$sec%.1f,"slices":$slices,"events":$nEvents,"eventsPerSec":${(nEvents / sec).toLong},"streamRows":$nStream,"batchRows":$nBatch,"extraSpans":$extraSpans,"missingFinalSpans":$missingSpans,"extraRows":$extraRows,"missingRowsOnCommonSpans":$missingRows,"prefixBad":$prefixBad,"keys":$nKeys,"peakStateRows":${probe.value},"stateRowsTotal":$stateRows,"stateMemBytes":$stateMem,"ok":$ok}""")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
