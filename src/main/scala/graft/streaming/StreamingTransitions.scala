package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.Behavior.transitionMatrix]]: emit one
  * (prev_type, next_type) pair row per adjacent event per user, continuously.
  *
  * The batch form's lag window cannot cross micro-batches; here per-user
  * state carries EXACTLY the last seen event (O(1) per user — the same
  * bounded-state discipline as sessionize), so the pair where one micro-batch
  * ends and the next begins is still emitted. Downstream the pair stream is
  * an ordinary mergeable count — aggregate it live (update-mode counts) or
  * absorb it into the incremental rollup
  * ([[graft.operators.MaterializedAgg]]) and derive probabilities at read
  * time, the same split the batch operator uses.
  *
  * Late data caveat: pairs follow ARRIVAL order within the state's view
  * (in-batch rows are time-sorted, cross-batch order is arrival order) — the
  * streaming estimate converges to the batch matrix when users' events
  * arrive in order, the usual mapGroupsWithState contract.
  *
  * `ttlSeconds > 0` bounds the store on unbounded user spaces — the
  * reference's `SET 'sql.state-ttl' = '14 d'` analog (see
  * [[StreamingOps.ttlConf]]): a user idle past the TTL loses their last
  * event, so NO pair is emitted across the eviction gap (adjacency over a
  * dead gap is noise for a transition estimate anyway); their next event
  * starts a fresh chain, exactly like a first-ever event.
  */
object StreamingTransitions {

  case class Ev(user: String, tie: Long, ts: Timestamp, etype: String)
  case class Pair(user: String, prev_type: String, next_type: String)
  case class LastEv(micros: Long, tie: Long, etype: String)

  def pairs(df: DataFrame, userCol: String, typeCol: String, tsCol: String,
            tieCol: String, ttlSeconds: Long = 0L,
            ttlWatermarkDelay: String = "0 seconds"): Dataset[Pair] = {
    implicit val evEnc = Encoders.product[Ev]
    implicit val outEnc = Encoders.product[Pair]
    implicit val stEnc = Encoders.product[LastEv]
    implicit val keyEnc = Encoders.STRING

    // null tie/ts coalesce to minimal sentinels rather than dropping the
    // row: a dropped event would also break the ADJACENCY chain (the next
    // event would pair with the wrong predecessor), diverging from the
    // batch lag-window which orders nulls first and keeps every pair
    val sel = df.select(col(userCol).cast("string").as("user"),
      coalesce(col(tieCol).cast("long"), lit(Long.MinValue)).as("tie"),
      coalesce(col(tsCol).cast("timestamp"), to_timestamp(lit(0))).as("ts"),
      col(typeCol).cast("string").as("etype"))
    val src = if (ttlSeconds > 0) sel.withWatermark("ts", ttlWatermarkDelay) else sel
    src.as[Ev]
      .groupByKey(_.user)
      .flatMapGroupsWithState[LastEv, Pair](OutputMode.Append(), StreamingOps.ttlConf(ttlSeconds)) {
        (user: String, rows: Iterator[Ev], state: GroupState[LastEv]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val out = Seq.newBuilder[Pair]
            var prev = state.getOption
            rows.toSeq.sortBy(e => (StreamingOps.tsMicros(e.ts), e.tie)).foreach { e =>
              prev.foreach(p => out += Pair(user, p.etype, e.etype))
              prev = Some(LastEv(StreamingOps.tsMicros(e.ts), e.tie, e.etype))
            }
            prev.foreach { p => state.update(p); StreamingOps.armTtl(state, ttlSeconds, p.micros) }
            out.result().iterator
          }
      }
  }

  /** Live transition counts: the pair stream aggregated in update mode —
    * feed probabilities from these counts at read time (n / sum per prev).
    */
  def counts(df: DataFrame, userCol: String, typeCol: String, tsCol: String,
             tieCol: String): DataFrame =
    pairs(df, userCol, typeCol, tsCol, tieCol).toDF()
      .groupBy("prev_type", "next_type").agg(count(lit(1)).as("n"))
}
