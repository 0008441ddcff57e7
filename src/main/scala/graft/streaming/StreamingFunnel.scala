package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, OutputMode}

/** Streaming twin of [[graft.operators.Behavior.funnel]]: per-user ordered
  * stage commits as a continuous stream. Each user's state is one committed
  * timestamp per stage (O(stages) — bounded, unlike a raw event buffer); a
  * stage commits when an event of its type STRICTLY follows the committed
  * previous stage, and each commit emits one `StageCommit` row downstream
  * (append mode — commits are immutable once emitted, exactly because the
  * batch operator's `min` semantics pick the FIRST qualifying event).
  *
  * Rows within a trigger are processed in event-time order; cross-trigger
  * ordering is the source's responsibility (same contract as
  * [[StreamingAnomaly]] — the reference replays sorted for the same reason).
  * State scales O(users × stages) and partitions by user-key hash.
  *
  * `ttlSeconds > 0` bounds the store on unbounded user spaces — the
  * reference's `SET 'sql.state-ttl' = '14 d'` analog (see
  * [[StreamingOps.ttlConf]]): a user idle past the TTL loses their partial
  * funnel; their next event starts a FRESH funnel at stage 0 (a post-TTL
  * "purchase" commits nothing, a post-TTL "view" re-enters at stage 0).
  */
object StreamingFunnel {

  case class Event(user: String, typ: String, ts: Timestamp)
  case class StageCommit(user: String, stage: String, stage_index: Int, ts: Timestamp)
  /** committedMicros(i) = event-time micros of stage i's commit, Long.MinValue when open. */
  case class FunnelState(committedMicros: List[Long])

  def apply(df: DataFrame, userCol: String, typeCol: String, tsCol: String,
            stages: Seq[String], ttlSeconds: Long = 0L,
            ttlWatermarkDelay: String = "0 seconds"): Dataset[StageCommit] = {
    require(stages.size >= 2, s"a funnel needs >= 2 stages, got $stages")
    // same contract as the batch Behavior.funnel: a duplicated stage name
    // would silently keep only the last index in stageIdx (ADVICE r3 #3)
    require(stages.distinct.size == stages.size, s"stages must be distinct, got $stages")
    implicit val evEnc = Encoders.product[Event]
    implicit val outEnc = Encoders.product[StageCommit]
    implicit val stEnc = Encoders.product[FunnelState]
    implicit val keyEnc = Encoders.STRING
    val stageIdx = stages.zipWithIndex.toMap

    val sel = df.select(col(userCol).cast("string").as("user"),
      col(typeCol).cast("string").as("typ"),
      col(tsCol).cast("timestamp").as("ts"))
    val src = if (ttlSeconds > 0) sel.withWatermark("ts", ttlWatermarkDelay) else sel
    src.as[Event]
      .groupByKey(_.user)
      .flatMapGroupsWithState[FunnelState, StageCommit](OutputMode.Append(), StreamingOps.ttlConf(ttlSeconds)) {
        (user: String, rows: Iterator[Event], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val committed = state.getOption
              .map(_.committedMicros.toArray)
              .getOrElse(Array.fill(stages.size)(Long.MinValue))
            val out = Seq.newBuilder[StageCommit]
            val sorted = rows.toSeq.sortBy(ev => StreamingOps.tsMicros(ev.ts))
            sorted.foreach { ev =>
              stageIdx.get(ev.typ).foreach { i =>
                val micros = StreamingOps.tsMicros(ev.ts)
                val prevOk = i == 0 || (committed(i - 1) != Long.MinValue && micros > committed(i - 1))
                if (committed(i) == Long.MinValue && prevOk) {
                  committed(i) = micros
                  out += StageCommit(user, stages(i), i, ev.ts)
                }
              }
            }
            state.update(FunnelState(committed.toList))
            if (sorted.nonEmpty)
              StreamingOps.armTtl(state, ttlSeconds, StreamingOps.tsMicros(sorted.last.ts))
            out.result().iterator
          }
      }
  }
}
