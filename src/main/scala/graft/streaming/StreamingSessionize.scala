package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, OutputMode}

/** Streaming twin of [[graft.operators.Behavior.sessionize]]: label every
  * event with its per-user session sequence number as it arrives. A label
  * depends only on the PRECEDING event of the same user (gap test), so each
  * event emits in the micro-batch it arrives in — no buffering until session
  * close, and the state is O(1) per user: (last event time, sessions so far).
  * Labels are immutable once emitted, which is what append mode needs.
  *
  * Within-trigger rows process in event-time order; cross-trigger ordering is
  * the source's responsibility (same contract as [[StreamingAnomaly]] and
  * [[StreamingScd2]]).
  *
  * `ttlSeconds > 0` bounds the store on unbounded user spaces — the
  * reference's `SET 'sql.state-ttl' = '14 d'` analog (see
  * [[StreamingOps.ttlConf]]): a user idle past the TTL loses their (last
  * event time, session count) pair; their next event re-enters as a
  * first-ever event — session_seq RESTARTS AT 1. A TTL at or above the
  * session gap keeps labels consistent (an evicted user was past the gap
  * anyway, only the seq numbering resets); a TTL below the gap can split
  * what batch would call one session.
  */
object StreamingSessionize {

  case class Ev(user: String, tie: Long, ts: Timestamp)
  case class Labeled(user: String, tie: Long, ts: Timestamp, session_seq: Long)
  case class SessState(lastMicros: Long, seq: Long)

  def apply(df: DataFrame, userCol: String, tsCol: String, tieCol: String,
            gapSeconds: Long, ttlSeconds: Long = 0L,
            ttlWatermarkDelay: String = "0 seconds"): Dataset[Labeled] = {
    implicit val evEnc = Encoders.product[Ev]
    implicit val outEnc = Encoders.product[Labeled]
    implicit val stEnc = Encoders.product[SessState]
    implicit val keyEnc = Encoders.STRING
    val gapMicros = gapSeconds * 1000000L

    val sel = df.select(col(userCol).cast("string").as("user"),
      col(tieCol).cast("long").as("tie"),
      col(tsCol).cast("timestamp").as("ts"))
    val src = if (ttlSeconds > 0) sel.withWatermark("ts", ttlWatermarkDelay) else sel
    src.as[Ev]
      .groupByKey(_.user)
      .flatMapGroupsWithState[SessState, Labeled](OutputMode.Append(), StreamingOps.ttlConf(ttlSeconds)) {
        (user: String, rows: Iterator[Ev], state: GroupState[SessState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var st = state.getOption.getOrElse(SessState(Long.MinValue, 0L))
            val out = Seq.newBuilder[Labeled]
            rows.toSeq.sortBy(e => (StreamingOps.tsMicros(e.ts), e.tie)).foreach { e =>
              val micros = StreamingOps.tsMicros(e.ts)
              val isNew = st.seq == 0L || micros - st.lastMicros > gapMicros
              st = SessState(micros, if (isNew) st.seq + 1 else st.seq)
              out += Labeled(user, e.tie, e.ts, st.seq)
            }
            state.update(st)
            StreamingOps.armTtl(state, ttlSeconds, st.lastMicros)
            out.result().iterator
          }
      }
  }
}
