package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, OutputMode}

/** Streaming twin of [[graft.operators.Behavior.sequenceMatch]] (the
  * MATCH_RECOGNIZE STRICT-contiguity primitive): a match is `pattern.size`
  * consecutive events of one user's time-ordered stream, and it is fully
  * determined the moment its LAST event arrives — so each match emits in that
  * event's micro-batch, immutably, which is exactly append mode.
  *
  * State per key is the trailing `pattern.size − 1` (type, ts, tie) events —
  * O(pattern), never an event buffer. Within a trigger rows process in
  * (ts, tie) order; cross-trigger ordering is the source's responsibility
  * (same contract as StreamingAnomaly/StreamingFunnel/StreamingScd2).
  *
  * `ttlSeconds > 0` bounds the store on unbounded key spaces — the
  * reference's `SET 'sql.state-ttl' = '14 d'` analog (see
  * [[StreamingOps.ttlConf]]): a key idle past the TTL loses its trailing
  * events, so a pattern spanning the eviction gap will NOT match — the key's
  * next event starts a fresh trail. With a `within` bound, any TTL ≥ within
  * is loss-free: a trail older than `within` could never complete anyway.
  *
  * `skipPast = true` switches to the SQL-standard default strategy, AFTER
  * MATCH SKIP PAST LAST ROW (the batch twin is
  * [[graft.operators.Behavior.sequenceMatchSkipPast]]): a selected match
  * consumes its rows, so the next match starts strictly after it — in this
  * end-detection formulation that is exactly CLEARING the trail on emit.
  * Equivalence with the batch start-order greedy scan holds because fixed
  * patterns have one length: the earliest-start candidate is also the
  * earliest-end, and clearing the trail consumes precisely the match's rows.
  */
object StreamingSequenceMatch {

  case class Ev(key: String, typ: String, ts: Timestamp, tie: Long)
  case class Match(key: String, match_start_ts: Timestamp, match_end_ts: Timestamp, start_tie: Long)
  case class Trail(types: Seq[String], tsMicros: Seq[Long], ties: Seq[Long])

  def apply(df: DataFrame, keyCol: String, typeCol: String, tsCol: String, tieCol: String,
            pattern: Seq[String], withinMicros: Long = 0L, ttlSeconds: Long = 0L,
            ttlWatermarkDelay: String = "0 seconds", skipPast: Boolean = false): Dataset[Match] = {
    require(pattern.nonEmpty, "pattern must name at least one event type")
    require(withinMicros >= 0, s"withinMicros must be >= 0, got $withinMicros")
    val n = pattern.size
    val withinUs = withinMicros
    implicit val evEnc = Encoders.product[Ev]
    implicit val outEnc = Encoders.product[Match]
    implicit val stEnc = Encoders.product[Trail]
    implicit val keyEnc = Encoders.STRING

    def toTs(us: Long): Timestamp = {
      val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
      t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }

    val sel = df.select(col(keyCol).cast("string").as("key"), col(typeCol).cast("string").as("typ"),
      col(tsCol).cast("timestamp").as("ts"), col(tieCol).cast("long").as("tie"))
    val src = if (ttlSeconds > 0) sel.withWatermark("ts", ttlWatermarkDelay) else sel
    src.as[Ev]
      .groupByKey(_.key)
      .flatMapGroupsWithState[Trail, Match](OutputMode.Append(), StreamingOps.ttlConf(ttlSeconds)) {
        (key: String, rows: Iterator[Ev], state: GroupState[Trail]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var trail = state.getOption.getOrElse(Trail(Nil, Nil, Nil))
            val out = Seq.newBuilder[Match]
            var newest = Long.MinValue
            rows.toSeq.sortBy(e => (StreamingOps.tsMicros(e.ts), e.tie)).foreach { e =>
              val ts = StreamingOps.tsMicros(e.ts)
              newest = math.max(newest, ts)
              val types = trail.types :+ e.typ
              val tss = trail.tsMicros :+ ts
              val ties = trail.ties :+ e.tie
              val hit = types.length >= n && types.takeRight(n) == pattern &&
                (withinUs == 0L || ts - tss(tss.length - n) <= withinUs)
              if (hit)
                out += Match(key, toTs(tss(tss.length - n)), toTs(ts), ties(ties.length - n))
              trail =
                if (hit && skipPast) Trail(Nil, Nil, Nil) // match consumed its rows
                else Trail(types.takeRight(n - 1), tss.takeRight(n - 1), ties.takeRight(n - 1))
            }
            state.update(trail)
            StreamingOps.armTtl(state, ttlSeconds, newest)
            out.result().iterator
          }
      }
  }
}
