package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, OutputMode}

/** Streaming twin of [[graft.operators.Scd2]]: a continuous change log in,
  * a stream of CLOSED validity intervals out. Each key's state is just the
  * currently-open interval (attribute + open time — O(1) per key); when an
  * event carries a DIFFERENT attribute, the open interval closes at that
  * event's time and is emitted, and the new interval opens. Unchanged-value
  * events only ride forward the open interval. Closed intervals are
  * immutable, which is exactly what append mode needs; the open intervals
  * live in state and surface when their closing change arrives (the batch
  * operator's `is_current` rows are the state, not the stream).
  *
  * Attribute comparison is null-safe, mirroring the batch operator: a
  * transition to null closes the interval and opens a null-state one.
  * Within-trigger rows process in event-time order; cross-trigger ordering is
  * the source's responsibility (same contract as [[StreamingAnomaly]]).
  *
  * `ttlSeconds > 0` bounds the store on unbounded key spaces — the
  * reference's `SET 'sql.state-ttl' = '14 d'` analog (see
  * [[StreamingOps.ttlConf]]). Eviction DROPS the key's open interval without
  * emitting it (Flink TTL semantics — expired state is deleted, never
  * flushed): a key silent past the TTL contributes no ClosedInterval for its
  * final state, and its next change opens a fresh first interval. That is the
  * honest cost of bounding the store; size the TTL to the entity churn.
  */
object StreamingScd2 {

  case class Change(key: String, attr: Option[String], ts: Timestamp, tie: Long)
  case class ClosedInterval(key: String, state: Option[String],
                            valid_from: Timestamp, valid_to: Timestamp)
  /** attrSet distinguishes "no state yet" from "open interval with null attr". */
  case class OpenState(attrSet: Boolean, attr: Option[String], fromMicros: Long)

  def apply(df: DataFrame, keyCol: String, attrCol: String, tsCol: String,
            tieCol: String, ttlSeconds: Long = 0L,
            ttlWatermarkDelay: String = "0 seconds"): Dataset[ClosedInterval] = {
    implicit val chEnc = Encoders.product[Change]
    implicit val outEnc = Encoders.product[ClosedInterval]
    implicit val stEnc = Encoders.product[OpenState]
    implicit val keyEnc = Encoders.STRING

    def toTs(micros: Long): Timestamp = {
      val t = new Timestamp(Math.floorDiv(micros, 1000L))
      t.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
      t
    }

    val sel = df.select(col(keyCol).cast("string").as("key"),
      col(attrCol).cast("string").as("attr"),
      col(tsCol).cast("timestamp").as("ts"),
      col(tieCol).cast("long").as("tie"))
    val src = if (ttlSeconds > 0) sel.withWatermark("ts", ttlWatermarkDelay) else sel
    src.as[Change]
      .groupByKey(_.key)
      .flatMapGroupsWithState[OpenState, ClosedInterval](OutputMode.Append(), StreamingOps.ttlConf(ttlSeconds)) {
        (key: String, rows: Iterator[Change], state: GroupState[OpenState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var open = state.getOption.getOrElse(OpenState(attrSet = false, None, Long.MinValue))
            val out = Seq.newBuilder[ClosedInterval]
            var newest = Long.MinValue
            // (ts, tie) order mirrors the batch operator's window sort — equal
            // timestamps resolve identically in both, not by iterator order
            rows.toSeq.sortBy(c => (StreamingOps.tsMicros(c.ts), c.tie)).foreach { c =>
              val micros = StreamingOps.tsMicros(c.ts)
              newest = math.max(newest, micros)
              if (!open.attrSet) {
                open = OpenState(attrSet = true, c.attr, micros)
              } else if (open.attr != c.attr) { // null-safe: Option equality
                out += ClosedInterval(key, open.attr, toTs(open.fromMicros), toTs(micros))
                open = OpenState(attrSet = true, c.attr, micros)
              }
            }
            state.update(open)
            StreamingOps.armTtl(state, ttlSeconds, newest)
            out.result().iterator
          }
      }
  }
}
