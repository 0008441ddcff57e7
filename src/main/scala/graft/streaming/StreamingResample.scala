package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, OutputMode}

/** Streaming twin of [[graft.operators.Resample.gridFill]]: per-key dense
  * fixed-step grid rows, forward-filled with the latest observation, emitted
  * continuously as events arrive. Each key's grid anchors at its FIRST
  * observation's event time (exactly the batch operator's per-key `min`), and
  * grid points emit once their fill value is final — i.e. when the first
  * observation AT or AFTER them arrives — so emissions are immutable and the
  * query runs in append mode. The grid trails the newest observation by
  * design; on a closed input the emitted rows equal the batch `gridFill`
  * bit-for-bit (spec).
  *
  * State per key is O(1): the last observation and the next grid cursor —
  * never an event buffer. Rows within a trigger are processed in event-time
  * order; cross-trigger ordering is the source's responsibility (same
  * contract as [[StreamingAnomaly]]/[[StreamingFunnel]]).
  *
  * `ttlSeconds > 0` bounds the store on unbounded key spaces — the
  * reference's `SET 'sql.state-ttl' = '14 d'` analog (see
  * [[StreamingOps.ttlConf]]): a key idle past the TTL loses its cursor and
  * last observation — the grid points between the last emission and the
  * eviction are never emitted (a dead sensor stops occupying state instead
  * of forward-filling forever), and the key's next observation RE-ANCHORS a
  * fresh grid at its own timestamp, exactly as a first-ever observation.
  */
object StreamingResample {

  case class Obs(k: String, ts: Timestamp, v: Double)
  case class GridRow(k: String, grid_ts: Timestamp, obs_ts: Timestamp, v: Double)
  /** cursorMicros = next unemitted grid point; lastTsMicros/lastV = latest observation so far. */
  case class FillState(cursorMicros: Long, lastTsMicros: Long, lastV: Double)

  private def microsToTs(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  def apply(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
            stepSeconds: Long, ttlSeconds: Long = 0L,
            ttlWatermarkDelay: String = "0 seconds"): Dataset[GridRow] = {
    require(stepSeconds > 0, s"stepSeconds must be > 0, got $stepSeconds")
    val stepUs = stepSeconds * 1000000L
    implicit val obsEnc = Encoders.product[Obs]
    implicit val outEnc = Encoders.product[GridRow]
    implicit val stEnc = Encoders.product[FillState]
    implicit val keyEnc = Encoders.STRING

    val sel = df.select(col(keyCol).cast("string").as("k"),
      col(tsCol).cast("timestamp").as("ts"),
      col(valueCol).cast("double").as("v"))
    val src = if (ttlSeconds > 0) sel.withWatermark("ts", ttlWatermarkDelay) else sel
    src.as[Obs]
      .groupByKey(_.k)
      .flatMapGroupsWithState[FillState, GridRow](OutputMode.Append(), StreamingOps.ttlConf(ttlSeconds)) {
        (k: String, rows: Iterator[Obs], state: GroupState[FillState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
          var st = state.getOption.orNull
          val out = Seq.newBuilder[GridRow]
          rows.toSeq.sortBy(o => StreamingOps.tsMicros(o.ts)).foreach { o =>
            val ts = StreamingOps.tsMicros(o.ts)
            if (st == null) {
              // first observation anchors the grid and is its own fill
              out += GridRow(k, o.ts, o.ts, o.v)
              st = FillState(ts + stepUs, ts, o.v)
            } else if (ts >= st.lastTsMicros) {
              // grid points strictly before this observation fill from the
              // PREVIOUS latest; a point exactly at it fills from it
              var c = st.cursorMicros
              while (c < ts) {
                out += GridRow(k, microsToTs(c), microsToTs(st.lastTsMicros), st.lastV)
                c += stepUs
              }
              if (c == ts) {
                out += GridRow(k, microsToTs(c), o.ts, o.v)
                c += stepUs
              }
              st = FillState(c, ts, o.v)
            }
            // an out-of-order observation older than the latest is dropped:
            // its grid points already emitted with the then-latest fill
          }
          if (st != null) {
            state.update(st)
            StreamingOps.armTtl(state, ttlSeconds, st.lastTsMicros)
          }
          out.result().iterator
          }
      }
  }
}
