package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Streaming event-time temporal join — the continuous form of the SQL
  * front-end's `FOR SYSTEM_TIME AS OF` rewrite (and of [[graft.operators.AsOfJoin]]):
  * a probe stream joins, per key, the version of a changelog stream valid at
  * the probe's event time (latest version ts ≤ probe ts).
  *
  * Emission discipline (Flink's rule): a probe may only emit once NO earlier
  * version can still arrive — i.e. once the watermark passes the probe's
  * time. Probes buffer in state until then; event-time TIMERS (not input
  * arrival) drive emission, so a probe still emits when its key never
  * receives another row. Both inputs carry their own watermark and Spark
  * tracks the union's minimum, so a lagging version stream correctly holds
  * probes back.
  *
  * State per key is bounded: pending probes ≤ one watermark's worth, and the
  * version history is pruned to versions newer than the watermark plus the
  * single newest at-or-before it (any older version can never win another
  * as-of lookup — every future probe's time is ≥ the watermark). This is the
  * same retention Flink's temporal-join operator keeps.
  *
  * Payloads ride as single string columns (the repo's streaming-twin
  * convention — StreamingScd2's attr, StreamingResample's value); duplicate
  * version timestamps per key are the caller's contract, as in AsOfJoin.
  * Requires the RocksDB state store (transformWithState's requirement).
  */
object StreamingTemporalJoin {

  case class In(key: String, ts: Timestamp, side: Int, a: String) // side 0 = version, 1 = probe
  case class Joined(key: String, probe_ts: Timestamp, payload: String,
                    version_ts: Option[Timestamp], state: Option[String])
  case class Stamped(tsMicros: Long, a: String)

  class Processor(leftJoin: Boolean) extends StatefulProcessor[String, In, Joined] {

    @transient private var pending: ListState[Stamped] = _
    @transient private var versions: ListState[Stamped] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      pending = getHandle.getListState[Stamped]("pending", Encoders.product[Stamped], TTLConfig.NONE)
      versions = getHandle.getListState[Stamped]("versions", Encoders.product[Stamped], TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[In],
                                 timerValues: TimerValues): Iterator[Joined] = {
      rows.foreach { r =>
        val st = Stamped(StreamingOps.tsMicros(r.ts), r.a)
        if (r.side == 0) versions.appendValue(st)
        else {
          pending.appendValue(st)
          // fires once the watermark passes the probe's event time — at which
          // point every version at-or-before it is either in state or late-dropped
          getHandle.registerTimer(Math.floorDiv(st.tsMicros, 1000L))
        }
      }
      Iterator.empty
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[Joined] = {
      val wmMicros = timerValues.getCurrentWatermarkInMs() * 1000L
      val vs = versions.get().toArray.sortBy(_.tsMicros)
      val (ready, stillPending) = pending.get().toArray.partition(_.tsMicros < wmMicros)
      if (stillPending.nonEmpty) pending.put(stillPending) else pending.clear()

      // prune: versions newer than the watermark + the newest at-or-before it
      val (old, fresh) = vs.partition(_.tsMicros < wmMicros)
      val keep = old.lastOption.toArray ++ fresh
      if (keep.nonEmpty) versions.put(keep) else versions.clear()

      ready.sortBy(_.tsMicros).iterator.flatMap { p =>
        // latest version at-or-before the probe (vs is ts-sorted)
        val m = vs.takeWhile(_.tsMicros <= p.tsMicros).lastOption
        m match {
          case Some(v) => Some(Joined(key, microsToTs(p.tsMicros), p.a,
            Some(microsToTs(v.tsMicros)), Some(v.a)))
          case None if leftJoin => Some(Joined(key, microsToTs(p.tsMicros), p.a, None, None))
          case None => None
        }
      }
    }
  }

  private def microsToTs(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** @param probes   streaming (key, ts, payload) — the fact/probe side
    * @param versions streaming (key, ts, state) — the versioned/changelog side
    * @param delay    bounded event-time delay for BOTH watermarks
    */
  def apply(probes: DataFrame, versions: DataFrame, delay: String,
            keyCol: String, tsCol: String, payloadCol: String,
            vKeyCol: String, vTsCol: String, vStateCol: String,
            leftJoin: Boolean = false): Dataset[Joined] = {
    implicit val inEnc = Encoders.product[In]
    implicit val outEnc = Encoders.product[Joined]
    implicit val keyEnc = Encoders.STRING

    def shape(df: DataFrame, k: String, ts: String, a: String, side: Int): DataFrame = df
      .select(col(k).cast("string").as("key"), col(ts).cast("timestamp").as("ts"),
        lit(side).as("side"), col(a).cast("string").as("a"))
      .withWatermark("ts", delay)

    shape(probes, keyCol, tsCol, payloadCol, 1)
      .unionByName(shape(versions, vKeyCol, vTsCol, vStateCol, 0))
      .as[In]
      .groupByKey(_.key)
      .transformWithState(new Processor(leftJoin), TimeMode.EventTime(), OutputMode.Append())
  }
}
