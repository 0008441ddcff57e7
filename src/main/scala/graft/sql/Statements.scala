package graft.sql

import org.apache.spark.sql.streaming.StreamingQuery

/** Statement-lifecycle registry — the engine-side analog of the reference's
  * statement surface (`confluent flink statement describe <name>` →
  * PENDING/RUNNING/COMPLETED/FAILED/STOPPED…, polled by the harness's
  * `get_statement_status`/`wait_for_status`,
  * testing/helpers/flink_sql_helper.py:98-160).
  *
  * Every statement the front-end executes lands here, keyed by the target
  * object name (the reference names statements after the object they create):
  * one-shot DDL/CTAS → COMPLETED; a standing streaming CTAS/INSERT →
  * RUNNING while its StreamingQuery is active, FAILED if it died with an
  * exception, STOPPED after `DROP TABLE` / `STOP STATEMENT` / `stop()` —
  * and RUNNING again after `RESUME STATEMENT` (r14: [[relightStanding]] —
  * a new query instance on the same sink + checkpoint).
  * DEGRADED exists in the reference's vocabulary for infra backpressure and
  * has no local analog — never reported here.
  */
object StatementCatalog {

  sealed trait Entry { def name: String; def sql: String }
  final case class Completed(name: String, sql: String) extends Entry
  /** `relight` (r14): start a NEW query instance on the SAME sink +
    * checkpoint — the planner records it so a stopped/crashed standing
    * statement can resume exactly where its state store left off (the
    * checkpoint-recovery surface the kill-mid-drain harnesses exercise).
    *
    * `upstreamSinks` (r16): the STREAM tables this statement's plan reads,
    * each with the sink directory backing it AT PLAN TIME ("" for source
    * tables with no sink) — the chain edges the planner walks when an
    * upstream re-submission rotates a sink directory under readers, and the
    * staleness fingerprint [[relightStanding]] checks before reusing the
    * recorded plan. `resubmit` replays the statement's own submission from
    * scratch (fresh plan against the CURRENT registry, fresh sink +
    * checkpoint) — the cascade's unit step; unlike `relight`, which restarts
    * the RECORDED plan on the SAME sink.
    *
    * `appendSink` (r16 review): true for INSERT INTO statements, whose
    * target UNIONS prior contents with the sink. A from-scratch re-plan of
    * such a statement replays the upstream's full history on top of what it
    * already appended — duplicating every row — so neither the cascade nor
    * the RESUME staleness check may re-plan one automatically; both warn
    * and leave the decision (re-create the insert, or accept the stale
    * read) to the user. CTAS readers have replace semantics: a recompute
    * yields the same table, so automatic re-plan is safe for them.
    */
  final case class Standing(name: String, sql: String, query: StreamingQuery,
                            relight: Option[() => StreamingQuery] = None,
                            upstreamSinks: Map[String, String] = Map.empty,
                            resubmit: Option[() => Unit] = None,
                            appendSink: Boolean = false) extends Entry

  private val statements = scala.collection.concurrent.TrieMap[String, Entry]()

  def recordCompleted(name: String, sql: String): Unit =
    statements.put(name, Completed(name, sql))

  def recordStanding(name: String, sql: String, query: StreamingQuery,
                     relight: Option[() => StreamingQuery] = None,
                     upstreamSinks: Map[String, String] = Map.empty,
                     resubmit: Option[() => Unit] = None,
                     appendSink: Boolean = false): Unit =
    statements.put(name, Standing(name, sql, query, relight, upstreamSinks, resubmit, appendSink))

  /** Standing statements whose plan reads `table` as a STREAM source and
    * whose query is still ACTIVE — the stale-read candidates when `table`'s
    * sink directory rotates under them (re-submission cascade, r16).
    * STOPPED readers are excluded: re-submitting one would start it against
    * the user's explicit STOP; their RESUME re-plans instead (the staleness
    * check in [[relightStanding]]).
    */
  def runningReadersOf(table: String): Seq[Standing] =
    statements.values.collect {
      case s: Standing if s.upstreamSinks.contains(table) && s.query.isActive => s
    }.toSeq

  /** Stop a standing statement and resume it from its own checkpoint (r14):
    * the new instance replays any uncommitted micro-batch and continues —
    * recovery semantics are the streaming operators' Buf/state contract.
    * Loud on one-shots and on standing entries without a relight recipe.
    */
  def relightStanding(name: String): StreamingQuery = relightLock.synchronized {
    statements.get(name) match {
      case Some(s: Standing) if s.relight.isDefined =>
        val fn = s.relight.get
        // staleness fingerprint (r16): an upstream re-submission while this
        // statement was STOPPED rotated a sink directory the RECORDED plan
        // reads — relighting that plan would silently drain a dead
        // directory forever. RESUME re-plans from the statement's own SQL
        // instead (fresh plan + sink + checkpoint against the CURRENT
        // upstream sinks), the same unit step the running-reader cascade
        // uses. An upstream DROPPED since plan time is NOT stale: the plan
        // keeps draining the retained sink files (topic-retention
        // semantics). An append-sink statement (INSERT INTO) is NEVER
        // re-planned automatically — the replay would duplicate everything
        // it already appended — so its RESUME relights the recorded plan
        // and warns that the statement is reading a dead directory; the
        // user re-creates the insert when they want it to follow the new
        // sink (the reference's re-created-topic manual step).
        val rotated = s.upstreamSinks.filter { case (t, sink) =>
          graft.sources.TableRegistry.exists(t) &&
            graft.sources.TableRegistry.resolve(t).options
              .getOrElse("graft.sink-path", "") != sink
        }
        if (rotated.nonEmpty && s.resubmit.isDefined && !s.appendSink) {
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"RESUME STATEMENT '$name': upstream sink(s) rotated since it was planned " +
              s"(${rotated.keys.mkString(", ")}) — re-planning from its SQL instead of " +
              "relighting the stale plan")
          s.resubmit.get.apply()
          statements.get(s.name) match {
            case Some(ns: Standing) => ns.query
            case _ => sys.error(s"re-plan of '${s.name}' did not record a standing statement")
          }
        } else {
          if (rotated.nonEmpty && s.appendSink)
            org.slf4j.LoggerFactory.getLogger(getClass).warn(
              s"RESUME STATEMENT '$name': upstream sink(s) rotated " +
                s"(${rotated.keys.mkString(", ")}) but this is an APPEND statement — " +
                "an automatic re-plan would replay the upstream's history and duplicate " +
                "every row already appended. Relighting the recorded plan instead (it " +
                "drains only the retained old files); re-create the INSERT to follow " +
                "the new sink")
          if (s.query.isActive) { s.query.stop(); s.query.awaitTermination() }
          val nq = fn()
          statements.put(s.name, s.copy(query = nq))
          nq
        }
      case Some(_: Standing) => sys.error(s"statement '$name' records no relight recipe")
      case other => sys.error(s"cannot relight '$name': ${other.fold("not found")(_ => "one-shot")}")
    }
  }

  /** Serializes relights: two concurrent RESUME STATEMENT calls (or RESUME
    * racing STOP) must not both observe the stopped entry and launch two
    * query instances on the same sink+checkpoint — the loser would die on
    * the checkpoint lock. Relight is control-plane-rare, so one monitor
    * (not per-name) keeps the invariant simple.
    */
  private val relightLock = new Object

  /** The harness's status vocabulary. NOT_FOUND for unknown names, matching
    * `get_statement_status` on a missing statement.
    */
  def status(name: String): String = statements.get(name) match {
    case None                   => "NOT_FOUND"
    case Some(_: Completed)     => "COMPLETED"
    case Some(s: Standing) =>
      if (s.query.exception.isDefined) "FAILED"
      else if (s.query.isActive) "RUNNING"
      else "STOPPED"
  }

  /** Stop a standing statement's continuous query (no-op for one-shots). */
  def stop(name: String): Unit = statements.get(name) match {
    case Some(s: Standing) if s.query.isActive => s.query.stop(); s.query.awaitTermination()
    case _                                     => ()
  }

  def get(name: String): Option[Entry] = statements.get(name)

  /** SHOW STATEMENTS rows: (name, status, kind, upstream, sql). `upstream`
    * lists the STREAM tables the statement's plan reads (r16 — the chain
    * edges the re-submission cascade walks), comma-joined; empty for batch
    * statements.
    */
  def list: Seq[(String, String, String, String, String)] =
    statements.values.toSeq.sortBy(_.name).map { e =>
      val kind = e match { case _: Standing => "STREAMING"; case _ => "BATCH" }
      val ups = e match {
        case s: Standing => s.upstreamSinks.keys.toSeq.sorted.mkString(",")
        case _           => ""
      }
      (e.name, status(e.name), kind, ups, e.sql.linesIterator.mkString(" ").take(120))
    }

  /** Test isolation: stop everything and forget (not part of the surface). */
  def reset(): Unit = { statements.keys.foreach(stop); statements.clear() }
}
