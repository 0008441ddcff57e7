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
    */
  final case class Standing(name: String, sql: String, query: StreamingQuery,
                            relight: Option[() => StreamingQuery] = None) extends Entry

  private val statements = scala.collection.concurrent.TrieMap[String, Entry]()

  def recordCompleted(name: String, sql: String): Unit =
    statements.put(name, Completed(name, sql))

  def recordStanding(name: String, sql: String, query: StreamingQuery,
                     relight: Option[() => StreamingQuery] = None): Unit =
    statements.put(name, Standing(name, sql, query, relight))

  /** Stop a standing statement and resume it from its own checkpoint (r14):
    * the new instance replays any uncommitted micro-batch and continues —
    * recovery semantics are the streaming operators' Buf/state contract.
    * Loud on one-shots and on standing entries without a relight recipe.
    */
  def relightStanding(name: String): StreamingQuery = relightLock.synchronized {
    statements.get(name) match {
      case Some(Standing(n, sql, q, Some(fn))) =>
        if (q.isActive) { q.stop(); q.awaitTermination() }
        val nq = fn()
        statements.put(n, Standing(n, sql, nq, Some(fn)))
        nq
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
    case Some(Standing(_, _, q, _)) =>
      if (q.exception.isDefined) "FAILED"
      else if (q.isActive) "RUNNING"
      else "STOPPED"
  }

  /** Stop a standing statement's continuous query (no-op for one-shots). */
  def stop(name: String): Unit = statements.get(name) match {
    case Some(Standing(_, _, q, _)) if q.isActive => q.stop(); q.awaitTermination()
    case _                                     => ()
  }

  def get(name: String): Option[Entry] = statements.get(name)

  /** SHOW STATEMENTS rows: (name, status, kind, sql). */
  def list: Seq[(String, String, String, String)] =
    statements.values.toSeq.sortBy(_.name).map { e =>
      val kind = e match { case _: Standing => "STREAMING"; case _ => "BATCH" }
      (e.name, status(e.name), kind, e.sql.linesIterator.mkString(" ").take(120))
    }

  /** Test isolation: stop everything and forget (not part of the surface). */
  def reset(): Unit = { statements.keys.foreach(stop); statements.clear() }
}
