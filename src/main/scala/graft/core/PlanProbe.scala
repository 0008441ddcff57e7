package graft.core

import org.apache.spark.sql.execution.QueryExecution

/** Diagnostic hook for operators that split their query at an RDD boundary
  * (r17: the MATCH_RECOGNIZE scans run on `queryExecution.toRdd`, so their
  * exchange/sort child plan no longer appears in the OUTER DataFrame's
  * explain). Each such operator records its child QueryExecution here at
  * build time; plan guards (MatchRecognizeScanSpec) and `graft.PlanDump`
  * read it to keep the one-exchange/one-sort shape checkable. Thread-local —
  * concurrent query builds don't interleave — and build-time only: nothing
  * here affects execution.
  */
object PlanProbe {
  private val tl = new ThreadLocal[scala.collection.mutable.LinkedHashMap[String, QueryExecution]] {
    override def initialValue() = scala.collection.mutable.LinkedHashMap.empty
  }

  private[graft] def record(tag: String, qe: QueryExecution): Unit = {
    val m = tl.get()
    // keep every child of a multi-scan query distinguishable
    var key = tag
    var i = 2
    while (m.contains(key)) { key = s"$tag#$i"; i += 1 }
    m.put(key, qe)
  }

  /** Children recorded since the last [[clear]], in record order. */
  private[graft] def recorded: Seq[(String, QueryExecution)] = tl.get().toSeq

  private[graft] def clear(): Unit = tl.get().clear()
}
