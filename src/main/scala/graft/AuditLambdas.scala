package graft

import scala.collection.mutable
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Mechanical trap-#1 sweep over the whole catalog (r5 judge directive #3):
  * build every `SparkEntry.queries` DataFrame and audit BOTH the final
  * optimized plan and — via a QueryExecutionListener — every internal query
  * a builder executes eagerly (stats collects, codebook training, graph
  * rounds), for invariant expensive subtrees inside HOF lambdas.
  *
  * Usage: runMain graft.AuditLambdas <sfDir>   (sf0.001 is enough — the
  * audit reads plans, row counts don't matter). Prints one line per site;
  * exit code 1 if any offender is found.
  */
object AuditLambdas {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val hits = mutable.LinkedHashMap.empty[String, Seq[String]]
    // volatile: read on the async listener-bus thread. Attribution of an
    // internal query to `current` is best-effort — a callback delivered
    // after the main loop advanced attributes to the NEXT query (the hit
    // itself is never lost; re-run the named builders to pin it down)
    @volatile var current = "<init>"
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
        val off = graft.core.PlanAudit.lambdaInvariants(qe.optimizedPlan)
        if (off.nonEmpty) hits.synchronized {
          hits(s"$current [internal:$funcName]") =
            hits.getOrElse(s"$current [internal:$funcName]", Nil) ++ off
        }
      }
      override def onFailure(funcName: String, qe: QueryExecution, ex: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    var built = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, q) =>
      current = name
      try {
        val df = q(spark, sfDir)
        built += 1
        val off = graft.core.PlanAudit.lambdaInvariants(df)
        if (off.nonEmpty) hits.synchronized { hits(name) = hits.getOrElse(name, Nil) ++ off }
      } catch {
        case e: Exception => println(s"[audit] BUILD-FAIL $name: ${e.getMessage.take(120)}")
      }
    }
    // flush listener callbacks (they run on a separate bus thread; no public
    // waitUntilEmpty — a short sleep after the last eager job suffices here)
    Thread.sleep(3000)
    println(s"[audit] built $built/${SparkEntry.queries.size} queries")
    if (hits.isEmpty) println("[audit] CLEAN: no invariant expensive subtree inside any HOF lambda")
    else hits.foreach { case (q, off) =>
      off.distinct.foreach(o => println(s"[audit] HIT $q :: $o"))
    }
    spark.stop()
    if (hits.nonEmpty) sys.exit(1)
  }
}
