package graft.core

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.{Duration, FiniteDuration}

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.StructType

/** Shared bounded-concurrency mapPartitions: up to `concurrency` in-flight
  * `rowFn` calls per task, emitted in input order via a true sliding window
  * (a completed head slot is emitted and the next row submitted immediately —
  * no batch barrier, so heterogeneous latencies keep the pool saturated).
  *
  * Robustness contract:
  *  - the task-local pool is released through a TaskContext completion
  *    listener, so threads never leak on task failure, retry, or early
  *    termination (e.g. a downstream limit() stopping consumption);
  *  - each call is bounded by `timeout`; a timeout fails the task (Spark
  *    retries it) rather than wedging the stage forever — callers wanting
  *    per-row error rows should catch inside `rowFn`.
  *
  * Used by ml.MlPredict.generateConcurrent and agent.AgentRuntime.
  */
object ConcurrentPartitions {

  def mapConcurrent(df: DataFrame, outSchema: StructType, concurrency: Int,
                    timeout: FiniteDuration)(rowFn: Row => Seq[Any]): DataFrame = {
    df.mapPartitions { it =>
      val pool = java.util.concurrent.Executors.newFixedThreadPool(concurrency)
      Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit](_ => pool.shutdownNow()))
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val window = new scala.collection.mutable.Queue[(Row, Future[Seq[Any]])]()
      new Iterator[Row] {
        private def fill(): Unit =
          while (window.size < concurrency && it.hasNext) {
            val r = it.next()
            window.enqueue((r, Future(rowFn(r))))
          }
        override def hasNext: Boolean = { fill(); window.nonEmpty }
        override def next(): Row = {
          fill()
          val (r, f) = window.dequeue()
          val out = Await.result(f, timeout) // sliding: next submit happens on the following hasNext/next
          Row.fromSeq(r.toSeq ++ out)
        }
      }
    }(Encoders.row(outSchema))
  }

  val DefaultTimeout: FiniteDuration = FiniteDuration(10, "min")
}
