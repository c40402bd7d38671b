package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Frees helper intermediates that operators persist for intra-query reuse
  * (shingle-hash arrays, signature tables) once the RESULT they back has
  * been materialized.
  *
  * The problem shape: an operator persists a mid-pipeline frame because the
  * result plan consumes it from several branches, then returns the result
  * LAZILY — so it cannot unpersist before returning (the caller hasn't run
  * the plan yet), and unconditionally keeping it caches one batch-sized
  * table per call in a long-lived ingest loop.
  *
  * Mechanism: a one-shot [[QueryExecutionListener]] watches for the first
  * completed action (success or failure) whose analyzed plan contains the
  * result's plan as a subtree (`sameResult`, so later `.filter`/`.select`
  * compositions still match), unpersists the helpers, and unregisters
  * itself. If the caller never materializes the result, nothing fires and
  * the frames stay cached exactly as before — this only ever releases
  * earlier, never changes semantics. Unpersist is non-blocking and quiet
  * (the session may be stopped by the time the async listener bus drains).
  */
object AutoUnpersist {

  def afterFirstUse(result: DataFrame, cached: DataFrame*): DataFrame = {
    val manager = result.sparkSession.listenerManager
    val target = result.queryExecution.analyzed
    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    lazy val listener: QueryExecutionListener = new QueryExecutionListener {
      private def maybeRelease(qe: QueryExecution): Unit = {
        val hit =
          try qe.analyzed.collectFirst {
            case p if p.sameResult(target) => p
          }.isDefined
          catch { case scala.util.control.NonFatal(_) => false }
        if (hit && done.compareAndSet(false, true)) {
          cached.foreach(df =>
            try df.unpersist(blocking = false)
            catch { case scala.util.control.NonFatal(_) => () })
          manager.unregister(listener)
        }
      }
      override def onSuccess(
          funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        maybeRelease(qe)
      override def onFailure(
          funcName: String, qe: QueryExecution, exception: Exception): Unit =
        maybeRelease(qe)
    }
    manager.register(listener)
    result
  }
}
