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
  * itself. Unpersist is non-blocking and quiet (the session may be stopped
  * by the time the async listener bus drains).
  *
  * Two costs are bounded by construction:
  *
  *   - **Listener population.** A caller that builds the plan but never
  *     runs it (plan inspection, audits, abandoned compositions) would
  *     leak its listener forever — and every LIVE listener taxes every
  *     later action with a plan walk. All registrations therefore enter a
  *     bounded FIFO ([[MaxPending]]); overflow force-releases the OLDEST
  *     entry (its helpers unpersist — for an abandoned plan that is
  *     exactly right, and for a plan still to be run it merely recomputes,
  *     never a correctness change). Measured consequence of the unbounded
  *     version: a full `sbt test` run degraded from ~8 min to 1 h+ as
  *     plan-only suites accumulated listeners whose per-action
  *     `sameResult` walks (each canonicalizing plan subtrees) compounded.
  *   - **Per-action walk cost.** The subtree match prefilters on schema
  *     equality before `sameResult`, so non-matching nodes are rejected
  *     without ever computing their canonicalized form (the expensive
  *     part — O(subtree) per node).
  */
object AutoUnpersist {

  /** Max listeners pending across the JVM; oldest is force-released on
    * overflow. Sized to the deepest plausible in-flight composition (a
    * corpus-clean pipeline holds < 10 lazy helper-backed results). */
  private val MaxPending = 32

  /** Insertion-ordered registry of live listeners with their release
    * thunks; all access synchronized on the deque itself. */
  private val live =
    new java.util.ArrayDeque[(QueryExecutionListener, () => Unit)]()

  private def forget(l: QueryExecutionListener): Unit =
    live.synchronized {
      val it = live.iterator()
      while (it.hasNext) if (it.next()._1 eq l) it.remove()
    }

  def afterFirstUse(result: DataFrame, cached: DataFrame*): DataFrame = {
    val manager = result.sparkSession.listenerManager
    val target = result.queryExecution.analyzed
    val targetSchema = target.schema
    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    lazy val release: () => Unit = () => {
      cached.foreach(df =>
        try df.unpersist(blocking = false)
        catch { case scala.util.control.NonFatal(_) => () })
      try manager.unregister(listener)
      catch { case scala.util.control.NonFatal(_) => () }
      forget(listener)
    }
    lazy val listener: QueryExecutionListener = new QueryExecutionListener {
      private def maybeRelease(qe: QueryExecution): Unit = {
        val hit =
          try qe.analyzed.collectFirst {
            // schema prefilter: cheap reject before sameResult forces
            // canonicalization of the candidate subtree
            case p if p.schema == targetSchema && p.sameResult(target) => p
          }.isDefined
          catch { case scala.util.control.NonFatal(_) => false }
        if (hit && done.compareAndSet(false, true)) release()
      }
      override def onSuccess(
          funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        maybeRelease(qe)
      override def onFailure(
          funcName: String, qe: QueryExecution, exception: Exception): Unit =
        maybeRelease(qe)
    }
    val evicted = live.synchronized {
      live.addLast((listener, () => if (done.compareAndSet(false, true)) release()))
      if (live.size > MaxPending) Some(live.removeFirst()) else None
    }
    evicted.foreach(_._2())
    manager.register(listener)
    result
  }

  /** Test hook: number of live (unfired) listeners. */
  private[graft] def pendingCount: Int = live.synchronized(live.size)

  /** Test hook: force-release everything (e.g. between benchmark runs). */
  private[graft] def releaseAll(): Unit = {
    val all = live.synchronized {
      val copy = new java.util.ArrayList(live)
      copy
    }
    all.forEach(e => e._2())
  }
}
