package org.apache.spark.sql

import java.util.concurrent.{CompletableFuture, Executors, ThreadFactory}

/** Bridge into `private[sql]` SQLExecution.withThreadLocalCaptured —
  * the SAME mechanism Spark's own BroadcastExchangeExec uses to run
  * build-side work on a helper thread while keeping the submitting
  * query's execution id, job group, and artifact state on the jobs it
  * launches. Used by [[graft.plans.BroadcastIntervalJoinExec]] to
  * start its CollectLeft build at `doPrepare()` time, so the several
  * interval builds of a multi-probe query overlap instead of running
  * serially inside each `doExecute()`. */
object GraftExecBridge {
  private lazy val pool = Executors.newFixedThreadPool(8, new ThreadFactory {
    private val n = new java.util.concurrent.atomic.AtomicInteger()
    override def newThread(r: Runnable): Thread = {
      val t = new Thread(r, s"graft-interval-build-${n.incrementAndGet()}")
      t.setDaemon(true)
      t
    }
  })

  def async[T](body: => T): CompletableFuture[T] = {
    val session = SparkSession.active.asInstanceOf[classic.SparkSession]
    execution.SQLExecution.withThreadLocalCaptured(session, pool)(body)
  }

  /** Await, unwrapping the executor's ExecutionException so callers
    * see the original failure. */
  def await[T](f: CompletableFuture[T]): T =
    try f.get()
    catch {
      case e: java.util.concurrent.ExecutionException =>
        throw Option(e.getCause).getOrElse(e)
    }
}
