package graft

import java.util.concurrent.{Executors, ThreadFactory}
import java.util.concurrent.atomic.AtomicInteger

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import scala.util.control.NonFatal

import org.apache.spark.SparkContext
import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

import graft.operators.BranchPorts

/** Concurrent submission of independent Spark actions from driver
  * threads.
  *
  * The reference executes every graph node as a Future on a dedicated
  * cached thread pool, so independent branches of a jobflow DAG overlap
  * on the cluster (`runtime/src/main/scala/com/asakusafw/spark/runtime/
  * SparkClient.scala:48-66` "asakusa-executor" pool; `graph/Job.scala:
  * 24-37` kicks all nodes). One Spark action at a time from a
  * single-threaded driver leaves the cluster idle between stages of a
  * wide DAG: while sink A's final (narrow, few-task) stages run, sink
  * B's scans could already be in flight. Spark's scheduler is built for
  * this — job submission is thread-safe and the FAIR scheduler exists
  * precisely to interleave concurrently-submitted jobs.
  *
  * At 100 TB the win is utilization, not shuffle volume: k independent
  * sinks submitted together keep all executors busy through each sink's
  * narrow tail. Failure semantics are all-or-nothing, like the
  * reference's Job: the first failure cancels the job group (best
  * effort interrupt of the sibling actions' running stages) and is
  * rethrown to the caller.
  */
object Jobs {

  private val poolSeq = new AtomicInteger()

  /** Run labeled actions concurrently on a dedicated driver-side pool;
    * returns results in input order. `parallelism` caps in-flight
    * actions (0 = one thread per action, the reference's cached-pool
    * behavior). Each action's Spark jobs carry its label as the job
    * description and share one cancellation group.
    */
  def runAll[T](spark: SparkSession, actions: Seq[(String, () => T)],
      parallelism: Int = 0): Seq[T] = {
    if (actions.isEmpty) return Nil
    val sc = spark.sparkContext
    val par = if (parallelism > 0) math.min(parallelism, actions.size) else actions.size
    val group = s"graft-jobs-${poolSeq.incrementAndGet()}"
    val pool = Executors.newFixedThreadPool(par, new ThreadFactory {
      private val n = new AtomicInteger()
      override def newThread(r: Runnable): Thread = {
        val t = new Thread(r, s"$group-${n.incrementAndGet()}")
        t.setDaemon(true)
        t
      }
    })
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    // All-or-nothing really means NOTHING runs after a failure: when
    // `parallelism` caps the pool, queued actions would otherwise start
    // AFTER the caller saw the batch fail (shutdown() lets the queue
    // drain) and submit fresh, never-cancelled jobs — a sink could write
    // output in the background of a "failed" fan-out. The failing action
    // itself records the root cause and flips the flag BEFORE its future
    // completes, so a later dequeue can never miss it.
    val firstFailure = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    try {
      val futures = actions.map { case (label, action) =>
        Future {
          if (firstFailure.get() != null)
            throw new java.util.concurrent.CancellationException(
              s"'$label' skipped: a sibling action already failed")
          // job-group properties are per-thread: set for every action so a
          // failure in ANY sibling can cancel the whole fan-out, and the
          // Spark UI attributes stages to the sink that submitted them
          sc.setJobGroup(group, label, interruptOnCancel = true)
          try action()
          catch { case NonFatal(e) => firstFailure.compareAndSet(null, e); throw e }
          finally sc.clearJobGroup()
        }
      }
      try Await.result(Future.sequence(futures), Duration.Inf)
      catch {
        case NonFatal(e) =>
          // all-or-nothing: the siblings' work is unusable once one sink
          // failed — stop burning the cluster on it, including any job a
          // still-running sibling submits between here and its skip check
          try sc.cancelJobGroupAndFutureJobs(group) catch { case NonFatal(_) => }
          // Future.sequence surfaces whichever future failed first in
          // traversal order — prefer the recorded root cause over a
          // sibling's secondary CancellationException
          throw Option(firstFailure.get()).getOrElse(e)
      }
    } finally pool.shutdown()
  }

  /** Single-pass branch fan-out: persist the tagged frame once (ONE scan
    * of the upstream plan), consume every port concurrently, release the
    * cache. The reference pushes k branch edges through one fan-out
    * shuffle (`runtime/.../rdd/BranchRDDFunctions.scala:54-105`); this is
    * the Spark-native equivalent — the persist is the single
    * materialization, the concurrent port actions overlap the downstream
    * work the reference would run as separate vertices.
    */
  def forkBranches[T](ports: BranchPorts,
      handlers: Seq[(String, org.apache.spark.sql.DataFrame => T)],
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
      parallelism: Int = 0): Seq[T] = {
    val spark = ports.all.sparkSession
    val shared = ports.shared(level)
    try runAll(spark,
      handlers.map { case (name, h) => name -> (() => h(shared.port(name))) },
      parallelism)
    finally shared.all.unpersist(false)
  }

  /** Expose the job-group id pattern for monitoring/cancellation hooks. */
  private[graft] def currentGroup(sc: SparkContext): Option[String] =
    Option(sc.getLocalProperty("spark.jobGroup.id"))
}
