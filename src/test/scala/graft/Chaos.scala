package graft

import org.apache.spark.sql.SparkSession

/** Block-loss chaos for the reliable-checkpoint specs: a background
  * thread that repeatedly unpersists EVERY persistent RDD while the body
  * runs — the local-mode stand-in for executors dying mid-loop. Reliable
  * checkpoint mode must shrug this off (blocks are the fast path, the
  * checkpoint FILES the recovery path); local-checkpoint mode would lose
  * truncated lineage irrecoverably, which is exactly why the durable
  * path exists.
  */
object Chaos {

  def killingBlocks[T](spark: SparkSession, everyMs: Long = 75L)(body: => T): T = {
    val sc = spark.sparkContext
    @volatile var stop = false
    val killer = new Thread(() => {
      while (!stop) {
        sc.getPersistentRDDs.values.foreach(_.unpersist(false))
        Thread.sleep(everyMs)
      }
    }, "graft-chaos-block-killer")
    killer.setDaemon(true)
    killer.start()
    try body
    finally {
      stop = true
      killer.join(2000)
    }
  }
}
