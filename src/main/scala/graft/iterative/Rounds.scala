package graft.iterative

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Iterative batch: re-run a job DAG over many parameter "rounds" with
  * per-round cache control (reference: extensions/iterativebatch —
  * IterativeBatchExecutor.scala:36-137 queues RoundContexts;
  * IterativeInfo.java:283-299 classifies each vertex ALWAYS / PARAMETER /
  * NEVER; caches CacheAlways / CacheByParameter / RoundAwareCacheOnce).
  *
  * Spark-native: a round is a plain loop iteration; the cache classes map
  * onto `persist()` policies —
  *  - NEVER (parameter-independent): computed once, persisted, shared by
  *    every round;
  *  - PARAMETER: memoized per distinct parameter signature;
  *  - ALWAYS: rebuilt every round (no persist).
  *
  * At scale the NEVER inputs are the big win: a 100 TB dimension scan is
  * paid once for a 1000-round sweep instead of 1000 times.
  */
final case class RoundContext(params: Map[String, String]) {
  def apply(key: String): String = params(key)
  def signature(keys: Seq[String]): String =
    keys.sorted.map(k => s"$k=${params.getOrElse(k, "")}").mkString("&")
}

final class Rounds(spark: SparkSession, level: StorageLevel = StorageLevel.MEMORY_AND_DISK) {

  private val onceCache = mutable.Map.empty[String, DataFrame]
  private val paramCache = mutable.Map.empty[(String, String), DataFrame]

  /** NEVER-recompute input: built and persisted on first use, shared
    * across all rounds.
    */
  def cacheOnce(name: String)(build: => DataFrame): DataFrame =
    onceCache.getOrElseUpdate(name, build.persist(level))

  /** PARAMETER-keyed input: one persisted instance per distinct value of
    * the given parameter keys.
    */
  def cacheByParameter(name: String, ctx: RoundContext, keys: Seq[String])(
      build: RoundContext => DataFrame): DataFrame =
    paramCache.getOrElseUpdate((name, ctx.signature(keys)), build(ctx).persist(level))

  /** Run the flow once per round, in order; returns (round, result). */
  def run(rounds: Seq[Map[String, String]])(
      flow: (RoundContext, Rounds) => DataFrame): Seq[(RoundContext, DataFrame)] =
    rounds.map { p =>
      val ctx = RoundContext(p)
      ctx -> flow(ctx, this)
    }

  /** Release all cached inputs (end of the sweep). */
  def close(): Unit = {
    onceCache.values.foreach(_.unpersist(false))
    paramCache.values.foreach(_.unpersist(false))
    onceCache.clear(); paramCache.clear()
  }
}
