package graft.iterative

import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}

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

/** `checkpointDir`: when set, cached inputs are additionally written as
  * reliable checkpoints under it — a 1000-round sweep on a real cluster
  * survives executor loss without recomputing the (possibly 100 TB) NEVER
  * inputs from scratch; blocks remain the fast path, the checkpoint files
  * the recovery path. Unset (default), caches are memory/disk blocks only
  * — correct but round-restarting on block loss.
  */
final class Rounds(spark: SparkSession, level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
    checkpointDir: Option[String] = None) {

  checkpointDir.foreach(spark.sparkContext.setCheckpointDir)

  // concurrent maps: [[runAll]] builds rounds on Jobs' driver pool, and
  // computeIfAbsent guarantees a NEVER/PARAMETER input is built exactly
  // once even when every concurrent round asks for it at the same instant
  // (late askers block on the key until the first build returns — plan
  // construction + persist() registration, not job execution)
  // values are lazy holders so the USER BUILD CLOSURE runs OUTSIDE the
  // map's computeIfAbsent critical section: a build that itself calls
  // cacheOnce (deriving one NEVER input from another) would otherwise be
  // a recursive update on the same map — IllegalStateException or a
  // livelock depending on bin collisions. computeIfAbsent only installs
  // the holder (cheap, non-reentrant); `value` then memoizes the build
  // with plain lazy-val semantics (late askers block on the holder, and
  // re-entrant asks target a different, already-installed holder).
  private final class Memo(build: () => DataFrame) { lazy val value: DataFrame = build() }
  private val onceCache = new ConcurrentHashMap[String, Memo]()
  private val paramCache = new ConcurrentHashMap[(String, String), Memo]()
  // the frames whose persist() we own (in reliable mode the HANDED-OUT
  // frame is the checkpointed one, which carries no persist of its own)
  private val retained = new ConcurrentLinkedQueue[DataFrame]()

  private def pin(df: DataFrame): DataFrame = {
    val cached = df.persist(level)
    retained.add(cached)
    if (checkpointDir.isEmpty) cached
    // persist-then-checkpoint: the checkpoint write reads the cache, not a
    // second run of the input's lineage
    else cached.checkpoint(false)
  }

  /** NEVER-recompute input: built and persisted on first use, shared
    * across all rounds.
    */
  def cacheOnce(name: String)(build: => DataFrame): DataFrame =
    onceCache.computeIfAbsent(name, _ => new Memo(() => pin(build))).value

  /** PARAMETER-keyed input: one persisted instance per distinct value of
    * the given parameter keys.
    */
  def cacheByParameter(name: String, ctx: RoundContext, keys: Seq[String])(
      build: RoundContext => DataFrame): DataFrame =
    paramCache.computeIfAbsent((name, ctx.signature(keys)),
      _ => new Memo(() => pin(build(ctx)))).value

  /** Run the flow once per round, in order; returns (round, result). */
  def run(rounds: Seq[Map[String, String]])(
      flow: (RoundContext, Rounds) => DataFrame): Seq[(RoundContext, DataFrame)] =
    rounds.map { p =>
      val ctx = RoundContext(p)
      ctx -> flow(ctx, this)
    }

  /** Run independent rounds CONCURRENTLY on the driver-side job pool —
    * the reference's slot-bounded round queue
    * (extensions/iterativebatch/runtime/core/.../IterativeBatchExecutor
    * .scala:59-137, numSlots concurrent RoundContexts): while one
    * round's narrow tail stages run, the next round's scans are already
    * in flight. `flow` must run the round's ACTION (write/collect) —
    * returning a lazy frame would move the work outside the overlap
    * window. `parallelism` bounds in-flight rounds (0 = all); results
    * return in round order; failure semantics are [[graft.Jobs.runAll]]'s
    * all-or-nothing. Rounds must be independent (a sweep, not a chain) —
    * shared NEVER/PARAMETER caches are safe, cross-round data
    * dependencies are the sequential [[run]]'s territory.
    */
  def runAll[T](rounds: Seq[Map[String, String]], parallelism: Int = 0)(
      flow: (RoundContext, Rounds) => T): Seq[(RoundContext, T)] = {
    val ctxs = rounds.map(RoundContext(_))
    val results = graft.Jobs.runAll(spark,
      ctxs.zipWithIndex.map { case (c, i) =>
        s"round-$i" -> (() => flow(c, this))
      }, parallelism)
    ctxs.zip(results)
  }

  /** Release all cached inputs (end of the sweep). Checkpoint files are
    * left for the caller's directory lifecycle (they may back frames the
    * caller still holds).
    */
  def close(): Unit = {
    retained.forEach(_.unpersist(false))
    retained.clear()
    onceCache.clear(); paramCache.clear()
  }
}
