package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** The iterative-rounds checkpoint discipline, shared by every fixed-point
  * loop in the engine ([[graft.dedup.Cluster.connectedComponents]],
  * [[Graphs.pageRank]] / [[Graphs.personalizedPageRank]] /
  * [[Graphs.bfsDistances]]): each round's frame is checkpointed LAZILY to
  * truncate the logical plan (which otherwise grows by a join+union+agg
  * per round and blows up analysis/codegen after ~10 rounds), and the
  * caller gets back a releaser that frees the superseded round's blocks
  * once the next round has materialized.
  *
  * `reliable = false` (default path, local runs): `localCheckpoint`
  * blocks — fast, but they die with an executor, so a lost executor
  * mid-loop fails the job. `reliable = true` (the caller passed a durable
  * `checkpointDir`): the round is persisted first so the `checkpoint()`
  * write reads the cache instead of recomputing the round's lineage, then
  * the releaser drops only the cache — the checkpoint FILES in the
  * caller's durable directory take over as the recovery source, so a
  * 50-round PageRank on a real cluster survives executor loss.
  */
private[graft] object Checkpoints {

  /** Lazy plan-truncating checkpoint + a releaser for its cached blocks.
    * Local mode: the checkpointed RDD lives inside the returned Dataset's
    * plan where `df.unpersist` can't reach it — pull the LogicalRDD leaf
    * out of the analyzed plan and release exactly that (never diff the
    * JVM-global persistent-RDD registry: a CONCURRENT driver thread's
    * persists would be captured and unpersisted under its feet).
    */
  def truncating(reliable: Boolean)(df: DataFrame): (DataFrame, () => Unit) =
    if (reliable) {
      val cached = df.persist(StorageLevel.MEMORY_AND_DISK)
      (cached.checkpoint(false), () => { cached.unpersist(false); () })
    } else {
      val out = df.localCheckpoint(false)
      val ckRdds = out.queryExecution.analyzed.collect {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
      }
      (out, () => ckRdds.foreach(_.unpersist(false)))
    }
}
