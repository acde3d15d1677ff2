package graft.sinks

import scala.collection.mutable

import org.apache.hadoop.conf.Configuration

/** Deferred whole-job commit for iterative batches: every round stages its
  * Direct outputs as attempt directories, and NOTHING becomes visible
  * until the single [[commit]] at job end — so a crash between rounds
  * leaves zero committed outputs, and [[DirectOutput.recover]] rolls the
  * orphaned attempts back (no marker was ever written). Mirrors the
  * reference's iterative-batch commit contract (extensions/iterativebatch/
  * runtime/.../graph/IterativeJob.scala:24-37 collects per-round outputs,
  * DirectOutputCommitForIterative commits them once for the whole job).
  *
  * Usage: one instance per iterative job; call `stage(spec)` any number of
  * times across rounds (distinct target paths — rounds parameterize their
  * output path), then exactly one `commit()`; on failure either just crash
  * (recovery rolls back) or call `abort()` to clean up eagerly.
  *
  * Scale notes: staging cost is the (parallel) data write each round —
  * unavoidable; the deferred part adds only O(datasets) renames at commit,
  * so deferring a 1000-round sweep costs the same commit work as a
  * single-round job.
  */
final class DeferredDirectOutput(txId: String, markerDir: String) {

  private val staged = mutable.ArrayBuffer.empty[(DirectOutput.Spec, String)]
  private var conf: Configuration = _
  private var done = false

  /** Stage one dataset: its attempt is written now (a full Spark job),
    * its target path stays untouched until [[commit]].
    */
  def stage(spec: DirectOutput.Spec): Unit = synchronized {
    require(!done, "transaction already committed")
    require(!staged.exists(_._1.path == spec.path),
      s"path already staged in this transaction: ${spec.path} " +
        "(rounds must parameterize their output paths)")
    conf = spec.df.sparkSession.sparkContext.hadoopConfiguration
    staged += DirectOutput.prepare(spec, txId)
  }

  /** Paths staged so far (for recovery bookkeeping). */
  def stagedPaths: Seq[String] = synchronized(staged.map(_._1.path).toSeq)

  /** The transaction point: marker, then every staged attempt renamed into
    * place, then marker removal. All-or-nothing across every round's
    * outputs (a crash inside commit leaves the marker ⇒ recovery rolls
    * forward).
    */
  def commit(): Unit = synchronized {
    require(!done, "transaction already committed")
    require(staged.nonEmpty, "nothing staged")
    DirectOutput.commitAll(conf, txId, markerDir, staged.toSeq)
    done = true
  }

  /** Eager rollback: delete every staged attempt (equivalent to what
    * recovery would do for a marker-less crash).
    *
    * Scoped to THIS transaction (`txFilter`): the permissive recover
    * default would delete CONCURRENT writers' live markers in a shared
    * marker dir, turning their crash-recovery roll-forward into a
    * rollback. And if this transaction's OWN marker is already live, the
    * commit point has passed — recover would roll the remaining attempts
    * FORWARD (publishing everything) while the caller believes it
    * aborted; refuse instead and let the caller complete via
    * commit()/recover().
    */
  def abort(): Unit = synchronized {
    if (!done && conf != null) {
      val marker = new org.apache.hadoop.fs.Path(markerDir, s".graft-tx-$txId")
      val mfs = marker.getFileSystem(conf)
      if (mfs.exists(marker))
        throw new IllegalStateException(
          s"abort: transaction $txId already passed its commit point " +
            "(marker live) — aborting now would PUBLISH the remaining " +
            "attempts; re-run recover/commit to complete it instead")
      DirectOutput.recover(conf, markerDir, staged.map(_._1.path).toSeq,
        txFilter = _ == txId)
    }
    staged.clear()
    done = true
  }
}
