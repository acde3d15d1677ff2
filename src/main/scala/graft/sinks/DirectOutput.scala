package graft.sinks

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame

/** Transactional "Direct I/O"-style file output.
  *
  * The reference runs file output in three phases — Setup (delete
  * patterns), Prepare (write attempts per partition), Commit (transaction
  * marker, then per-datasource commit and cleanup) — coordinated by a
  * TransactionManager (reference: runtime/.../graph/DirectOutputSetup
  * .scala:27-65, DirectOutputPrepare.scala:50-258, DirectOutputCommit
  * .scala:29-90, TransactionManager.scala:33-100).
  *
  * Spark already gives task/job atomicity through its commit protocol;
  * what it lacks is the *multi-dataset* transaction marker: if a job
  * writes N outputs, a crash between job commits leaves a mix. We
  * reproduce the reference's design on top of Spark committers:
  *
  *  1. setup: delete requested patterns;
  *  2. prepare: each dataset writes to `<path>/.attempt/` (Spark job
  *     commit makes each attempt internally consistent);
  *  3. commit: write a transaction marker, atomically rename every
  *     attempt into place, delete the marker.
  *
  * Recovery rule (same as the reference's TransactionManager): marker
  * present ⇒ roll forward (re-run renames — they are idempotent); no
  * marker ⇒ attempts are garbage, roll back by deleting them.
  *
  * Scale notes: renames are per-dataset directory moves, O(datasets) not
  * O(files); data movement happens in the parallel prepare phase.
  */
object DirectOutput {

  final case class Spec(df: DataFrame, path: String, partitionBy: Seq[String] = Nil,
      format: String = "parquet", options: Map[String, String] = Map.empty)

  private def fs(conf: Configuration, path: String): FileSystem =
    FileSystem.get(URI.create(path), conf)

  /** Setup phase: delete the given paths/glob patterns. */
  def setup(conf: Configuration, deletePatterns: Seq[String]): Unit =
    deletePatterns.foreach { p =>
      val f = fs(conf, p)
      val matches = f.globStatus(new Path(p))
      if (matches != null) matches.foreach(s => f.delete(s.getPath, true))
    }

  /** Prepare phase for one dataset: write its attempt directory (a Spark
    * job with its own internal commit). Nothing under `spec.path` becomes
    * visible until [[commitAll]].
    */
  def prepare(spec: Spec, txId: String): (Spec, String) = {
    val attempt = s"${spec.path}/.attempt-$txId"
    val w = spec.df.write.mode("overwrite").format(spec.format).options(spec.options)
    (if (spec.partitionBy.nonEmpty) w.partitionBy(spec.partitionBy: _*) else w).save(attempt)
    (spec, attempt)
  }

  /** Commit phase: marker first, then idempotent renames, then marker
    * removal — the transaction point for ALL prepared attempts at once.
    */
  def commitAll(conf: Configuration, txId: String, markerDir: String,
      attempts: Seq[(Spec, String)]): Unit = {
    val mfs = fs(conf, markerDir)
    val marker = new Path(s"$markerDir/.graft-tx-$txId")
    mfs.mkdirs(marker.getParent)
    mfs.create(marker, true).close()
    attempts.foreach { case (s, attempt) => commitOne(conf, s.path, attempt) }
    mfs.delete(marker, false)
  }

  /** Prepare + commit a set of datasets as one transaction. The prepare
    * phase submits every dataset's write job from its own driver thread —
    * the reference's node-level concurrency (SparkClient.scala:48-66 runs
    * every graph node as a Future on a dedicated executor pool): with
    * independent outputs, one job's shuffle/read stalls overlap another's
    * compute instead of serializing. Spark supports multi-threaded job
    * submission natively; commit stays sequential (O(datasets) renames).
    */
  def write(txId: String, markerDir: String, specs: Seq[Spec]): Unit = {
    require(specs.nonEmpty, "no datasets to write")
    val conf = specs.head.df.sparkSession.sparkContext.hadoopConfiguration
    val attempts =
      if (specs.size == 1) specs.map(prepare(_, txId))
      else {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(math.min(specs.size, 8))
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.fromExecutorService(pool)
        // lift to Try so every submitted prepare runs to completion BEFORE
        // the first failure propagates: fail-fast Future.sequence would
        // return while sibling prepares are still writing attempt dirs, and
        // a caller's recover/abort could race those writes (a freshly
        // re-created .attempt dir appearing after cleanup)
        try {
          val settled = scala.concurrent.Await.result(
            scala.concurrent.Future.sequence(specs.map(s =>
              scala.concurrent.Future(prepare(s, txId))
                .transform(scala.util.Success(_)))),
            scala.concurrent.duration.Duration.Inf)
          settled.collectFirst { case scala.util.Failure(e) =>
            // sibling attempts that DID complete are pre-commit garbage by
            // the recovery rule (no marker was ever written) — best-effort
            // delete now instead of letting repeated failures accumulate
            // orphaned attempt data until someone calls recover()
            settled.foreach {
              case scala.util.Success((sp, attempt)) =>
                try { fs(conf, sp.path).delete(new Path(attempt), true); () }
                catch { case _: Throwable => () }
              case _ => ()
            }
            throw e
          }
          settled.map(_.get)
        } finally pool.shutdown()
      }
    commitAll(conf, txId, markerDir, attempts)
  }

  /** Rename one attempt's files into place. Idempotent (re-runnable after
    * a crash) and strict: a false return from rename/delete is data loss
    * waiting to be reported as success, so it throws instead.
    */
  private def commitOne(conf: Configuration, outPath: String, attempt: String): Unit = {
    val f = fs(conf, outPath)
    val src = new Path(attempt)
    f.listStatus(src).foreach { st =>
      val name = st.getPath.getName
      if (name != "_SUCCESS") {
        val dst = new Path(outPath, name)
        if (f.exists(dst) && !f.delete(dst, true))
          throw new java.io.IOException(s"commit: cannot delete existing $dst")
        if (!f.rename(st.getPath, dst))
          throw new java.io.IOException(s"commit: rename ${st.getPath} -> $dst failed")
      }
    }
    if (!f.delete(src, true))
      throw new java.io.IOException(s"commit: cannot remove attempt dir $src")
    f.create(new Path(outPath, "_GRAFT_COMMITTED"), true).close()
  }

  /** Grouped (dynamic-partition) output with pattern-named files: write
    * `partitionBy(groupCols)` transactionally, then rename each part file
    * according to the pattern (reference capability: OutputPatternGenerator
    * fragments — constants, property, formatted number/date, random).
    *
    * The rename pass is driver-side and O(files) — same cost class as the
    * reference's commit phase; data movement stays in the parallel write.
    */
  def writeGrouped(txId: String, markerDir: String, spec: Spec,
      pattern: OutputPattern): Unit = {
    require(spec.partitionBy.nonEmpty, "writeGrouped needs partition columns")
    write(txId, markerDir, Seq(spec))
    val conf = spec.df.sparkSession.sparkContext.hadoopConfiguration
    val f = fs(conf, spec.path)

    def walk(dir: Path, values: Map[String, String]): Unit = {
      val (dirs, files) = f.listStatus(dir).partition(_.isDirectory)
      dirs.foreach { d =>
        d.getPath.getName.split("=", 2) match {
          case Array(k, v) => walk(d.getPath, values + (k -> v))
          case _ => walk(d.getPath, values)
        }
      }
      files.filter(_.getPath.getName.startsWith("part-")).sortBy(_.getPath.getName)
        .zipWithIndex.foreach { case (st, i) =>
          val dest = new Path(dir, pattern.render(values, i))
          // same rule as commitOne: a false rename silently leaves the
          // part- name in place and every pattern-matching consumer
          // misses those rows — fail loudly instead
          if (!f.rename(st.getPath, dest))
            throw new java.io.IOException(
              s"writeGrouped: rename ${st.getPath} -> $dest failed " +
                "(destination exists? pattern must render unique names per file)")
        }
    }
    walk(new Path(spec.path), Map.empty)
  }

  /** Recovery scan, the reference TransactionManager rule: a live marker
    * means the transaction reached its commit point — roll FORWARD by
    * re-running the (idempotent) renames, then clear the marker; attempts
    * without a marker are garbage from a pre-commit crash — roll back by
    * deleting them. Call on job restart before new writes.
    *
    * `txFilter` scopes the scan to this writer's own transaction ids:
    * markers and attempts of a non-matching tx are left untouched, so two
    * writers sharing a marker dir / output path (distinct tx prefixes)
    * cannot delete each other's in-flight transaction mid-commit and turn
    * its roll-forward into a rollback. The permissive default is correct
    * only under single-writer-per-path discipline.
    *
    * CONTRACT: `paths` must cover EVERY dataset an in-scope transaction
    * writes (the same set its `write(...)` call listed). The marker is
    * deleted after the scan, so a partial path list would roll forward
    * only the covered datasets and leave the rest's attempts markerless
    * — a later recover would roll them BACK: a partial commit of a
    * multi-dataset transaction. Every graft call site passes the full
    * spec list (setup/write/recover are always path-for-path aligned).
    */
  def recover(conf: Configuration, markerDir: String, paths: Seq[String],
      txFilter: String => Boolean = _ => true): Unit = {
    val mfs = fs(conf, markerDir)
    val live: Set[String] = Option(mfs.globStatus(new Path(s"$markerDir/.graft-tx-*")))
      .map(_.map(_.getPath.getName.stripPrefix(".graft-tx-")).toSet).getOrElse(Set.empty)
      .filter(txFilter)
    paths.foreach { p =>
      val f = fs(conf, p)
      val attempts = Option(f.globStatus(new Path(s"$p/.attempt-*"))).getOrElse(Array.empty)
      attempts.foreach { a =>
        val tx = a.getPath.getName.stripPrefix(".attempt-")
        if (txFilter(tx)) {
          if (live.contains(tx)) commitOne(conf, p, a.getPath.toString) // roll forward
          else f.delete(a.getPath, true) // roll back
        } // foreign writer's attempt: not ours to judge
      }
    }
    // in-scope markers whose attempts are all rolled forward are done
    live.foreach(tx => mfs.delete(new Path(s"$markerDir/.graft-tx-$tx"), false))
  }
}
