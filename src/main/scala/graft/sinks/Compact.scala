package graft.sinks

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Transactional small-file compaction — the maintenance operator every
  * long-lived table needs: streaming ingest, frequent upserts and
  * fine-grained partitioning all decay a table into millions of KB-sized
  * files, and at that point LISTING the table costs more than scanning
  * it (every file is a metadata round-trip and a scan task). [[compact]]
  * rewrites just the small files of a directory into target-sized ones,
  * leaves already-large files untouched, and makes the swap crash-safe
  * with the same marker / roll-forward discipline as [[DirectOutput]]:
  * a compaction either fully lands (files swapped, originals gone) or is
  * fully rolled back by [[recover]] — never both row sets at once after
  * recovery.
  *
  * Like [[graft.streaming.StreamOps.compactIndex]], run it while no
  * query is mid-scan over the directory (between batch jobs / streaming
  * triggers): a reader that planned its file list before the swap can
  * hit deleted originals mid-read. Single maintainer per table at a
  * time; call [[recover]] on restart before compacting again.
  *
  * Scale shape: one column-pruned-nothing read of ONLY the small files
  * (large files are never opened), coalesced to size — no shuffle; the
  * commit is O(files) renames; recovery replays idempotent
  * rename-if-exists / delete-if-exists steps from the marker manifest.
  */
object Compact {

  final case class Stats(scanned: Int, compacted: Int, written: Int)

  private val TxDir = "_compact_tx"

  /** Rewrite every data file smaller than `smallBytes` into files of
    * roughly `targetBytes`, transactionally. No-op (Stats(n, 0, 0)) when
    * fewer than two files qualify — one small file gains nothing.
    */
  def compact(spark: SparkSession, dir: String,
      targetBytes: Long = 128L << 20, smallBytes: Long = 32L << 20): Stats = {
    require(targetBytes > 0 && smallBytes > 0, "Compact: sizes must be positive")
    // outputs are sized ~targetBytes; if they could re-qualify as small,
    // every maintenance run would rewrite the whole table forever
    require(smallBytes * 2 <= targetBytes,
      s"Compact: smallBytes ($smallBytes) must be <= targetBytes/2 " +
        s"($targetBytes/2) or compacted output re-qualifies as small (churn loop)")
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    recover(spark, dir)
    val all = dataFiles(fs, dir)
    val smalls = all.filter(_._2 < smallBytes)
    if (smalls.size < 2) return Stats(all.size, 0, 0)
    val txId = java.util.UUID.randomUUID().toString.take(12)
    val attempt = new Path(dir, s".compact-attempt-$txId")
    val nOut = math.max(1, math.ceil(smalls.map(_._2).sum.toDouble / targetBytes).toInt)
    // mergeSchema: on a schema-evolved table the smalls may carry
    // DIFFERENT schemas — a single inferred footer would silently drop
    // the columns it lacks, and finish() deletes the originals (the only
    // copies) right after
    spark.read.option("mergeSchema", "true").parquet(smalls.map(_._1.toString): _*)
      .coalesce(nOut)
      .write.mode("overwrite").parquet(attempt.toString)
    // marker written AFTER the attempt job succeeded: its existence means
    // "roll forward"; written via temp + rename so recovery never reads a
    // half manifest
    val marker = new Path(new Path(dir, TxDir), txId)
    val manifest = smalls.map(_._1.getName).mkString("\n")
    fs.mkdirs(marker.getParent)
    val tmp = new Path(marker.getParent, s".$txId.tmp")
    val out = fs.create(tmp, true)
    out.write(manifest.getBytes(StandardCharsets.UTF_8)); out.close()
    if (!fs.rename(tmp, marker))
      throw new java.io.IOException(s"Compact: cannot publish marker $marker")
    val written = finish(fs, dir, txId)
    Stats(all.size, smalls.size, written)
  }

  /** Replay interrupted compactions: a transaction with a published
    * marker rolls FORWARD (its attempt job had already succeeded); an
    * attempt directory without a marker is pre-commit garbage and rolls
    * back. Idempotent — every step is rename-if-exists /
    * delete-if-exists.
    */
  def recover(spark: SparkSession, dir: String): Unit = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val txDir = new Path(dir, TxDir)
    val markers =
      if (fs.exists(txDir))
        fs.listStatus(txDir).toSeq.filter(s => !s.getPath.getName.startsWith("."))
      else Seq.empty
    markers.foreach(m => finish(fs, dir, m.getPath.getName))
    if (fs.exists(new Path(dir))) {
      val committed = markers.map(_.getPath.getName).toSet
      fs.listStatus(new Path(dir)).toSeq
        .filter { s =>
          val n = s.getPath.getName
          n.startsWith(".compact-attempt-") &&
            !committed.contains(n.stripPrefix(".compact-attempt-"))
        }
        .foreach(s => fs.delete(s.getPath, true))
    }
  }

  /** Roll transaction `txId` forward: rename attempt files in (uniquely
    * prefixed — never colliding with live files), delete the originals
    * listed in the marker manifest, drop attempt dir and marker. Every
    * step idempotent. Returns the number of files renamed in (0 on a
    * replay that already moved them).
    */
  private def finish(fs: FileSystem, dir: String, txId: String): Int = {
    val attempt = new Path(dir, s".compact-attempt-$txId")
    val marker = new Path(new Path(dir, TxDir), txId)
    var moved = 0
    if (fs.exists(attempt)) {
      fs.listStatus(attempt).foreach { st =>
        val name = st.getPath.getName
        if (st.isFile && !name.startsWith("_") && !name.startsWith(".")) {
          val dst = new Path(dir, s"compact-$txId-$name")
          if (fs.exists(dst) && !fs.delete(dst, true))
            throw new java.io.IOException(s"Compact: cannot replace $dst")
          if (!fs.rename(st.getPath, dst))
            throw new java.io.IOException(s"Compact: cannot commit ${st.getPath}")
          moved += 1
        }
      }
    }
    val manifest = new String(readFully(fs, marker), StandardCharsets.UTF_8)
    manifest.split("\n").filter(_.nonEmpty).foreach { orig =>
      val p = new Path(dir, orig)
      if (fs.exists(p) && !fs.delete(p, false))
        throw new java.io.IOException(s"Compact: cannot delete original $p")
    }
    if (fs.exists(attempt)) fs.delete(attempt, true)
    fs.delete(marker, false)
    moved
  }

  private def readFully(fs: FileSystem, p: Path): Array[Byte] = {
    val in = fs.open(p)
    try {
      val len = fs.getFileStatus(p).getLen.toInt
      val buf = new Array[Byte](len)
      in.readFully(0, buf)
      buf
    } finally in.close()
  }

  private def dataFiles(fs: FileSystem, dir: String): Seq[(Path, Long)] =
    fs.listStatus(new Path(dir)).toSeq
      .filter { s =>
        val n = s.getPath.getName
        s.isFile && n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")
      }
      .map(s => (s.getPath, s.getLen))
}
