package graft.operators

import java.io.{BufferedInputStream, BufferedOutputStream, File, FileInputStream,
  FileOutputStream, ObjectInputStream, ObjectOutputStream}

import org.apache.spark.TaskContext

/** Bounded per-group buffer that spills overflow to executor-local disk —
  * the guard for the one certainty of a 100 TB corpus: a pathological key
  * whose group does not fit in a task's heap. In-memory up to
  * `maxInMemory` records, then every further append streams to a local
  * temp file; iteration replays memory then disk in append order, and may
  * repeat (master-selection hooks traverse the master list once per
  * transaction). Mirrors the reference's `BufferType.SPILL` →
  * `FileMapListBuffer` escape hatch
  * (/root/reference/runtime/src/main/scala/com/asakusafw/spark/runtime/fragment/user/CoGroupOperatorFragment.scala:65-116).
  *
  * Records must be Java-serializable (Spark `Row`s and case classes are).
  * The spill file is deleted at task completion via TaskContext — the
  * buffer needs no explicit close in operator code. Not thread-safe; a
  * buffer belongs to one task. Appends after the first read are rejected:
  * the write stream is flushed-and-sealed by `iterator`.
  *
  * The threshold is a record count, not bytes — groups are homogeneous
  * records, so the count bound is a faithful memory bound at a fraction
  * of per-record sizeEstimate cost. Default comes from
  * `spark.graft.spill.threshold` so a cluster job can tune it without a
  * code change.
  */
final class SpillBuffer[T](maxInMemory: Int = SpillBuffer.defaultThreshold)
    extends Iterable[T] {
  require(maxInMemory > 0, s"maxInMemory must be positive, got $maxInMemory")

  private val mem = new scala.collection.mutable.ArrayBuffer[T]
  private var file: File = _
  private var out: ObjectOutputStream = _
  private var spilledN: Long = 0L
  private var sealedForRead = false

  def append(t: T): this.type = {
    require(!sealedForRead, "SpillBuffer: append after first read")
    if (out == null && mem.size < maxInMemory) mem += t
    else {
      if (out == null) {
        file = File.createTempFile("graft-spill-", ".bin")
        file.deleteOnExit() // driver-side fallback; tasks clean up below
        Option(TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => delete()))
        out = new ObjectOutputStream(new BufferedOutputStream(new FileOutputStream(file)))
        SpillBuffer.spillsStarted.increment()
      }
      out.writeObject(t)
      spilledN += 1
      // ObjectOutputStream retains every written object for back-references
      // until reset — without this the spill "to disk" keeps the data on
      // heap anyway. Periodic (not per-record) so class descriptors still
      // amortize within a window.
      if (spilledN % SpillBuffer.ResetEvery == 0) out.reset()
    }
    this
  }

  /** True once at least one record went to disk (observability + specs). */
  def spilled: Boolean = spilledN > 0

  override def iterator: Iterator[T] = {
    if (!sealedForRead) {
      sealedForRead = true
      if (out != null) { out.flush(); out.close() }
    }
    if (spilledN == 0) mem.iterator
    else mem.iterator ++ new Iterator[T] {
      private val in = new ObjectInputStream(new BufferedInputStream(new FileInputStream(file)))
      private var read = 0L
      override def hasNext: Boolean = {
        val h = read < spilledN
        if (!h) in.close()
        h
      }
      override def next(): T = {
        read += 1
        in.readObject().asInstanceOf[T]
      }
    }
  }

  override def size: Int = Math.toIntExact(mem.size + spilledN)
  override def isEmpty: Boolean = mem.isEmpty && spilledN == 0

  private def delete(): Unit = {
    try { if (out != null) out.close() } catch { case _: Throwable => () }
    if (file != null) { file.delete(); () }
  }
}

object SpillBuffer {
  private val ResetEvery = 1000

  /** Count of buffers that spilled at least once (process-wide; feeds specs
    * and coarse observability without a metric system dependency).
    */
  val spillsStarted = new java.util.concurrent.atomic.LongAdder

  /** Executor-side configurable threshold: `spark.graft.spill.threshold`
    * (records per group buffer) — read from the executor's SparkConf so a
    * cluster submit can set it; system property fallback for driver-local
    * contexts.
    */
  def defaultThreshold: Int = {
    val env = org.apache.spark.SparkEnv.get
    if (env != null) env.conf.getInt("spark.graft.spill.threshold", DefaultThreshold)
    else sys.props.get("spark.graft.spill.threshold").map(_.toInt).getOrElse(DefaultThreshold)
  }
  private val DefaultThreshold = 1 << 16
}
