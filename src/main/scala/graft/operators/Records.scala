package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.storage.StorageLevel

/** Multi-port output of a branching operator.
  *
  * The reference routes one pass over a vertex output to multiple
  * downstream edges through a single fan-out shuffle
  * (reference: runtime/.../graph/Branching.scala:58-157,
  * runtime/.../rdd/BranchRDDFunctions.scala:31-105). Catalyst has no
  * single-shuffle multi-sink primitive, so the Spark-native equivalent is:
  * tag each record once, persist the tagged frame, and let each port be a
  * filter over it — the scan and the tagging computation run once, each
  * downstream action reuses the persisted data.
  */
final class BranchPorts private[graft] (val tagged: DataFrame, val tagCol: String) {

  /** All records with the routing tag retained. */
  def all: DataFrame = tagged

  /** The records routed to one port (tag column dropped). */
  def port(value: String): DataFrame = tagged.filter(col(tagCol) === lit(value)).drop(tagCol)

  /** Persist the tagged frame so multiple port consumers share one scan.
    * Equivalent to the reference's single-pass fan-out shuffle.
    */
  def shared(level: StorageLevel = StorageLevel.MEMORY_AND_DISK): BranchPorts =
    new BranchPorts(tagged.persist(level), tagCol)

  /** SINK fan-out in ONE Spark job: stage every port with a single
    * `partitionBy(tagCol)` write, then move each port's partition dir to
    * its destination through [[graft.sinks.DirectOutput]]'s transaction
    * (marker → idempotent renames → marker delete, so all ports commit
    * or none do, and `DirectOutput.recover` settles a crash). This is the
    * reference's one-materialization branch fan-out
    * (runtime/.../rdd/BranchRDDFunctions.scala:54-105, partition-range
    * offsets through one shuffle) for the write case — where [[shared]]
    * + concurrent port actions pay one persist + k filtered passes, the
    * staged write pays ONE pass and zero cache.
    *
    * `dests` maps port tag value → destination dir (a port absent from
    * `dests` is dropped; a listed port with no rows commits an empty
    * marked dir). The tag column is the partition column, so — like
    * [[port]] — it is not in the written files. Staging lives under
    * `markerDir` and moves via rename: destinations must share its
    * filesystem, and tag values must be filesystem/partition-safe names.
    */
  def writeAll(txId: String, markerDir: String, dests: Seq[(String, String)],
      format: String = "parquet"): Unit = {
    require(dests.nonEmpty, "no ports to write")
    import org.apache.hadoop.fs.Path
    val conf = tagged.sparkSession.sparkContext.hadoopConfiguration
    val staging = s"$markerDir/.branch-stage-$txId"
    tagged.write.mode("overwrite").format(format).partitionBy(tagCol).save(staging)
    val f = org.apache.hadoop.fs.FileSystem.get(java.net.URI.create(staging), conf)
    val attempts = dests.map { case (portValue, dest) =>
      val src = new Path(s"$staging/$tagCol=$portValue")
      val attempt = new Path(s"$dest/.attempt-$txId")
      f.mkdirs(new Path(dest))
      if (f.exists(src)) {
        if (f.exists(attempt) && !f.delete(attempt, true))
          throw new java.io.IOException(s"writeAll: cannot clear stale $attempt")
        if (!f.rename(src, attempt))
          throw new java.io.IOException(s"writeAll: rename $src -> $attempt failed")
      } else f.mkdirs(attempt) // port with no rows: commit an empty dir
      (graft.sinks.DirectOutput.Spec(tagged, dest), attempt.toString)
    }
    graft.sinks.DirectOutput.commitAll(conf, txId, markerDir, attempts)
    if (!f.delete(new Path(staging), true) && f.exists(new Path(staging)))
      throw new java.io.IOException(s"writeAll: cannot remove staging $staging")
  }
}

/** Record-level operator algebra: the Extract / Update / Convert / Branch /
  * Split / Logging operators plus the Project / Extend / Restructure core
  * operators (reference: the runtime/.../fragment/user classes,
  * compiler/.../operator/core/ProjectionOperatorsCompiler.scala:37-140).
  *
  * Everything here is a thin declarative layer over Dataset/DataFrame so
  * Catalyst can fuse, prune, and push down through it — an operator chain
  * compiles to a single WholeStageCodegen span rather than the reference's
  * per-record push fragments (runtime/.../fragment/Fragment.scala:21-40).
  */
object Records {

  implicit final class DataFrameRecordOps(private val df: DataFrame) extends AnyVal {

    /** Update: derive/overwrite columns in place, pass everything through
      * (reference: fragment/user/UpdateOperatorFragment.scala:22-36).
      */
    def update(cols: (String, Column)*): DataFrame =
      df.withColumns(cols.toMap)

    /** Convert: emit the converted record AND pass the original through —
      * two output ports off one plan (reference:
      * fragment/user/ConvertOperatorFragment.scala:21-36).
      */
    def convert(converted: Column*): (DataFrame, DataFrame) =
      (df.select(converted: _*), df)

    /** Branch: route each record to exactly one enum-labeled port
      * (reference: fragment/user/BranchOperatorFragment.scala:21-34).
      * `tag` must be a total expression (use `otherwise` for the default).
      */
    def branch(tag: Column, tagCol: String = "_branch"): BranchPorts =
      new BranchPorts(df.withColumn(tagCol, tag), tagCol)

    /** Split: one joined record → (left, right) pieces — the inverse of
      * MasterJoin (reference: fragment/user/SplitOperatorFragment.scala:22-40).
      */
    def split(left: Seq[String], right: Seq[String]): (DataFrame, DataFrame) =
      (df.select(left.map(col): _*), df.select(right.map(col): _*))

    /** Logging: pass-through with an observable side channel. Instead of a
      * per-record side effect (reference:
      * fragment/user/LoggingOperatorFragment.scala:21-35) we attach Spark
      * `observe` metrics — zero-cost in the plan, collected per action.
      */
    def logging(name: String, metrics: Column*): DataFrame = {
      val ms = if (metrics.nonEmpty) metrics else Seq(count(lit(1)).as("rows"))
      df.observe(name, ms.head, ms.tail: _*)
    }

    /** Project: narrow to the given columns (reference core Project). */
    def project(cols: String*): DataFrame = df.select(cols.map(col): _*)

    /** Extend: widen with new (null-initialized unless given) columns
      * (reference core Extend).
      */
    def extend(cols: (String, Column)*): DataFrame = df.withColumns(cols.toMap)

    /** Restructure onto a target schema: same-named columns are kept and
      * cast, missing ones become typed nulls (reference core Restructure,
      * ProjectionOperatorsCompiler.scala:98-140 copies same-named
      * same-typed properties).
      */
    def restructure(target: StructType): DataFrame = {
      val existing = df.columns.toSet
      df.select(target.fields.toSeq.map { f =>
        if (existing(f.name)) col(f.name).cast(f.dataType).as(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }: _*)
    }

    /** Checkpoint: explicit recompute barrier (reference: planner rewrites
      * checkpoint operators into plan markers, SparkPlanning.java:479-489).
      * Spark-native equivalent: persist — downstream branches share one
      * materialization.
      */
    def checkpointBarrier(level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame =
      graft.Caches.track(df.persist(level))
  }

  implicit final class DatasetRecordOps[T](private val ds: Dataset[T]) extends AnyVal {

    /** Extract: 1 record → N output records, arbitrary user code
      * (reference: fragment/user/ExtractOperatorFragment.scala:22-35).
      * Multi-port extract = emit a tagged ADT then `branch` on the tag.
      */
    def extract[U: Encoder](f: T => IterableOnce[U]): Dataset[U] =
      ds.flatMap(f)

    /** Typed Update. */
    def updateEach(f: T => T)(implicit e: Encoder[T]): Dataset[T] = ds.map(f)

    /** Typed Convert: (converted, original). */
    def convertEach[U: Encoder](f: T => U): (Dataset[U], Dataset[T]) = (ds.map(f), ds)
  }
}
