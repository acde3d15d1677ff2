package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Input layer.
  *
  * The reference distinguishes Temporary inputs (its own inter-job file
  * format, runtime/.../graph/TemporaryInput.scala:32-51) from Direct I/O
  * inputs (arbitrary Hadoop InputFormats with per-source configuration,
  * runtime/.../graph/DirectInput.scala:28-45). Spark-native: our temporary
  * inter-job format IS parquet, and direct inputs are DataSource V2
  * readers — splits, predicate pushdown, and column pruning come from the
  * source implementation instead of hand-configured InputFormats.
  */
object Sources {

  /** Temporary (inter-job) input: parquet, schema from the footer. */
  def temporary(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Direct input: external dataset in any Spark-supported format with
    * explicit schema (never infer on a 100 TB source — inference is a
    * full extra scan for csv/json) and per-source options, mirroring the
    * reference's per-source "extra configuration".
    */
  def direct(spark: SparkSession, format: String, path: String,
      schema: Option[StructType] = None,
      options: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.read.format(format).options(options)
    schema.fold(r)(r.schema).load(path)
  }
}
