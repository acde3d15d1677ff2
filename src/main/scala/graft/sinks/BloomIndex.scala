package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Per-file Bloom-filter index — point-lookup file skipping where
  * [[ZoneMap]]/[[ZOrder]] min/max statistics cannot prune at all:
  * hash-distributed keys (every file spans the full value range, so
  * range stats admit everything) with each key's rows living in few
  * files. A per-file Bloom answers "can key k be in this file" in one
  * bitset probe; a point lookup then scans only the admitted files —
  * for hash-clustered data that is ~1 file (+ false positives) out of
  * any table size. The row-group analogue ships inside parquet itself;
  * this is the FILE-level tier that saves the footer round-trips, same
  * as [[ZoneMap]]'s relationship to row-group min/max (Bloom 1970).
  *
  * Scale shape: the build is one column-pruned scan aggregated per file
  * — a typed Aggregator merges map-side, so one Bloom per file crosses
  * the exchange, not rows. Index size is files × 1.44·n·log2(1/fpp)
  * bits (~90 KB per 10⁵-row file at 1 % fpp) — size `fpp` to the file
  * count you must keep resident. Lookups deserialize blooms ON
  * EXECUTORS and collect only admitted file NAMES; the driver never
  * holds a bloom. The index changes the file set, never the answer:
  * false positives cost an extra file scan, the exact predicate still
  * applies, and a MISSING index entry admits the file (fail-open on new
  * files, never a wrong empty result).
  */
object BloomIndex {

  private def indexDir(column: String) = s"_bloomidx_$column"

  private final class BloomAgg(expectedItems: Long, fpp: Double)
      extends Aggregator[Long, BloomFilter, Array[Byte]] {
    def zero: BloomFilter = BloomFilter.create(expectedItems, fpp)
    def reduce(b: BloomFilter, v: Long): BloomFilter = { b.putLong(v); b }
    def merge(a: BloomFilter, b: BloomFilter): BloomFilter = { a.mergeInPlace(b); a }
    def finish(b: BloomFilter): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      b.writeTo(out)
      out.toByteArray
    }
    def bufferEncoder: Encoder[BloomFilter] = Encoders.javaSerialization[BloomFilter]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Build the per-file Bloom index for integral `column` under `dir`:
    * one column-pruned scan, one bloom per file map-side-merged across
    * the exchange, index rows `(file, n_rows, bloom)` written beside the
    * data (underscore dir — invisible to plain readers).
    * `expectedItemsPerFile` sizes each bloom; overfull files degrade to
    * a higher false-positive rate, never to wrong answers.
    */
  def build(spark: SparkSession, dir: String, column: String,
      expectedItemsPerFile: Long = 1L << 20, fpp: Double = 0.01): Unit = {
    val agg = udaf(new BloomAgg(expectedItemsPerFile, fpp))
    // key by basename: input_file_name() URIs and FileSystem listings
    // render the same path differently; names are unique within a dir
    spark.read.parquet(dir)
      .select(substring_index(input_file_name(), "/", -1).as("_f"),
        col(column).cast("long").as("_v"))
      .filter(col("_v").isNotNull)
      .groupBy(col("_f"))
      .agg(count(lit(1)).as("n_rows"), agg(col("_v")).as("bloom"))
      .withColumnRenamed("_f", "file")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/${indexDir(column)}")
  }

  /** Data files that may contain `value` — bloom probes run distributed
    * over the index, only admitted file NAMES reach the driver. Files
    * with no index row (appended after the build) are admitted.
    */
  def selectFiles(spark: SparkSession, dir: String, column: String,
      value: Long): Seq[String] = {
    import spark.implicits._
    // ONE index scan + ONE job: each row yields (file, mightContain), so
    // the probed and indexed sets come from the same pass — the previous
    // two-scan form doubled per-lookup index I/O on the hot path
    val probes = spark.read.parquet(s"$dir/${indexDir(column)}")
      .select(col("file"), col("bloom"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.map { case (f, bytes) =>
        (f, BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
          .mightContainLong(value))
      })
      .collect()
    val probed = probes.collect { case (f, true) => f }.toSet
    val indexed = probes.map(_._1).toSet
    val all = dataFiles(spark, dir)
    def base(p: String) = p.substring(p.lastIndexOf('/') + 1)
    all.filter(f => probed.contains(base(f)) || !indexed.contains(base(f)))
  }

  /** Point read `column = value` planned over only the admitted files;
    * the exact predicate removes bloom false positives. Equals the
    * unpruned filtered read.
    */
  def read(spark: SparkSession, dir: String, column: String, value: Long): DataFrame = {
    val files = selectFiles(spark, dir, column, value)
    if (files.isEmpty) spark.read.parquet(dir).filter(lit(false))
    else spark.read.parquet(files: _*).filter(col(column) === value)
  }

  private def dataFiles(spark: SparkSession, dir: String): Seq[String] =
    IndexUtil.dataFiles(spark, dir)
}
