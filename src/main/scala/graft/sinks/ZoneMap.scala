package graft.sinks

import java.io.{ObjectInputStream, ObjectOutputStream}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.column.statistics.{IntStatistics, LongStatistics}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level data skipping over a sort-clustered parquet table — the
  * zone-map / small-materialized-aggregate pattern (Moerkotte 1998,
  * "Small Materialized Aggregates"; the file-statistics pruning model of
  * the open lakehouse formats). Parquet already stores row-group min/max
  * and Spark pushes predicates into them, but that pruning happens AFTER
  * the scan has listed every file and opened every footer: at 10⁶ files
  * per table that is 10⁶ metadata round-trips per query. A zone map
  * inverts it — ONE small index (a row per file) resolves which files
  * can contain the predicate range, and the scan is planned over only
  * those paths.
  *
  * The pattern needs data clustered on the predicate column to bite,
  * so [[write]] range-partitions on the zone column first (disjoint
  * per-file ranges ⇒ a point/range predicate selects O(selectivity)
  * files). [[buildIndex]] never scans data: it reads parquet FOOTERS
  * only, distributed across executors, and aggregates row-group stats to
  * one (min, max, rows) per file. The index lives under `_zonemap/`
  * inside the table directory — an underscore path, invisible to normal
  * `spark.read.parquet(dir)` readers.
  *
  * The reference's Direct I/O has no statistics layer (its input splits
  * are enumerated from directory patterns alone — SURVEY.md §5); this is
  * part of the scale surface a 100 TB corpus needs.
  */
object ZoneMap {

  private val IndexDirName = "_zonemap"


  /** Cluster `df` on `zoneCol` and write it as `numFiles` range-disjoint
    * parquet files under `dir`, then build the zone-map index. Range
    * partitioning gives globally disjoint per-file ranges (the property
    * that makes file pruning proportional to predicate selectivity);
    * the within-file sort additionally tightens parquet's own row-group
    * stats for free.
    */
  def write(df: DataFrame, dir: String, zoneCol: String, numFiles: Int): Unit = {
    df.repartitionByRange(numFiles, col(zoneCol))
      .sortWithinPartitions(zoneCol)
      .write.mode("overwrite").parquet(dir)
    buildIndex(df.sparkSession, dir, zoneCol)
  }

  /** Build (or rebuild) the zone-map index for an existing parquet
    * directory: one row `(file, min_v, max_v, n_rows)` per data file,
    * from footer metadata only — no data pages are read. Footer reads
    * are distributed (one task per slice of the file list): building the
    * index over a million-file table is a metadata-parallel job, not a
    * driver loop. `zoneCol` must be INT32/INT64 in the parquet schema.
    */
  def buildIndex(spark: SparkSession, dir: String, zoneCol: String): Unit = {
    import spark.implicits._
    val files = dataFiles(spark, dir)
    val conf = new IndexUtil.SerializableConf(spark.sparkContext.hadoopConfiguration)
    val slices = math.max(1, math.min(files.size, spark.sparkContext.defaultParallelism))
    val index = spark.createDataset(files)
      .repartition(slices)
      .mapPartitions { paths =>
        paths.map { p =>
          val in = HadoopInputFile.fromPath(new Path(p), conf.conf)
          val r = ParquetFileReader.open(in)
          try {
            var lo = Long.MaxValue
            var hi = Long.MinValue
            var rows = 0L
            r.getFooter.getBlocks.asScala.foreach { b =>
              rows += b.getRowCount
              val c = b.getColumns.asScala
                .find(_.getPath.toDotString == zoneCol)
                .getOrElse(throw new IllegalArgumentException(
                  s"zone column '$zoneCol' not found in $p"))
              c.getStatistics match {
                case s: LongStatistics if !s.isEmpty =>
                  lo = math.min(lo, s.getMin); hi = math.max(hi, s.getMax)
                case s: IntStatistics if !s.isEmpty =>
                  lo = math.min(lo, s.getMin.toLong); hi = math.max(hi, s.getMax.toLong)
                case other => throw new IllegalArgumentException(
                  s"zone column '$zoneCol' in $p has unsupported/absent statistics " +
                    s"(${if (other == null) "null" else other.getClass.getSimpleName}); " +
                    "only INT32/INT64 zone columns are indexable")
              }
            }
            (p, lo, hi, rows)
          } finally r.close()
        }
      }
      .toDF("file", "min_v", "max_v", "n_rows")
    index.coalesce(1).write.mode("overwrite").parquet(s"$dir/$IndexDirName")
  }

  /** The zone-map index as a DataFrame: `(file, min_v, max_v, n_rows)`. */
  def index(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/$IndexDirName")

  /** Data-file paths whose zone intersects `[lower, upper]` — resolved
    * from the index alone. The collect is bounded by the table's file
    * count (the same driver-side class as a partition listing).
    */
  def selectFiles(spark: SparkSession, dir: String, lower: Long, upper: Long): Seq[String] =
    index(spark, dir)
      .filter(col("max_v") >= lower && col("min_v") <= upper)
      .select("file").collect().map(_.getString(0)).toSeq

  /** Pruned read of `dir` for `zoneCol ∈ [lower, upper]`: plan the scan
    * over only the files the index admits, then apply the exact
    * predicate (zones over-approximate; the residual filter also rides
    * into parquet's row-group stats within each surviving file). The
    * result equals `spark.read.parquet(dir).filter(between)` — the index
    * changes the file set, never the answer.
    */
  def read(spark: SparkSession, dir: String, zoneCol: String,
      lower: Long, upper: Long): DataFrame = {
    val files = selectFiles(spark, dir, lower, upper)
    val pred = col(zoneCol) >= lower && col(zoneCol) <= upper
    if (files.isEmpty)
      // constant-false filter: right schema, zero files scanned
      spark.read.parquet(dir).filter(lit(false))
    else spark.read.parquet(files: _*).filter(pred)
  }

  private def dataFiles(spark: SparkSession, dir: String): Seq[String] =
    IndexUtil.dataFiles(spark, dir)
}
