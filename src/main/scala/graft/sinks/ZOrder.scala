package graft.sinks

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.column.statistics.{IntStatistics, LongStatistics}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-column data skipping via Z-order (Morton) clustering — the
  * answer to "we filter this 100 TB table by time AND by key". A table
  * sort-clustered on one column prunes beautifully on it and not at all
  * on any other; interleaving the bits of several columns into one
  * Z-value and range-clustering on THAT gives every participating column
  * locality ∝ 2^-bits — each file covers a small hyper-rectangle, so a
  * range predicate on ANY indexed column admits a small file subset
  * (Morton 1966; the clustering strategy behind the lakehouse OPTIMIZE
  * ZORDER commands). Builds on [[ZoneMap]]'s footer-only statistics
  * model; the reference's Direct I/O plans splits from directory
  * patterns alone (SURVEY.md §5) and has no statistics layer at all.
  *
  * Scale shape: one aggregate job computes per-column min/max for
  * normalization (a handful of longs to the driver), one range exchange
  * clusters by Z-value, and the index build reads FOOTERS only,
  * distributed. Normalization is linear min/max: a heavy outlier
  * compresses everyone else into few buckets and weakens (never breaks)
  * pruning — pre-clamp such columns, or store quantile-bucketed proxy
  * columns. Z-values drive PLACEMENT only; answers always come from
  * exact predicates over the admitted files, so a bad normalization
  * costs speed, never correctness.
  */
object ZOrder {

  private val IndexDirName = "_zonemap_z"

  /** Interleave `cols` (already scaled to `[0, 2^bits)` longs) into one
    * Z-value: output bit `i * n + j` is bit `i` of column `j`. Pure
    * shift/mask arithmetic — whole-stage-codegen'd, no UDF.
    */
  private[graft] def interleave(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 1 && n * bits <= 63, s"interleave: $n cols x $bits bits > 63")
    val terms = for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** `v` linearly scaled from `[lo, hi]` to `[0, 2^bits)`, null-safe
    * (nulls land in bucket 0) and clamp-safe. Double math is fine here:
    * the scaled value drives clustering, not answers.
    */
  private[graft] def scaled(v: Column, lo: Long, hi: Long, bits: Int): Column = {
    val buckets = (1L << bits) - 1
    // span in DOUBLE: `hi - lo` wraps in Long when the column spans more
    // than half the Long range (hashed-id columns legitimately do) — the
    // wrapped negative span would clamp EVERY row into one bucket and
    // silently degenerate the Z-clustering (results stay right; file
    // pruning quietly stops working)
    if (hi <= lo) lit(0L)
    else least(lit(buckets), greatest(lit(0L),
      ((coalesce(v.cast("double"), lit(lo.toDouble)) - lo.toDouble)
        / (hi.toDouble - lo.toDouble) * buckets)
        .cast("long")))
  }

  /** Cluster `df` on the Z-value of `zCols` (INT32/INT64 columns) and
    * write `numFiles` parquet files under `dir`, then build a per-file
    * min/max index over every participating column. One stats aggregate,
    * one range exchange, footer-only index build.
    */
  def write(df: DataFrame, dir: String, zCols: Seq[String], numFiles: Int,
      bits: Int = 16): Unit = {
    require(zCols.nonEmpty, "ZOrder.write: no cluster columns")
    val b = math.min(bits, 63 / zCols.size)
    // per-column bounds: one job, 2 * |zCols| longs to the driver
    val stats = df.agg(
      min(col(zCols.head)).cast("long"), max(col(zCols.head)).cast("long") +:
        zCols.tail.flatMap(c => Seq(min(col(c)).cast("long"), max(col(c)).cast("long"))): _*)
      .head()
    // empty input: bounds collapse, every scaled value lands in bucket 0
    val bounds = zCols.indices.map { i =>
      if (stats.isNullAt(2 * i)) (0L, 0L)
      else (stats.getLong(2 * i), stats.getLong(2 * i + 1))
    }
    val z = interleave(
      zCols.zip(bounds).map { case (c, (lo, hi)) => scaled(col(c), lo, hi, b) }, b)
    df.withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(dir)
    buildIndex(df.sparkSession, dir, zCols)
  }

  /** Per-file min/max index over `zCols`, LONG format — one row
    * `(file, zcol, min_v, max_v, n_rows)` per (file, column), from
    * parquet footers only, distributed one task per file slice.
    */
  def buildIndex(spark: SparkSession, dir: String, zCols: Seq[String]): Unit = {
    import spark.implicits._
    val files = dataFiles(spark, dir)
    val sconf = new IndexUtil.SerializableConf(spark.sparkContext.hadoopConfiguration)
    val cols = zCols
    val slices = math.max(1, math.min(files.size, spark.sparkContext.defaultParallelism))
    val index = spark.createDataset(files)
      .repartition(slices)
      .mapPartitions { paths =>
        val conf = sconf.conf
        paths.flatMap { p =>
          val r = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(p), conf))
          try {
            val rows = r.getFooter.getBlocks.asScala.map(_.getRowCount).sum
            cols.map { zc =>
              var lo = Long.MaxValue
              var hi = Long.MinValue
              r.getFooter.getBlocks.asScala.foreach { blk =>
                val c = blk.getColumns.asScala
                  .find(_.getPath.toDotString == zc)
                  .getOrElse(throw new IllegalArgumentException(
                    s"z-order column '$zc' not found in $p"))
                c.getStatistics match {
                  case s: LongStatistics if !s.isEmpty =>
                    lo = math.min(lo, s.getMin); hi = math.max(hi, s.getMax)
                  case s: IntStatistics if !s.isEmpty =>
                    lo = math.min(lo, s.getMin.toLong); hi = math.max(hi, s.getMax.toLong)
                  case other => throw new IllegalArgumentException(
                    s"z-order column '$zc' in $p has unsupported/absent statistics " +
                      s"(${if (other == null) "null" else other.getClass.getSimpleName})")
                }
              }
              (p, zc, lo, hi, rows)
            }
          } finally r.close()
        }
      }
      .toDF("file", "zcol", "min_v", "max_v", "n_rows")
    index.coalesce(1).write.mode("overwrite").parquet(s"$dir/$IndexDirName")
  }

  /** The index as a DataFrame: `(file, zcol, min_v, max_v, n_rows)`. */
  def index(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/$IndexDirName")

  /** Data files whose per-column zones intersect EVERY given
    * `(column, lower, upper)` predicate — admitted iff no predicate's
    * range misses. Driver collect bounded by the table's file count.
    */
  def selectFiles(spark: SparkSession, dir: String,
      preds: Seq[(String, Long, Long)]): Seq[String] = {
    require(preds.nonEmpty, "ZOrder.selectFiles: no predicates")
    // a predicate on a never-indexed column would otherwise silently
    // admit ZERO files — fail loudly instead of returning a wrong answer
    val indexed = index(spark, dir).select("zcol").distinct()
      .collect().map(_.getString(0)).toSet
    val missing = preds.map(_._1).filterNot(indexed)
    require(missing.isEmpty,
      s"ZOrder.selectFiles: column(s) ${missing.mkString(", ")} not in the index " +
        s"(indexed: ${indexed.mkString(", ")})")
    // count DISTINCT SATISFIED PREDICATES per file, not matching index
    // rows: two predicates on the SAME column share one (file, zcol) row,
    // and a row-count compare would cap their contribution at 1 —
    // under-admitting every file and returning a wrong (empty) answer
    val hits = preds.zipWithIndex.map { case ((c, lo, hi), i) =>
      sum(when(col("zcol") === c && col("max_v") >= lo && col("min_v") <= hi,
        1).otherwise(0)).as(s"_hit_$i")
    }
    index(spark, dir)
      .filter(col("zcol").isin(preds.map(_._1): _*))
      .groupBy(col("file"))
      .agg(hits.head, hits.tail: _*)
      .filter(preds.indices.map(i => col(s"_hit_$i") >= 1).reduce(_ && _))
      .select("file").collect().map(_.getString(0)).toSeq
  }

  /** Pruned read for the conjunction of range predicates: plan the scan
    * over only the admitted files, then apply the exact predicates
    * (zones over-approximate — the residual filter also rides into
    * parquet's row-group stats). Equals the unpruned filtered read;
    * the index changes the file set, never the answer.
    */
  def read(spark: SparkSession, dir: String,
      preds: Seq[(String, Long, Long)]): DataFrame = {
    val files = selectFiles(spark, dir, preds)
    val exact = preds.map { case (c, lo, hi) => col(c) >= lo && col(c) <= hi }
      .reduce(_ && _)
    if (files.isEmpty) spark.read.parquet(dir).filter(lit(false))
    else spark.read.parquet(files: _*).filter(exact)
  }

  private def dataFiles(spark: SparkSession, dir: String): Seq[String] =
    IndexUtil.dataFiles(spark, dir)
}
