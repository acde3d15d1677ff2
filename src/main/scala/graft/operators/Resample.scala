package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-interval time-series resampling with gap densification and
  * forward-fill — turn an irregular event stream into one row per
  * (key, interval) including the silent intervals, the shape every
  * downstream window model / rate monitor / feature pipeline wants.
  * Companion to [[Sessionize]] (gap-defined grouping) and
  * [[graft.operators.AsOf]] (per-probe carry-forward); this is the
  * carry-forward over a DENSE self-generated grid.
  *
  * Scale shape: the aggregate payload crosses ONE exchange — the
  * per-(key, bucket) partial-aggregated groupBy. Computing each key's
  * span costs a second pass over the input, but a cheap one: the scan is
  * column-pruned to (keys, ts) and map-side reduced to two longs per key
  * before its exchange, so at scale the payload exchange dominates and
  * the span pass is a two-column read shuffling ~|keys| rows. Everything
  * downstream (grid join, fill window) operates on the bucketed frame
  * (one row per bucket, ≪ the event count, bounded per key by the
  * guard).
  * The dense grid is generated per key with `sequence` (never a driver
  * loop, never a cross join against a calendar table), bounded by
  * `maxBucketsPerKey`: a key whose span/interval exceeds it fails the
  * job naming the key, because a sleeper key spanning years at
  * millisecond resolution would otherwise materialize a multi-GB array
  * in one task — the guard is the operator's contract, not a sampling
  * shortcut. Buckets are computed in integer microseconds (`pmod`
  * floor), never float seconds.
  */
object Resample {

  /** One row per (key, interval bucket) from the first to the last
    * occupied bucket of each key. `aggs` (must be aliased) aggregate the
    * rows landing in a bucket; gap buckets get nulls, then each column in
    * `fillCols` is forward-filled from the key's last occupied bucket and
    * each `gapDefaults` entry replaces remaining nulls (e.g. a count
    * column defaults to 0). Output: `keys`, `bucket_us` (bucket start,
    * epoch µs), one column per aggregate. A null timestamp fails the job
    * (silently dropping unplaceable events would corrupt every rate
    * downstream — pre-filter if that is the intent).
    */
  def resampleFill(df: DataFrame, keys: Seq[String], tsUs: Column,
      intervalUs: Long, aggs: Seq[Column], fillCols: Seq[String] = Nil,
      gapDefaults: Map[String, Column] = Map.empty,
      maxBucketsPerKey: Long = 1L << 21): DataFrame = {
    require(intervalUs > 0, s"resampleFill: intervalUs must be positive (got $intervalUs)")
    require(aggs.nonEmpty, "resampleFill: no aggregates")
    require(maxBucketsPerKey > 0 && maxBucketsPerKey - 1 <= Long.MaxValue / intervalUs,
      "resampleFill: maxBucketsPerKey * intervalUs overflows")
    val checkedTs = when(tsUs.isNull,
      raise_error(lit("resampleFill: null timestamp")).cast("long"))
      .otherwise(tsUs.cast("long"))
    val bucket = checkedTs - pmod(checkedTs, lit(intervalUs))
    val perBucket = df
      .withColumn("_bucket_us", bucket)
      .groupBy(keys.map(col) :+ col("_bucket_us"): _*)
      .agg(aggs.head, aggs.tail: _*)
    val aggNames = perBucket.columns.filterNot((keys :+ "_bucket_us").contains).toSeq
    val unknown = (fillCols ++ gapDefaults.keys).filterNot(aggNames.contains)
    require(unknown.isEmpty,
      s"resampleFill: fill/default columns ${unknown.mkString(", ")} not among " +
        s"aggregate outputs ${aggNames.mkString(", ")}")
    // per-key span; the guard lives INSIDE the sequence bound so column
    // pruning can never optimize it away
    val guardedEnd = when(
      col("_b1") - col("_b0") > lit((maxBucketsPerKey - 1) * intervalUs),
      raise_error(concat(
        lit("resampleFill: key ("),
        concat_ws(",", keys.map(k => col(k).cast("string")): _*),
        lit(s") spans more than $maxBucketsPerKey buckets"))).cast("long"))
      .otherwise(col("_b1"))
    val grid = perBucket
      .groupBy(keys.map(col): _*)
      .agg(min(col("_bucket_us")).as("_b0"), max(col("_bucket_us")).as("_b1"))
      .select(keys.map(col) :+
        explode(sequence(col("_b0"), guardedEnd, lit(intervalUs))).as("_bucket_us"): _*)
    val joined = grid.join(perBucket, keys :+ "_bucket_us", "left")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("_bucket_us"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = aggNames.foldLeft(joined) { (d, c) =>
      if (fillCols.contains(c)) d.withColumn(c, last(col(c), ignoreNulls = true).over(w))
      else gapDefaults.get(c).fold(d)(dflt => d.withColumn(c, coalesce(col(c), dflt)))
    }
    filled.withColumnRenamed("_bucket_us", "bucket_us")
  }
}
