package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Single-pass column profiling: the data-quality screen every large
  * ingest runs before committing a batch (row counts, null rates,
  * cardinalities, ranges). The naive form — one action per column per
  * metric — scans a 100 TB table dozens of times; this computes every
  * metric for every requested column in ONE aggregate pass (all partial
  * aggregates reduce in the same job, nothing shuffles but the
  * per-column partials) and then unpivots the single result row into one
  * row per column.
  */
object Profile {

  /** One row per requested column: total row count, null count, distinct
    * count, and min/max rendered as strings (uniform schema across column
    * types). Exact distincts plan as Spark's multi-distinct Expand — one
    * scan, one job, but an extra distinct-key exchange carrying ~(number
    * of profiled columns) × the row count; `approxDistinct = true` swaps
    * them for HLL sketches, making every metric partial-aggregatable and
    * the single-partition gather the ONLY exchange — the right setting
    * at 100 TB, where the exact expansion is the dominant cost.
    */
  def profile(df: DataFrame, cols: Seq[String],
      approxDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile: no columns requested")
    def distinctOf(c: String): Column =
      if (approxDistinct) approx_count_distinct(col(c))
      else count_distinct(col(c))
    // one flat aggregate: every metric is a partial-aggregatable builtin,
    // so the whole profile is map-side combine + one reduce
    val metrics: Seq[Column] = count(lit(1)).as("_n") +: cols.flatMap { c =>
      Seq(count(col(c)).as(s"_nn_$c"), distinctOf(c).as(s"_nd_$c"),
        min(col(c)).cast("string").as(s"_min_$c"),
        max(col(c)).cast("string").as(s"_max_$c"))
    }
    val row = df.agg(metrics.head, metrics.tail: _*)
    // unpivot the single row via a stack of per-column structs — driver
    // never sees the data, just the one aggregated row's lineage
    val stacked = cols.map { c =>
      struct(lit(c).as("column"), col("_n").as("n_rows"),
        (col("_n") - col(s"_nn_$c")).as("n_null"), col(s"_nd_$c").as("n_distinct"),
        col(s"_min_$c").as("min_value"), col(s"_max_$c").as("max_value"))
    }
    row.select(explode(array(stacked: _*)).as("_p")).select(col("_p.*"))
  }
}
