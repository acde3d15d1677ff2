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

  /** Key-skew diagnostic: the pre-flight a 100 TB join or aggregation
    * runs on its key before choosing between a plain shuffle, AQE skew
    * handling, and explicit salting ([[graft.operators.Salt]]). One row:
    * total rows, distinct keys, the heaviest key's count, exact count
    * percentiles, and `skew_x1000` = max-count ÷ mean-count ×1000 in
    * integer arithmetic (engine-exact; ≳8000 — the heaviest key 8× the
    * mean — is where one task's partition outweighs its peers enough
    * that salting pays).
    *
    * Scale shape: per-key counts partial-aggregate map-side (keys +
    * longs cross the one real exchange). Percentiles then come from the
    * COUNT-OF-COUNTS frame — one tiny row per distinct count value —
    * via a cumulative sum, never a sort of the per-key frame: the
    * count-distribution percentile at rank ⌈q·n_keys⌉ is the smallest
    * count value whose cumulative key population reaches the rank. The
    * windowed cumsum runs on the counts-of-counts frame (|distinct
    * count values| rows, ≤ a few thousand even at 10¹⁰ keys — bounded
    * by the heaviest count, not the key space).
    */
  def keySkew(df: DataFrame, keys: Seq[String],
      percentiles: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    require(keys.nonEmpty, "keySkew: no key columns")
    require(percentiles.nonEmpty, "keySkew: no percentiles requested")
    require(percentiles.forall(p => p >= 1 && p <= 100), "keySkew: percentiles in 1..100")
    val counts = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("_cnt"))
    val cc = counts.groupBy(col("_cnt")).agg(count(lit(1)).as("_nk"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("_cnt"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val cum = cc.withColumn("_cum", sum(col("_nk")).over(w))
    val totals = cum.agg(
      sum(col("_cnt") * col("_nk")).as("n_rows"),
      sum(col("_nk")).as("n_keys"),
      max(col("_cnt")).as("max_cnt"))
    // percentile at rank ⌈p/100 · n_keys⌉ = smallest count whose
    // cumulative key population reaches the rank; `cum ≥ ⌈p·n_keys/100⌉`
    // over integers ⇔ `cum·100 ≥ p·n_keys` (no float, no rounding mode)
    val pcols = percentiles.map { p =>
      min(when(col("_cum") * 100 >= col("n_keys") * p, col("_cnt"))).as(s"p${p}_cnt")
    }
    cum.crossJoin(broadcast(totals))
      .groupBy(col("n_rows"), col("n_keys"), col("max_cnt"))
      .agg(pcols.head, pcols.tail: _*)
      // DECIMAL(38,0) intermediate: max_cnt·1000·n_keys overflows BIGINT
      // exactly in the regime this diagnostic exists for (10¹⁰ keys with
      // a 10⁶-row heavy key is ~10¹⁹ > 2⁶³) — a wrapped-negative skew
      // ratio would corrupt the salting decision silently
      .withColumn("skew_x1000",
        expr("CAST((CAST(max_cnt AS DECIMAL(38,0)) * 1000 * n_keys) DIV n_rows AS BIGINT)"))
  }
}
