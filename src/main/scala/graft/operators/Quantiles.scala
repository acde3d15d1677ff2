package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group quantile thresholds WITHOUT a row-level sort: the scale
  * path for "drop the worst q-fraction per group" when one group
  * dominates the corpus (the exact-rank window in `quality_filter_pct`
  * sorts every row of the dominant group in one partition's window —
  * correct, but the sort is the bottleneck at 100 TB).
  *
  * Two passes, counts only: (group, value) frequencies partial-aggregate
  * map-side — the exchange carries one row per DISTINCT value per group,
  * not one per row — then a window over that (small) frequency frame
  * finds each group's threshold, and the thresholds broadcast back into
  * a map-side filter join. Value-level semantics: the threshold is the
  * smallest value whose cumulative frequency reaches `q`, and EVERY row
  * at or above it survives (ties share a fate — there is no doc-id rank
  * inside equal values, which is what makes the filter expressible
  * without sorting rows).
  */
object Quantiles {

  /** One row per group: the smallest `value` v with
    * |rows ≤ v| ≥ q · |group|. `q` is a ratio given as (num, den) so the
    * comparison stays in exact integer arithmetic (cumCount · den ≥
    * n · num) — no float quantile boundary ambiguity between engines.
    */
  def valueThresholds(df: DataFrame, group: String, value: Column,
      qNum: Int, qDen: Int): DataFrame = {
    require(qNum > 0 && qDen > 0 && qNum <= qDen, s"q must be in (0,1]: $qNum/$qDen")
    val counts = df.groupBy(col(group), value.as("_v"))
      .agg(count(lit(1)).as("_c"))
    val w = Window.partitionBy(col(group)).orderBy(col("_v"))
    val cum = counts
      .withColumn("_cle", sum(col("_c")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("_n", sum(col("_c")).over(Window.partitionBy(col(group))))
    cum.filter(col("_cle") * qDen >= col("_n") * qNum)
      .groupBy(col(group)).agg(min(col("_v")).as("_threshold"))
  }

  /** Rows whose `value` is at least their group's q-quantile threshold
    * — the "keep everything above the worst q-fraction" filter. The
    * threshold frame is group-cardinality-sized, so Spark broadcasts it
    * and the filter runs map-side on the corpus scan.
    */
  def filterAtLeast(df: DataFrame, group: String, value: Column,
      qNum: Int, qDen: Int): DataFrame = {
    val thr = valueThresholds(df, group, value, qNum, qDen)
      .withColumnRenamed(group, "_graft_g")
    // NULL-SAFE join key: valueThresholds computes a threshold row for a
    // null group (docs with failed language detection etc.), and a plain
    // equi-join would silently drop every null-group row — neither kept
    // nor reported
    df.withColumn("_v", value)
      .join(broadcast(thr), col(group) <=> col("_graft_g"))
      .filter(col("_v") >= col("_threshold"))
      .drop("_v", "_threshold", "_graft_g")
  }

  /** Winsorize: clip `value` into its group's [qLo, qHi] quantile range
    * — the outlier-robust normalization a feature pipeline applies before
    * aggregating heavy-tailed metrics. Thresholds use the same exact
    * integer rank rule as [[valueThresholds]] (smallest v with
    * cum·den ≥ n·num), both bounds derived from ONE counts-only pass
    * (the exchange carries a row per distinct value per group, never per
    * row), broadcast back into a map-side clip. Output: the input plus
    * `outCol` = clamp(value, lo, hi). Null values pass through null.
    */
  def winsorize(df: DataFrame, group: String, value: Column, outCol: String,
      loNum: Int, loDen: Int, hiNum: Int, hiDen: Int): DataFrame = {
    require(loNum > 0 && loDen > 0 && loNum <= loDen, s"qLo in (0,1]: $loNum/$loDen")
    require(hiNum > 0 && hiDen > 0 && hiNum <= hiDen, s"qHi in (0,1]: $hiNum/$hiDen")
    require(loNum.toLong * hiDen <= hiNum.toLong * loDen,
      s"winsorize: qLo must be <= qHi ($loNum/$loDen > $hiNum/$hiDen)")
    // null values are excluded from the rank algebra (they have no order
    // position) and pass through unclipped below
    val counts = df.select(col(group), value.as("_v"))
      .filter(col("_v").isNotNull)
      .groupBy(col(group), col("_v"))
      .agg(count(lit(1)).as("_c"))
    val w = Window.partitionBy(col(group)).orderBy(col("_v"))
    val cum = counts
      .withColumn("_cle", sum(col("_c")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("_n", sum(col("_c")).over(Window.partitionBy(col(group))))
    val thr = cum.groupBy(col(group)).agg(
      min(when(col("_cle") * loDen >= col("_n") * loNum, col("_v"))).as("_lo"),
      min(when(col("_cle") * hiDen >= col("_n") * hiNum, col("_v"))).as("_hi"))
      .withColumnRenamed(group, "_graft_g")
    // least/greatest SKIP nulls (a null value would silently clip to the
    // hi bound) — the null guard keeps null in → null out
    df.withColumn("_graft_v", value)
      .join(broadcast(thr), col(group) <=> col("_graft_g"), "left")
      .withColumn(outCol,
        when(col("_graft_v").isNull, lit(null))
          .otherwise(greatest(least(col("_graft_v"), col("_hi")), col("_lo"))))
      .drop("_graft_v", "_graft_g", "_lo", "_hi")
  }

  /** Exact equi-depth histogram: `nBins` buckets of (as close as ties
    * allow) equal row counts, computed counts-only — the exchange and
    * the (single-partition) cumulative window carry one row per DISTINCT
    * value, never one per row. A distinct value v lands in bin
    * ⌈cum(v)·nBins / n⌉ (cum(v) = rows with value ≤ v), so ties never
    * split across bins and the assignment is pure integer arithmetic —
    * any engine reproduces it digit-for-digit, unlike float quantile
    * boundaries. Output: one row per non-empty bin — (bin, lo, hi,
    * n_rows, n_distinct). Null values are excluded (they have no rank).
    */
  def equidepthHistogram(df: DataFrame, value: Column, nBins: Int): DataFrame = {
    require(nBins > 0, s"equidepthHistogram: nBins must be positive (got $nBins)")
    val counts = df.select(value.as("_v")).filter(col("_v").isNotNull)
      .groupBy(col("_v")).agg(count(lit(1)).as("_c"))
    val w = Window.orderBy(col("_v"))
    val cum = counts
      .withColumn("_cle", sum(col("_c")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("_n", sum(col("_c")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    // ceil division in EXACT integer arithmetic: bin = (cle·nBins−1)
    // div n + 1 — SQL's integral `div`, never a double `/` (exactness
    // would silently end at 2^53, and a float x.9999 could round across
    // a bin boundary); both operands are non-negative so div = floor
    cum.withColumn("bin",
        expr(s"(_cle * $nBins - 1) div _n") + 1)
      .groupBy(col("bin"))
      .agg(min(col("_v")).as("lo"), max(col("_v")).as("hi"),
        sum(col("_c")).as("n_rows"), count(lit(1)).as("n_distinct"))
  }

  /** Per-GROUP equi-depth bucket assignment — the feature-engineering
    * form of [[equidepthHistogram]]: every row gets its value's quantile
    * bucket WITHIN its group (bin = ⌈cum(v)·nBins / n⌉ over the group's
    * rank distribution), so "is this document long for its language" is
    * a column, not a join the caller writes. Ties land in one bin, the
    * arithmetic is integral, the assignment is engine-exact.
    *
    * Scale shape: per-(group, value) counts partial-aggregate before one
    * counts-only exchange; the cumulative window partitions by group
    * (parallel across groups, one row per distinct value inside each);
    * the assignment frame (distinct values only) broadcasts back into a
    * null-safe map-side join — rows never shuffle. Null values get a
    * null bucket; null groups are first-class (same contract as
    * [[filterAtLeast]]).
    */
  def bucketInGroup(df: DataFrame, group: String, value: Column,
      nBins: Int, as: String = "bucket"): DataFrame = {
    require(nBins > 0, s"bucketInGroup: nBins must be positive (got $nBins)")
    val counts = df.select(col(group).as("_graft_g"), value.as("_v"))
      .filter(col("_v").isNotNull)
      .groupBy(col("_graft_g"), col("_v")).agg(count(lit(1)).as("_c"))
    val w = Window.partitionBy(col("_graft_g")).orderBy(col("_v"))
    val bins = counts
      .withColumn("_cle", sum(col("_c")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("_n", sum(col("_c")).over(Window.partitionBy(col("_graft_g"))))
      .select(col("_graft_g"), col("_v"),
        (expr(s"(_cle * $nBins - 1) div _n") + 1).cast("int").as(as))
    df.withColumn("_jv", value)
      .join(broadcast(bins),
        col(group) <=> col("_graft_g") && col("_jv") <=> col("_v"), "left")
      .drop("_graft_g", "_v", "_jv")
  }
}
