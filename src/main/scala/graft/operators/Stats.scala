package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Exact statistical primitives over integer evidence — the monitoring /
  * feature-engineering layer of a data pipeline, built so every output is
  * a ratio of exact integers (DECIMAL(38,0) sums) rather than a float:
  * any engine replays the algebra digit-for-digit, which is what makes
  * regression slopes and drift scores differential-testable dataset
  * facts instead of approximately-equal numbers.
  *
  * Scale shape: both operators are single partial-aggregated passes —
  * the exchange carries one row of sums per group (or per category),
  * never data rows.
  */
object Stats {

  /** Per-group ordinary-least-squares line fit over integer (x, y):
    * slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²), returned as the EXACT
    * (numerator, denominator) pair in DECIMAL(38,0) — callers divide
    * when they want the float, compare fractions when they want
    * exactness. One aggregate pass; x, y must be integral columns
    * (cast upstream). Rows with a null x or y are excluded. Groups where
    * the denominator is 0 (fewer than two distinct x) report null/null.
    */
  def groupedLinFit(df: DataFrame, groups: Seq[String], x: Column,
      y: Column): DataFrame = {
    val d38 = DecimalType(38, 0)
    val xd = x.cast(d38)
    val yd = y.cast(d38)
    val valid = xd.isNotNull && yd.isNotNull
    val agg = df.groupBy(groups.map(col): _*)
      .agg(
        sum(when(valid, lit(1L)).otherwise(lit(0L))).cast(d38).as("_n"),
        sum(when(valid, xd)).as("_sx"),
        sum(when(valid, yd)).as("_sy"),
        sum(when(valid, xd * yd)).as("_sxy"),
        sum(when(valid, xd * xd)).as("_sxx"))
    val num = (col("_n") * col("_sxy") - col("_sx") * col("_sy")).cast(d38)
    val den = (col("_n") * col("_sxx") - col("_sx") * col("_sx")).cast(d38)
    agg.select(groups.map(col) ++ Seq(
      col("_n").cast("long").as("n"),
      when(den === 0, lit(null)).otherwise(num).as("slope_num"),
      when(den === 0, lit(null)).otherwise(den).as("slope_den")): _*)
  }

  /** Total-variation distance between two categorical distributions,
    * exactly: for category counts n1/n2 with totals T1/T2,
    * TVD = ½ Σ |n1/T1 − n2/T2| = Σ|n1·T2 − n2·T1| / (2·T1·T2).
    * Output: one row — (tvd_num, tvd_den) in DECIMAL(38,0) plus both
    * totals — the drift monitor a training pipeline runs between
    * yesterday's and today's corpus slices. `side` must be a boolean
    * column (false = baseline, true = current); categories absent from
    * one side count as 0 there. Null categories are first-class (a
    * null-category drift is still drift).
    */
  def tvdDrift(df: DataFrame, category: Column, side: Column): DataFrame = {
    // DECIMAL(38,0) products overflow to null past 38 digits (precision
    // loss mode) — headroom here: every factor is a ROW COUNT, so with
    // both slices at even 10^12 rows (a 100 TB table per side) the
    // largest product n·T is 10^24 and the den T1·T2·2 is ~10^24,
    // fourteen orders under the cap. Revisit only if this is ever fed
    // pre-scaled weights instead of counts.
    val d38 = DecimalType(38, 0)
    val counts = df.groupBy(category.as("_cat"))
      .agg(
        sum(when(!side, 1L).otherwise(0L)).cast(d38).as("_n1"),
        sum(when(side, 1L).otherwise(0L)).cast(d38).as("_n2"))
    val totals = counts.agg(sum(col("_n1")).as("_t1"), sum(col("_n2")).as("_t2"))
    counts.crossJoin(broadcast(totals))
      .agg(
        sum(abs(col("_n1") * col("_t2") - col("_n2") * col("_t1"))).cast(d38)
          .as("tvd_num"),
        (first(col("_t1")) * first(col("_t2")) * 2).cast(d38).as("tvd_den"),
        first(col("_t1")).cast("long").as("n_baseline"),
        first(col("_t2")).cast("long").as("n_current"))
      // a Spark global agg over zero rows yields one all-null row; the
      // relational answer (and the GROUP-BY oracle) is zero rows — drop it
      .filter(col("tvd_den").isNotNull)
  }

  /** Exact ROC-AUC of a score against a 0/1 label via the Mann-Whitney
    * rank statistic with textbook tie handling:
    *   AUC = u2 / (2·n_pos·n_neg),
    *   u2  = Σ_s n_pos(s) · (2·negBelow(s) + n_neg(s))
    * — the ×2 absorbs the ½-credit for score ties, so the statistic is
    * an INTEGER (DECIMAL(38,0) — 10¹² rows per class stay twelve orders
    * under the cap). Returned as the one-row (u2, n_pos, n_neg)
    * evidence frame; callers divide when they want the float.
    *
    * Counts-only at every step: one exchange carries a row per DISTINCT
    * score, the cumulative window runs over that reduced frame (the
    * equidepth discipline — single-task by design, it sees score
    * subtotals, never rows), and the class totals fold into the same
    * final aggregate. Null scores/labels are excluded (score ordering
    * and class membership are both undefined for them).
    */
  def rocAuc(df: DataFrame, score: Column, label: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d38 = DecimalType(38, 0)
    // fail fast on non-integral scores: the whole counts-only design rests
    // on the per-DISTINCT-score reduction collapsing the frame before the
    // single-task cumulative window — a continuous float score makes
    // distinct ≈ rows and silently recreates the global-sort killer at
    // scale. Callers with continuous scores bucket first (fixed-point:
    // (score * 10^k).cast("long")), which also keeps u2 an exact integer.
    locally {
      import org.apache.spark.sql.types._
      val t = df.select(score.as("_s")).schema.head.dataType
      val integral = t match {
        case ByteType | ShortType | IntegerType | LongType => true
        case d: DecimalType => d.scale == 0
        case _ => false
      }
      require(integral,
        s"rocAuc: score must be integral (got ${t.sql}); bucket continuous " +
          "scores to fixed-point first, e.g. (score * 1000000).cast(\"long\")")
    }
    val perScore = df
      .select(score.as("_s"), label.cast("long").as("_l"))
      .filter(col("_s").isNotNull && col("_l").isNotNull)
      .groupBy(col("_s"))
      .agg(sum(col("_l")).as("_n_pos_s"),
        (count(lit(1)) - sum(col("_l"))).as("_n_neg_s"))
    val w = Window.orderBy(col("_s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    perScore
      .withColumn("_neg_below", coalesce(sum(col("_n_neg_s")).over(w), lit(0L)))
      .agg(
        sum(col("_n_pos_s").cast(d38) *
          (col("_neg_below") * 2 + col("_n_neg_s"))).as("u2"),
        sum(col("_n_pos_s")).as("n_pos"),
        sum(col("_n_neg_s")).as("n_neg"))
  }

  /** Per-group EXACT Gini coefficient of a nonnegative integral value,
    * as the num/den pair
    *   gini = ΣᵢΣⱼ|xᵢ−xⱼ| / (2·n·Σx)
    * with the pairwise sum folded into per-distinct-value cumulative
    * algebra (no pair join):
    *   ΣᵢΣⱼ|xᵢ−xⱼ| = 2·Σ_v cnt_v·(x_v·cntBelow_v − sumBelow_v).
    * One exchange keyed by (group, value) carries a row per DISTINCT
    * (group, value); the cumulative window runs per group over that
    * reduced frame. DECIMAL(38,0) holds x·n² for 10¹²-row groups of
    * 10¹²-scale values with room to spare. Groups of one report 0/den
    * (no dispersion), consistent with the definition.
    */
  def giniIndex(df: DataFrame, groups: Seq[String], value: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d38 = DecimalType(38, 0)
    val g = groups.map(col)
    val perValue = df
      .select(g :+ value.cast("long").as("_v"): _*)
      .filter(col("_v").isNotNull)
      .groupBy(g :+ col("_v"): _*)
      .agg(count(lit(1)).as("_cnt"))
    val w = Window.partitionBy(g: _*).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    perValue
      .withColumn("_cnt_below", coalesce(sum(col("_cnt")).over(w), lit(0L)))
      .withColumn("_sum_below",
        coalesce(sum(col("_v") * col("_cnt")).over(w), lit(0L)))
      .groupBy(g: _*)
      .agg(
        (sum(col("_cnt").cast(d38) *
          (col("_v") * col("_cnt_below") - col("_sum_below"))) * 2)
          .as("gini_num"),
        (sum(col("_cnt")).cast(d38) *
          sum(col("_v").cast(d38) * col("_cnt")) * 2).as("gini_den"),
        sum(col("_cnt")).as("n"))
  }
}
