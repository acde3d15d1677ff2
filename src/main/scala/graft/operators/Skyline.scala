package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-dimensional skyline (Pareto frontier, minimize both axes): a row
  * survives iff no other row is ≤ on both dimensions and < on at least
  * one (Börzsönyi et al., ICDE 2001 semantics; duplicates of a frontier
  * point all survive — neither strictly dominates the other).
  *
  * Scale shape — the naive forms both die at 100 TB: the NOT-EXISTS
  * self-join is quadratic, and a global sort-with-running-min over ROWS
  * is a single-task window over the whole table. Instead:
  *
  *  1. `groupBy(x).min(y)` — partial-aggregated, counts-only exchange:
  *     one row per DISTINCT x survives (any row above its x-group's min
  *     is dominated by a tie-x row with smaller y).
  *  2. Running strict-min window ordered by x over the DISTINCT-x frame:
  *     (x, ymin) is on the frontier iff ymin < min(ymin) over all
  *     smaller x. The unpartitioned window runs as ONE task — but over
  *     |distinct x| rows, not |rows| (the same bounded-distinct-values
  *     contract as Quantiles.equidepthHistogram); it is the reduction in
  *     step 1 that makes the single task safe, not the window itself.
  *  3. A broadcast-able semi-join back on (x, y) returns the surviving
  *     ORIGINAL rows, ties included.
  *
  * The frontier itself is at most |distinct x| points and in practice
  * far fewer, so the semi-join build side stays broadcast-sized even
  * when the input doesn't.
  */
object Skyline {

  /** Skyline rows of `df` minimizing (`x`, `y`). Both columns must be
    * orderable and null-free (nulls are dropped — a null coordinate has
    * no dominance order).
    */
  def minimize2(df: DataFrame, x: Column, y: Column): DataFrame = {
    val in = df.filter(x.isNotNull && y.isNotNull)
    val perX = in.groupBy(x.as("_x")).agg(min(y).as("_ymin"))
    // strict prefix min over smaller x only: ROWS .. -1 on the distinct-x
    // frame (x is unique here, so "preceding rows" = "strictly smaller x")
    val w = Window.orderBy(col("_x")).rowsBetween(Window.unboundedPreceding, -1)
    val frontier = perX
      .withColumn("_prev", min(col("_ymin")).over(w))
      .filter(col("_prev").isNull || col("_ymin") < col("_prev"))
      .select(col("_x"), col("_ymin"))
    in.join(broadcast(frontier), x === col("_x") && y === col("_ymin"), "left_semi")
  }
}
