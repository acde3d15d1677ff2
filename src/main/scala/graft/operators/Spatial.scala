package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spatial join on integer coordinates via grid-cell blocking — the
  * spatial analog of the LSH band-bucket pattern used across the dedup
  * family: candidates come only from key-equality collisions, never from
  * an all-pairs comparison.
  *
  * Scale shape: the right side keys each point to its single grid cell;
  * the left side expands to its 3×3 cell stencil (a 9× row fan-out of
  * (cell, id, x, y) tuples — geometry only, payloads never widen), and
  * the match is ONE equi-join on the cell id followed by the exact
  * distance filter. With cell width = r, a qualifying pair's cells
  * differ by at most 1 per axis, so every pair collides in EXACTLY one
  * cell — the right point's own — and the join is duplicate-free with no
  * distinct pass. Skewed cells (a hot spot of points) are ordinary
  * equi-join skew: AQE skew-split or [[Skew]] salting applies unchanged.
  */
object Spatial {

  /** Floor division as integer SQL arithmetic over a NAMED long column:
    * `(c - pmod(c, d)) div d` is exact (the numerator is divisible by
    * construction, `div` is Spark's IntegralDivide) and rounds toward
    * -infinity for negative coordinates — a bare `c div d` truncates
    * toward zero and would shift negative points into the wrong cell.
    */
  private def floorDivSql(name: String, d: Long): String =
    s"(($name - pmod($name, $d)) div $d)"

  /** All (left, right) pairs within Chebyshev distance `r`
    * (max(|dx|, |dy|) ≤ r) on integral coordinate columns. Output:
    * every `left` column, every `right` column, plus `cheb_dist`.
    * Column names must not collide across the two sides.
    */
  def chebyshevJoin(left: DataFrame, leftX: Column, leftY: Column,
      right: DataFrame, rightX: Column, rightY: Column, r: Long): DataFrame = {
    require(r >= 1, s"radius must be >= 1 (got $r)")
    val offsets = array((for { dx <- -1 to 1; dy <- -1 to 1 } yield
      struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))): _*)
    val l = left
      .withColumn("_lx", leftX.cast("long"))
      .withColumn("_ly", leftY.cast("long"))
      .withColumn("_o", explode(offsets))
      .withColumn("_cx", expr(floorDivSql("_lx", r)) + col("_o.dx"))
      .withColumn("_cy", expr(floorDivSql("_ly", r)) + col("_o.dy"))
      .drop("_o")
    val rt = right
      .withColumn("_rx", rightX.cast("long"))
      .withColumn("_ry", rightY.cast("long"))
      .withColumn("_cx", expr(floorDivSql("_rx", r)))
      .withColumn("_cy", expr(floorDivSql("_ry", r)))
    l.join(rt, Seq("_cx", "_cy"))
      .where(abs(col("_lx") - col("_rx")) <= r &&
        abs(col("_ly") - col("_ry")) <= r)
      .withColumn("cheb_dist",
        greatest(abs(col("_lx") - col("_rx")), abs(col("_ly") - col("_ry"))))
      .drop("_cx", "_cy", "_lx", "_ly", "_rx", "_ry")
  }
}
