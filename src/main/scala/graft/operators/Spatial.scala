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
    * construction, `div` lands back in BIGINT) and rounds toward
    * -infinity for negative coordinates — a bare `c div d` truncates
    * toward zero and would shift negative points into the wrong cell.
    * The subtraction runs in DECIMAL: in BIGINT, `c - pmod(c, d)` dips
    * below Long.MinValue for coordinates within d of it (an ANSI job
    * kill on a legal coordinate; silent cell corruption with ANSI off).
    */
  private def floorDivSql(name: String, d: Long): String =
    s"((cast($name as decimal(21,0)) - pmod(cast($name as decimal(21,0)), $d)) div $d)"

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
    // stencil cells SATURATE at the Long range ends: the cell of
    // x = Long.MaxValue at r = 1 is Long.MaxValue, and +1 would overflow
    // (an ANSI job kill on a legal coordinate; wrap-around under ANSI-off
    // would probe the OPPOSITE end's cell). No cell beyond the range end
    // exists, so clamping loses nothing; array_distinct collapses the
    // duplicate the clamp creates, keeping the join duplicate-free.
    def sat(c: Column, d: Column): Column =
      when(d === 1 && c === Long.MaxValue, Long.MaxValue)
        .when(d === -1 && c === Long.MinValue, Long.MinValue)
        .otherwise(c + d)
    val l = left
      .withColumn("_lx", leftX.cast("long"))
      .withColumn("_ly", leftY.cast("long"))
      .withColumn("_c0x", expr(floorDivSql("_lx", r)))
      .withColumn("_c0y", expr(floorDivSql("_ly", r)))
      .withColumn("_c", explode(array_distinct(transform(offsets, o =>
        struct(sat(col("_c0x"), o.getField("dx")).as("cx"),
          sat(col("_c0y"), o.getField("dy")).as("cy"))))))
      .withColumn("_cx", col("_c.cx"))
      .withColumn("_cy", col("_c.cy"))
      .drop("_c", "_c0x", "_c0y")
    val rt = right
      .withColumn("_rx", rightX.cast("long"))
      .withColumn("_ry", rightY.cast("long"))
      .withColumn("_cx", expr(floorDivSql("_rx", r)))
      .withColumn("_cy", expr(floorDivSql("_ry", r)))
    // residual distance in DECIMAL: coordinates within r of the Long
    // range ends wrap both the stencil cell (Max's cell + 1 → Min's
    // cell — candidates only GAIN, the exact residual prunes them) and
    // the BIGINT |lx − rx| (Max − Min wraps to −1 → abs 1 ≤ r, a FALSE
    // match the residual must decide exactly)
    val d21 = "decimal(21,0)"
    def adist(a: String, b: String) =
      abs(col(a).cast(d21) - col(b).cast(d21))
    l.join(rt, Seq("_cx", "_cy"))
      .where(adist("_lx", "_rx") <= r && adist("_ly", "_ry") <= r)
      .withColumn("cheb_dist",
        greatest(adist("_lx", "_rx"), adist("_ly", "_ry")).cast("long"))
      .drop("_cx", "_cy", "_lx", "_ly", "_rx", "_ry")
  }
}
