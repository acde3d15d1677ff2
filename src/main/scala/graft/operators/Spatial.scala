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
    * The BIGINT subtraction dips below Long.MinValue for coordinates
    * within d of it (an ANSI job kill on a legal coordinate; silent cell
    * corruption with ANSI off), so THAT sliver — and only it — takes a
    * DECIMAL detour; everything else stays on codegen'd long arithmetic
    * (the all-decimal form cost the spatial join ~4x).
    */
  private def floorDivSql(name: String, d: Long): String = {
    val decimalForm =
      s"((cast($name as decimal(21,0)) - pmod(cast($name as decimal(21,0)), $d)) div $d)"
    s"(CASE WHEN $name >= ${Long.MinValue + d} THEN (($name - pmod($name, $d)) div $d) " +
      s"ELSE $decimalForm END)"
  }

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
    // a stencil cell beyond the Long range end does not exist: `cell + 1`
    // at the extreme cell would overflow (ANSI job kill on a legal
    // coordinate; wrap-around with ANSI off probes the OPPOSITE end's
    // cell — false candidates). DROP that stencil copy instead: any
    // clamped cell would equal a neighboring offset's cell, so the drop
    // loses no candidate and the join stays duplicate-free with no
    // array_distinct pass on the hot path.
    def cellPlus(c: Column, d: Column): Column =
      when(d === 1L && c === Long.MaxValue, lit(null))
        .when(d === -1L && c === Long.MinValue, lit(null))
        .otherwise(c + d)
    val l = left
      .withColumn("_lx", leftX.cast("long"))
      .withColumn("_ly", leftY.cast("long"))
      .withColumn("_c0x", expr(floorDivSql("_lx", r)))
      .withColumn("_c0y", expr(floorDivSql("_ly", r)))
      .withColumn("_o", explode(offsets))
      .withColumn("_cx", cellPlus(col("_c0x"), col("_o.dx")))
      .withColumn("_cy", cellPlus(col("_c0y"), col("_o.dy")))
      .where(col("_cx").isNotNull && col("_cy").isNotNull)
      .drop("_o", "_c0x", "_c0y")
    val rt = right
      .withColumn("_rx", rightX.cast("long"))
      .withColumn("_ry", rightY.cast("long"))
      .withColumn("_cx", expr(floorDivSql("_rx", r)))
      .withColumn("_cy", expr(floorDivSql("_ry", r)))
    // residual distance: dropped (never wrapped) stencil cells mean every
    // candidate pair sits in same-or-adjacent cells, so |lx − rx| < 2r —
    // for r ≤ Long.MaxValue/4 the BIGINT subtraction provably cannot
    // overflow and the residual stays codegen'd long arithmetic; only an
    // astronomically wide radius pays the DECIMAL form (compile-time
    // choice, zero per-row cost)
    def adist(a: String, b: String) =
      if (r <= Long.MaxValue / 4) abs(col(a) - col(b))
      else abs(col(a).cast("decimal(21,0)") - col(b).cast("decimal(21,0)"))
    l.join(rt, Seq("_cx", "_cy"))
      .where(adist("_lx", "_rx") <= r && adist("_ly", "_ry") <= r)
      .withColumn("cheb_dist",
        greatest(adist("_lx", "_rx"), adist("_ly", "_ry")).cast("long"))
      .drop("_cx", "_cy", "_lx", "_ly", "_rx", "_ry")
  }
}
