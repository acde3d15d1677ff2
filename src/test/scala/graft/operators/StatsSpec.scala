package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("groupedLinFit: exact slope fraction on a hand-checked line") {
    // y = 3x + 1 exactly: slope fraction must reduce to 3 (num = 3·den)
    val df = Seq(("a", 1L, 4L), ("a", 2L, 7L), ("a", 3L, 10L), ("a", 4L, 13L))
      .toDF("g", "x", "y")
    val r = Stats.groupedLinFit(df, Seq("g"), col("x"), col("y"))
      .select(col("n"), (col("slope_num") / col("slope_den")).as("slope"))
      .as[(Long, java.math.BigDecimal)].head()
    assert(r._1 === 4L)
    assert(r._2.compareTo(new java.math.BigDecimal(3)) === 0)
  }

  test("groupedLinFit: degenerate x (single distinct value) yields null slope") {
    val df = Seq(("a", 5L, 1L), ("a", 5L, 9L), ("b", 1L, 1L), ("b", 2L, 5L))
      .toDF("g", "x", "y")
    val r = Stats.groupedLinFit(df, Seq("g"), col("x"), col("y"))
      .select(col("g"), col("slope_num").isNull.as("degenerate"))
      .as[(String, Boolean)].collect().toMap
    assert(r("a") === true)
    assert(r("b") === false)
  }

  test("groupedLinFit: null x or y rows are excluded from the fit") {
    val df = Seq(("a", Some(1L), Some(2L)), ("a", Some(2L), Some(4L)),
      ("a", None, Some(99L)), ("a", Some(3L), None)).toDF("g", "x", "y")
    val r = Stats.groupedLinFit(df, Seq("g"), col("x"), col("y"))
      .select(col("n"), (col("slope_num") / col("slope_den")).as("slope"))
      .as[(Long, java.math.BigDecimal)].head()
    assert(r._1 === 2L) // only the two complete rows
    assert(r._2.compareTo(new java.math.BigDecimal(2)) === 0)
  }

  test("tvdDrift: identical mixes give 0; disjoint mixes give 1") {
    val same = Seq(("x", false), ("y", false), ("x", true), ("y", true))
      .toDF("c", "s")
    val s0 = Stats.tvdDrift(same, col("c"), col("s"))
      .select(col("tvd_num").cast("long"), col("tvd_den").cast("long"))
      .as[(Long, Long)].head()
    assert(s0._1 === 0L)
    val disjoint = Seq(("x", false), ("x", false), ("y", true))
      .toDF("c", "s")
    val s1 = Stats.tvdDrift(disjoint, col("c"), col("s"))
      .select(col("tvd_num").cast("long"), col("tvd_den").cast("long"))
      .as[(Long, Long)].head()
    // TVD = 1 exactly: num/den = (|2·1-0| + |0-1·2|)/(2·2·1) = 4/4
    assert(s1._1 === s1._2)
  }

  test("tvdDrift: a half-moved category gives the exact fraction") {
    // baseline: 2x 2y; current: 3x 1y -> TVD = 1/2·(|1/2-3/4| + |1/2-1/4|) = 1/4
    val df = (Seq.fill(2)("x") ++ Seq.fill(2)("y")).map((_, false)) ++
      (Seq.fill(3)("x") ++ Seq.fill(1)("y")).map((_, true))
    val r = Stats.tvdDrift(df.toDF("c", "s"), col("c"), col("s"))
      .select(col("tvd_num").cast("long"), col("tvd_den").cast("long"))
      .as[(Long, Long)].head()
    assert(r._1 * 4 === r._2) // num/den == 1/4
  }

  test("tvdDrift: null categories are first-class drift") {
    val df = Seq((Some("x"), false), (None, true)).toDF("c", "s")
    val r = Stats.tvdDrift(df, col("c"), col("s"))
      .select(col("tvd_num").cast("long"), col("tvd_den").cast("long"))
      .as[(Long, Long)].head()
    assert(r._1 === r._2) // fully disjoint -> TVD 1
  }

  private def auc(rows: Seq[(Long, Long)]): (Long, Long, Long) =
    Stats.rocAuc(rows.toDF("s", "l"), col("s"), col("l"))
      .select(col("u2").cast("long"), col("n_pos"), col("n_neg"))
      .as[(Long, Long, Long)].head()

  private def naiveU2(rows: Seq[(Long, Long)]): Long = {
    val pos = rows.filter(_._2 == 1L).map(_._1)
    val neg = rows.filter(_._2 == 0L).map(_._1)
    // 2·Σ_pairs [pos > neg] + Σ_pairs [pos == neg]
    (for { p <- pos; n <- neg } yield
      if (p > n) 2L else if (p == n) 1L else 0L).sum
  }

  test("rocAuc: perfect separation gives u2 = 2·n_pos·n_neg; reversed gives 0") {
    val perfect = Seq((10L, 1L), (11L, 1L), (1L, 0L), (2L, 0L), (3L, 0L))
    assert(auc(perfect) === ((12L, 2L, 3L))) // 2*2*3
    val reversed = perfect.map { case (s, l) => (s, 1L - l) }
    assert(auc(reversed) === ((0L, 3L, 2L)))
  }

  test("rocAuc: ties earn half credit, matches the naive pair count") {
    val rows = Seq((5L, 1L), (5L, 0L), (5L, 0L), (7L, 1L), (3L, 0L),
      (7L, 0L), (1L, 1L), (9L, 0L))
    val (u2, np, nn) = auc(rows)
    assert(u2 === naiveU2(rows))
    assert((np, nn) === ((3L, 5L)))
  }

  test("giniIndex: hand-computed fraction, uniform gives 0, groups split") {
    // {1,2,2,5}: sum of |xi-xj| over ALL ordered pairs = 24; den = 2*4*10
    val df = Seq(("a", 1L), ("a", 2L), ("a", 2L), ("a", 5L),
      ("b", 7L), ("b", 7L)).toDF("g", "x")
    val got = Stats.giniIndex(df, Seq("g"), col("x"))
      .select(col("g"), col("gini_num").cast("long"),
        col("gini_den").cast("long"), col("n"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === Set(("a", 24L, 80L, 4L), ("b", 0L, 56L, 2L)))
  }

  test("rocAuc: a continuous (non-integral) score fails fast by name") {
    // a double score would make distinct ≈ rows and feed the raw frame to
    // the single-task cumulative window — must be rejected at plan time
    val rows = Seq((0.37, 1L), (0.91, 0L)).toDF("s", "l")
    val e = intercept[IllegalArgumentException] {
      Stats.rocAuc(rows, col("s"), col("l"))
    }
    assert(e.getMessage.contains("rocAuc"))
    assert(e.getMessage.contains("integral"))
    // the documented escape hatch (fixed-point bucket) plans fine
    Stats.rocAuc(rows, (col("s") * 1000000).cast("long"), col("l"))
  }

  test("rocAuc: null scores and labels are excluded") {
    val rows = Seq((Some(5L), Some(1L)), (None, Some(0L)), (Some(2L), None),
      (Some(1L), Some(0L)))
    val r = Stats.rocAuc(rows.toDF("s", "l"), col("s"), col("l"))
      .select(col("u2").cast("long"), col("n_pos"), col("n_neg"))
      .as[(Long, Long, Long)].head()
    assert(r === ((2L, 1L, 1L))) // one pos(5) above one neg(1)
  }
}
