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
}
