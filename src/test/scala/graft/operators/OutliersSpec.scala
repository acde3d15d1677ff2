package graft.operators


import org.apache.spark.sql.functions._

import graft.SparkSpec

class OutliersSpec extends SparkSpec {
  import spark.implicits._

  private def flags(k: (Int, Int), rows: (String, Long)*): Set[(String, Long)] =
    Outliers.zscore(rows.toSeq.toDF("g", "v"), Seq("g"), col("v"),
        kNum = k._1, kDen = k._2)
      .filter(col("is_outlier"))
      .select("g", "v").as[(String, Long)].collect().toSet

  test("flags exactly the values beyond k sigma, per group") {
    // group a: nine 10s and one 100 — the 100 is way out; the 10s are not
    // group b: symmetric pair — neither is an outlier at k=2 (z = 1 each)
    val rows = (1 to 9).map(_ => ("a", 10L)) ++ Seq(("a", 100L)) ++
      Seq(("b", 0L), ("b", 10L))
    assert(flags((2, 1), rows: _*) === Set(("a", 100L)))
  }

  test("matches the float z-score away from boundaries") {
    val rows = (1L to 50L).map(v => ("g", v)) :+ (("g", 500L))
    val vals = rows.map(_._2.toDouble)
    val n = vals.size
    val mu = vals.sum / n
    val sigma = math.sqrt(vals.map(v => (v - mu) * (v - mu)).sum / n)
    val expected = rows.filter { case (_, v) =>
      math.abs(v - mu) / sigma > 3.0
    }.toSet
    assert(flags((3, 1), rows: _*) === expected)
  }

  test("constant groups and singletons flag nothing") {
    assert(flags((1, 1), ("a", 5L), ("a", 5L), ("a", 5L), ("b", 7L)) ===
      Set.empty)
  }

  test("null values are excluded from moments and never flagged") {
    val df = ((1 to 9).map(_ => ("a", Some(10L))) ++
      Seq(("a", None), ("a", Some(100L)))).toDF("g", "v")
    val out = Outliers.zscore(df, Seq("g"), col("v"), 2, 1)
    assert(out.filter(col("is_outlier")).select("v").as[Option[Long]]
      .collect().toSet === Set(Some(100L)))
    // _n counts only non-null measurements
    assert(out.select("_n").distinct().as[Long].head() === 10L)
  }

  test("zscore: rows of a NULL group key come back, flagged like any group") {
    val rows = ((1 to 9).map(_ => (Option.empty[String], 10L)) :+
      ((Option.empty[String], 100L))) ++ Seq((Some("b"), 1L), (Some("b"), 2L))
    val df = rows.toDF("g", "v")
    val out = Outliers.zscore(df, Seq("g"), col("v"), 2, 1)
    assert(out.count() === 12L) // nothing silently dropped
    assert(out.filter(col("is_outlier")).select("g", "v")
      .as[(Option[String], Long)].collect().toSet ===
      Set((Option.empty[String], 100L)))
  }

  test("non-integral values fail the job by name") {
    val df = Seq(("a", 1.5), ("a", 2.0)).toDF("g", "v")
    val e = intercept[Exception] {
      Outliers.zscore(df, Seq("g"), col("v"), 2, 1).collect()
    }
    assert(e.getMessage.contains("non-integral"))
  }

  private def madFlags(k: (Int, Int), rows: (String, Long)*): Set[(String, Long)] =
    Outliers.mad(rows.toSeq.toDF("g", "v"), "g", col("v"),
        kNum = k._1, kDen = k._2)
      .filter(col("is_outlier"))
      .select("g", "v").as[(String, Long)].collect().toSet

  // lower-median convention: smallest v with 2*|rows <= v| >= n
  private def lowerMedian(vs: Seq[Long]): Long = {
    val sorted = vs.sorted
    sorted((vs.size - 1) / 2)
  }

  test("mad matches the sequential lower-median replay") {
    val rows = Seq(("a", 1L), ("a", 2L), ("a", 2L), ("a", 3L), ("a", 4L),
      ("a", 100L), ("b", 5L), ("b", 6L), ("b", 7L), ("b", 8L))
    val expected = rows.groupBy(_._1).flatMap { case (g, grp) =>
      val vs = grp.map(_._2)
      val med = lowerMedian(vs)
      val mad = lowerMedian(vs.map(v => math.abs(v - med)))
      grp.filter { case (_, v) => math.abs(v - med) > 2 * mad }
    }.toSet
    assert(madFlags((2, 1), rows: _*) === expected)
    assert(madFlags((2, 1), rows: _*) === Set(("a", 100L)))
  }

  test("mad is robust where the mean is dragged: extreme value still flagged") {
    // the 1e6 drags the mean to ~91k and inflates sigma so its z is only
    // ~sqrt(n-1) bounded; MAD stays 1 and flags it cleanly
    val rows = (1 to 10).map(i => ("a", 10L + (i % 3))) :+ (("a", 1000000L))
    assert(madFlags((3, 1), rows: _*) === Set(("a", 1000000L)))
  }

  test("mad degenerate (MAD = 0): every deviating row flags") {
    val rows = Seq(("a", 5L), ("a", 5L), ("a", 5L), ("a", 5L), ("a", 6L))
    assert(madFlags((3, 1), rows: _*) === Set(("a", 6L)))
  }

  test("mad reports the group's med and mad evidence") {
    val out = Outliers.mad(Seq(("a", 1L), ("a", 3L), ("a", 9L)).toDF("g", "v"),
      "g", col("v"), 2, 1)
    val row = out.select("med", "mad").distinct()
      .as[(Long, Long)].collect().toSet
    // med = 3 (lower median), deviations {2, 0, 6} -> mad = 2
    assert(row === Set((3L, 2L)))
  }

  test("integral doubles are accepted") {
    val df = Seq(("a", 10.0), ("a", 10.0), ("a", 10.0), ("a", 10.0),
      ("a", 10.0), ("a", 10.0), ("a", 10.0), ("a", 10.0), ("a", 10.0),
      ("a", 100.0)).toDF("g", "v")
    val out = Outliers.zscore(df, Seq("g"), col("v"), 2, 1)
      .filter(col("is_outlier")).select("v").as[Double].collect().toSet
    assert(out === Set(100.0))
  }

  test("rollingAnomaly frame: window-old edge included, same-timestamp peers excluded") {
    // user 1: three steady events fill the window, then a spike at t=20;
    // another event AT t=20 must not see the spike (peers excluded), and
    // the event exactly windowUs back (t=10 for window 10 at t=20) counts
    val ev = Seq(
      (1L, 1L, 10L, 5L), (2L, 1L, 12L, 5L), (3L, 1L, 14L, 5L),
      (4L, 1L, 20L, 500L), // spike: prior frame [10,19] = {5,5,5} -> anomaly
      (5L, 1L, 20L, 5L)    // same ts as the spike: frame excludes it
    ).toDF("id", "u", "t", "v")
    val got = Outliers.rollingAnomaly(ev, Seq("u"), col("t"), col("v"),
      windowUs = 10L, kNum = 2, kDen = 1, minPrior = 3)
      .select(col("id"), col("n_prior"), col("is_anomaly"))
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(4L) === ((3L, true)), "spike over a zero-variance prior frame")
    // id 5 shares t=20 with the spike: its frame is the same {5,5,5} —
    // the spike (a peer) is excluded, and 5 is not anomalous vs {5,5,5}
    assert(got(5L) === ((3L, false)))
    // t=14's frame spans [4,13]: includes t=10 (exact window edge) and t=12
    assert(got(3L)._1 === 2L)
  }
}
