package graft.operators

import graft.SparkSpec

class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  private def merged(rows: (String, Long, Long)*): Set[(String, Long, Long, Long)] =
    Intervals.merge(rows.toSeq.toDF("k", "s", "e"), Seq("k"), "s", "e")
      .as[(String, Long, Long, Long)].collect().toSet

  private def gapSet(rows: (String, Long, Long)*): Set[(String, Long, Long)] =
    Intervals.gaps(rows.toSeq.toDF("k", "s", "e"), Seq("k"), "s", "e")
      .as[(String, Long, Long)].collect().toSet

  test("overlap, touch, and containment all coalesce; disjoint stays apart") {
    // [1,5) overlaps [3,8); [8,10) touches ([s,e) half-open); [4,6) is
    // contained; [20,25) is a separate island.
    val m = merged(("a", 1L, 5L), ("a", 3L, 8L), ("a", 8L, 10L),
      ("a", 4L, 6L), ("a", 20L, 25L))
    assert(m === Set(("a", 1L, 10L, 4L), ("a", 20L, 25L, 1L)))
  }

  test("keys never mix; zero-width intervals merge at their point") {
    val m = merged(("a", 1L, 3L), ("b", 1L, 3L), ("a", 3L, 3L), ("a", 5L, 7L))
    assert(m === Set(("a", 1L, 3L, 2L), ("a", 5L, 7L, 1L), ("b", 1L, 3L, 1L)))
  }

  test("a long interval bridges later short ones (running max, not lag)") {
    // [1,100) then [2,3), [50,60), [99,101): the island end must track the
    // RUNNING max (100 → 101), which a naive lag(e) comparison gets wrong.
    val m = merged(("a", 1L, 100L), ("a", 2L, 3L), ("a", 50L, 60L),
      ("a", 99L, 101L), ("a", 150L, 160L))
    assert(m === Set(("a", 1L, 101L, 4L), ("a", 150L, 160L, 1L)))
  }

  test("minGap stitches near-touching islands") {
    val df = Seq(("a", 1L, 5L), ("a", 8L, 10L), ("a", 30L, 40L)).toDF("k", "s", "e")
    val m = Intervals.merge(df, Seq("k"), "s", "e", minGap = 3L)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(m === Set(("a", 1L, 10L, 2L), ("a", 30L, 40L, 1L)))
  }

  test("gaps are the exact complement between islands, per key") {
    val g = gapSet(("a", 1L, 5L), ("a", 3L, 8L), ("a", 20L, 25L),
      ("a", 40L, 41L), ("b", 0L, 2L))
    assert(g === Set(("a", 8L, 20L), ("a", 25L, 40L)))
  }

  test("duplicate intervals count into n_merged and change nothing else") {
    val m = merged(("a", 1L, 5L), ("a", 1L, 5L), ("a", 1L, 5L))
    assert(m === Set(("a", 1L, 5L, 3L)))
  }

  test("maxConcurrency: sweep-line peak, half-open ends free their slot") {
    val df = Seq(
      // a: [1,5) [2,4) [4,6): -1@4 processes before +1@4 -> peak 2 (not 3)
      ("a", 1L, 5L), ("a", 2L, 4L), ("a", 4L, 6L),
      // b: three fully-nested intervals -> peak 3 first reached at t=3
      ("b", 1L, 10L), ("b", 2L, 9L), ("b", 3L, 8L),
      ("c", 7L, 8L)).toDF("k", "s", "e")
    val got = Intervals.maxConcurrency(df, Seq("k"), "s", "e")
      .as[(String, Long, Long)].collect().toSet
    assert(got === Set(("a", 2L, 2L), ("b", 3L, 3L), ("c", 1L, 7L)))
  }

  test("weighted re-merge of stored islands + delta = full recompute") {
    // the incremental-sessionization identity: islands are maximal, so
    // feeding them back (weight = member count) with new points under the
    // same minGap reproduces the from-scratch result exactly — including
    // a delta point that BRIDGES two stored islands
    import org.apache.spark.sql.functions._
    val gap = 4L // a@6 sits within gap of BOTH [1,2] and [10,11]
    val base = Seq(("a", 1L), ("a", 2L), ("a", 10L), ("a", 11L), ("a", 30L),
      ("b", 5L), ("b", 100L))
    val delta = Seq(("a", 6L), ("b", 101L)) // a@6 bridges [1,2] and [10,11]
    def pts(s: Seq[(String, Long)]) =
      s.toDF("k", "t").select(col("k"), col("t").as("s"), col("t").as("e"))
    val full = Intervals.merge(pts(base ++ delta), Seq("k"), "s", "e", gap)
      .as[(String, Long, Long, Long)].collect().toSet
    val stored = Intervals.merge(pts(base), Seq("k"), "s", "e", gap)
    val incremental = Intervals.merge(
      stored.unionByName(pts(delta).withColumn("n_merged", lit(1L))),
      Seq("k"), "s", "e", gap, weight = Some("n_merged"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(incremental === full)
    assert(incremental.contains(("a", 1L, 11L, 5L))) // bridged island
  }
}
