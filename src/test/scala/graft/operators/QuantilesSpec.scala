package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  // group a: values 1..8 -> p25 threshold 2 (cum 2/8 = 1/4); group b:
  // all-equal values -> threshold is that value, everything survives
  private def df = ((1 to 8).map(v => ("a", v)) ++ Seq.fill(5)(("b", 7)))
    .toDF("g", "v")

  test("valueThresholds: smallest value reaching the cumulative ratio") {
    val t = Quantiles.valueThresholds(df, "g", col("v"), 1, 4)
      .as[(String, Int)].collect().toMap
    assert(t === Map("a" -> 2, "b" -> 7))
  }

  test("filterAtLeast: value-level survivors, ties share a fate") {
    val got = Quantiles.filterAtLeast(df, "g", col("v"), 1, 4)
      .select(col("g"), col("v")).as[(String, Int)].collect()
    assert(got.count(_._1 == "a") === 7) // drops only v=1
    assert(got.count(_._1 == "b") === 5) // all-equal group survives whole
    assert(!got.contains(("a", 1)))
  }

  test("q = 1 keeps only the per-group maximum value(s)") {
    val t = Quantiles.valueThresholds(df, "g", col("v"), 1, 1)
      .as[(String, Int)].collect().toMap
    assert(t === Map("a" -> 8, "b" -> 7))
  }

  test("equidepthHistogram: near-equal bins, ties never split, exact counts") {
    // values 1..10, value v appearing v times: 55 rows
    val data = (1 to 10).flatMap(v => Seq.fill(v)(v.toLong)).toDF("x")
    val h = Quantiles.equidepthHistogram(data, col("x"), nBins = 4)
      .orderBy("bin").as[(Long, Long, Long, Long, Long)].collect()
    assert(h.map(_._4).sum === 55L)                        // rows preserved
    assert(h.map(_._5).sum === 10L)                        // each value once
    for (Array(a, b) <- h.sliding(2)) assert(a._3 < b._2)  // contiguous bins
    // boundary spot-check: value 7 has cum=28 → bin ceil(28·4/55) = 3
    val bin3 = h.find(_._1 == 3L).get
    assert(bin3._2 <= 7L && 7L <= bin3._3)
  }

  test("equidepthHistogram: nulls excluded, single value collapses to one bin") {
    val data = Seq[Option[Long]](Some(5L), Some(5L), None, Some(5L)).toDF("x")
    val h = Quantiles.equidepthHistogram(data, col("x"), nBins = 3)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(h.toSeq === Seq((3L, 5L, 5L, 3L, 1L)))
  }

  test("bucketInGroup: per-group quartiles by rank, ties share a bucket") {
    import org.apache.spark.sql.functions.col
    // group a: values 1..8 -> quartiles 1122 3344; group b: all ties -> bin 4
    val df = ((1L to 8L).map(v => ("a", v)) ++ Seq(("b", 5L), ("b", 5L)))
      .toDF("g", "v")
    val out = Quantiles.bucketInGroup(df, "g", col("v"), nBins = 4)
      .as[(String, Long, Int)].collect().toSet
    assert(out === Set(
      ("a", 1L, 1), ("a", 2L, 1), ("a", 3L, 2), ("a", 4L, 2),
      ("a", 5L, 3), ("a", 6L, 3), ("a", 7L, 4), ("a", 8L, 4),
      ("b", 5L, 4)))
  }

  test("bucketInGroup: null values get a null bucket, null groups are first-class") {
    import org.apache.spark.sql.functions.col
    val df = Seq((Some("a"), Some(1L)), (Some("a"), None),
      (None, Some(1L)), (None, Some(2L))).toDF("g", "v")
    val out = Quantiles.bucketInGroup(df, "g", col("v"), nBins = 2)
      .as[(Option[String], Option[Long], Option[Int])].collect().toSet
    assert(out === Set(
      (Some("a"), Some(1L), Some(2)),
      (Some("a"), None, None),
      (None, Some(1L), Some(1)),
      (None, Some(2L), Some(2))))
  }

  test("winsorize: values clip to the group's [p25, p75] thresholds") {
    import org.apache.spark.sql.functions.col
    // group a: 1..8 → lo = smallest v with cum*4 >= n*1 = 2; hi: cum*4 >= n*3 = 6
    val df = (1L to 8L).map(v => ("a", v)).toDF("g", "v")
    val out = Quantiles.winsorize(df, "g", col("v"), "w", 1, 4, 3, 4)
      .as[(String, Long, Long)].collect().map { case (_, v, c) => v -> c }.toMap
    assert(out === Map(1L -> 2L, 2L -> 2L, 3L -> 3L, 4L -> 4L, 5L -> 5L,
      6L -> 6L, 7L -> 6L, 8L -> 6L))
  }

  test("winsorize: groups clip independently; nulls pass through null") {
    import org.apache.spark.sql.functions.col
    val df = Seq(("a", Some(1L)), ("a", Some(10L)), ("a", Some(20L)),
      ("b", Some(100L)), ("b", Some(200L)), ("b", Some(300L)),
      ("b", None)).toDF("g", "v")
    val out = Quantiles.winsorize(df, "g", col("v"), "w", 1, 4, 3, 4)
      .as[(String, Option[Long], Option[Long])].collect().toSet
    // a: n=3 → lo: cum·4 ≥ 3 at v=1; hi: cum·4 ≥ 9 at v=20 (cum(10)=8<9)
    // b: nulls are excluded from the rank algebra and pass through null
    //   (least/greatest would otherwise clip null to the hi bound)
    assert(out.contains(("a", Some(1L), Some(1L))))
    assert(out.contains(("a", Some(20L), Some(20L))))
    assert(out.contains(("b", None, None)))
  }
}
