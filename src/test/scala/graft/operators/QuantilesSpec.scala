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
}
