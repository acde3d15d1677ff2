package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  // key a: buckets 0 and 20 occupied (gap at 10), key b: single bucket
  private def events = Seq(
    ("a", 1L, 1.0), ("a", 4L, 2.0),   // bucket 0
    ("a", 23L, 7.0),                  // bucket 20
    ("b", 15L, 4.0))                  // bucket 10
    .toDF("k", "us", "v")

  private def run(maxBuckets: Long = 1L << 21) =
    Resample.resampleFill(events, keys = Seq("k"), tsUs = col("us"),
      intervalUs = 10L,
      aggs = Seq(count(lit(1)).as("n"), max(col("v")).as("v")),
      fillCols = Seq("v"), gapDefaults = Map("n" -> lit(0L)),
      maxBucketsPerKey = maxBuckets)

  test("densifies the grid, zero-fills counts, forward-fills values") {
    val got = run().select(col("k"), col("bucket_us"), col("n"), col("v"))
      .as[(String, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(got === Array(
      ("a", 0L, 2L, 2.0),    // two events, max 2.0
      ("a", 10L, 0L, 2.0),   // gap: count 0, value carried forward
      ("a", 20L, 1L, 7.0),
      ("b", 10L, 1L, 4.0)))
  }

  test("event count is preserved across densification") {
    assert(run().agg(sum(col("n"))).as[Long].head() === events.count())
  }

  test("null timestamp fails the job instead of dropping the event") {
    val bad = Seq(("a", Some(1L), 1.0), ("a", None, 2.0)).toDF("k", "us", "v")
    val e = intercept[Exception] {
      Resample.resampleFill(bad, Seq("k"), col("us"), 10L,
        aggs = Seq(count(lit(1)).as("n"))).collect()
    }
    assert(e.getMessage.contains("null timestamp") || e.getCause != null)
  }

  test("a key spanning more than maxBucketsPerKey fails the job by name") {
    val e = intercept[Exception] { run(maxBuckets = 2).collect() }
    assert(e.getMessage.contains("spans more than") || e.getCause != null)
  }

  test("negative timestamps bucket by floor, not truncation toward zero") {
    val neg = Seq(("a", -5L, 1.0), ("a", 4L, 2.0)).toDF("k", "us", "v")
    val got = Resample.resampleFill(neg, Seq("k"), col("us"), 10L,
      aggs = Seq(count(lit(1)).as("n")), gapDefaults = Map("n" -> lit(0L)))
      .select(col("bucket_us"), col("n")).as[(Long, Long)].collect().sortBy(_._1)
    assert(got === Array((-10L, 1L), (0L, 1L)))
  }
}
