package graft

import org.apache.spark.sql.functions._

/** Size-conditional conf pins ([[SparkEntry.confPinsFor]]): the tiny arm
  * and the big arm of each family must flip on MEASURED input rows, not
  * on the fixture a pin was tuned with. The big-arm fixtures are
  * synthesized row counts in a temp dir — the gate reads row counts only,
  * so a single-column table is a faithful stand-in.
  */
class PinsSpec extends SparkSpec {
  import spark.implicits._

  private def synthDir(rows: Long): String = {
    val dir = java.nio.file.Files.createTempDirectory("pins_spec").toString
    // fuzzy_join2 gates on part, fuzzy_join on customer, pagerank on
    // customer, ssjoin_prefix on documents — one synthesized count
    // serves all four probes
    spark.range(rows).select(col("id").as("k")).write
      .parquet(s"$dir/part.parquet")
    spark.range(rows).select(col("id").as("k")).write
      .parquet(s"$dir/customer.parquet")
    spark.range(rows).select(col("id").as("k")).write
      .parquet(s"$dir/documents.parquet")
    dir
  }

  test("pair-join family: preferSortMergeJoin=false only above the tiny class") {
    val small = synthDir(1000L)
    val big = synthDir(100000L)
    assert(!SparkEntry.confPinsFor(spark, "fuzzy_join2", small)
      .contains("spark.sql.join.preferSortMergeJoin"))
    assert(SparkEntry.confPinsFor(spark, "fuzzy_join2", big)
      .get("spark.sql.join.preferSortMergeJoin") === Some("false"))
    assert(SparkEntry.confPinsFor(spark, "fuzzy_join", big)
      .get("spark.sql.join.preferSortMergeJoin") === Some("false"))
    // non-family queries never see the pin, whatever the input size
    assert(!SparkEntry.confPinsFor(spark, "dedup_minhash", big)
      .contains("spark.sql.join.preferSortMergeJoin"))
  }

  test("iterative-graph family: AQE-off pin only below the tiny class") {
    val small = synthDir(1000L)
    val big = synthDir(100000L)
    assert(SparkEntry.confPinsFor(spark, "pagerank", small)
      .get("spark.sql.adaptive.enabled") === Some("false"))
    assert(!SparkEntry.confPinsFor(spark, "pagerank", big)
      .contains("spark.sql.adaptive.enabled"))
  }

  test("ssjoin_prefix: broadcasts pinned off only at/above the big class") {
    // 5k docs (the sf0.1 fixture's size) keeps AQE's default planning;
    // 50k (pseudo-sf1) and up pin broadcasts off, so both ends of the
    // second decade plan shuffle-to-shuffle — the ratio measures the
    // operator, not a planner threshold
    val small = synthDir(5000L)
    val big = synthDir(50000L)
    assert(!SparkEntry.confPinsFor(spark, "ssjoin_prefix", small)
      .contains("spark.sql.autoBroadcastJoinThreshold"))
    assert(SparkEntry.confPinsFor(spark, "ssjoin_prefix", big)
      .get("spark.sql.autoBroadcastJoinThreshold") === Some("-1"))
    // the pin is family-scoped: no other query sees it
    assert(!SparkEntry.confPinsFor(spark, "dedup_minhash", big)
      .contains("spark.sql.autoBroadcastJoinThreshold"))
  }

  test("unreadable input assumes BIG: graph pin off, pair-join pin on") {
    val missing = "/tmp/pins_spec_nonexistent_dir"
    assert(!SparkEntry.confPinsFor(spark, "pagerank", missing)
      .contains("spark.sql.adaptive.enabled"))
    assert(SparkEntry.confPinsFor(spark, "fuzzy_join2", missing)
      .get("spark.sql.join.preferSortMergeJoin") === Some("false"))
  }
}
