package graft.plans

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Parquet aggregate pushdown: with the DSv2 read path and
  * `aggregatePushdown` on, a global COUNT/MIN/MAX must reach the scan as
  * PushedAggregation — answered from row-group statistics, no data pages
  * read. The 100 TB table-stats query at metadata cost.
  */
class MetadataAggSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  test("count/min/max push into the parquet scan as PushedAggregation") {
    val pins = Map(
      "spark.sql.parquet.aggregatePushdown" -> "true",
      "spark.sql.sources.useV1SourceList" -> "")
    val saved = pins.keys.map(k => k -> spark.conf.getOption(k)).toMap
    pins.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val q = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .agg(count(lit(1)).as("n"), min(col("l_orderkey")).as("min_key"),
          max(col("l_orderkey")).as("max_key"))
      q.count()
      val plan = q.queryExecution.executedPlan
      val scans = collect(plan) {
        case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => s
      }
      assert(scans.nonEmpty, plan.toString)
      assert(scans.head.toString.contains("PushedAggregation"),
        s"aggregation not pushed to the scan:\n${scans.head}")
      // the pushed answer must equal the data-path answer
      val pushed = q.collect().head
      pins.keys.foreach(spark.conf.unset)
      val plain = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .agg(count(lit(1)), min(col("l_orderkey")), max(col("l_orderkey")))
        .collect().head
      assert(pushed === plain)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
