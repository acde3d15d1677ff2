package graft.operators

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Profile.keySkew]]: the percentile algebra is integer-exact and the
  * physical plan never sorts the per-key frame (the percentiles come from
  * the counts-of-counts cumsum, whose window input is one row per
  * DISTINCT count value).
  */
class KeySkewSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  test("keySkew: exact percentiles and integer skew ratio on a hand fixture") {
    import spark.implicits._
    // counts per key: 1,2,3,4,90 → n_rows=100, n_keys=5
    val rows = Seq.tabulate(1)(_ => 1L) ++ Seq.fill(2)(2L) ++ Seq.fill(3)(3L) ++
      Seq.fill(4)(4L) ++ Seq.fill(90)(10L)
    val df = rows.toDF("k")
    val out = Profile.keySkew(df, Seq("k")).collect().head
    assert(out.getAs[Long]("n_rows") === 100L)
    assert(out.getAs[Long]("n_keys") === 5L)
    assert(out.getAs[Long]("max_cnt") === 90L)
    // rank ⌈0.5·5⌉=3 → third-smallest count = 3; p90/p99 rank 5 → 90
    assert(out.getAs[Long]("p50_cnt") === 3L)
    assert(out.getAs[Long]("p90_cnt") === 90L)
    assert(out.getAs[Long]("p99_cnt") === 90L)
    // 90·1000·5 div 100
    assert(out.getAs[Long]("skew_x1000") === 4500L)
  }

  test("keySkew: uniform keys report ratio ~1000 and flat percentiles") {
    import spark.implicits._
    val df = (0L until 400L).map(i => i % 100).toDF("k") // 100 keys × 4
    val out = Profile.keySkew(df, Seq("k")).collect().head
    assert(out.getAs[Long]("max_cnt") === 4L)
    assert(out.getAs[Long]("p50_cnt") === 4L)
    assert(out.getAs[Long]("p99_cnt") === 4L)
    assert(out.getAs[Long]("skew_x1000") === 1000L)
  }

  test("keySkew: the exchanged frames are counts, never a sort of per-key rows") {
    import spark.implicits._
    val df = (0L until 1000L).map(i => i % 37).toDF("k")
    val q = Profile.keySkew(df, Seq("k"))
    q.count()
    val plan = q.queryExecution.executedPlan
    // the only SortExec inputs allowed are the counts-of-counts window
    // (one row per distinct count value) — assert no sort consumes the
    // per-key frame by checking every sort sits above the second agg
    val sorts = collect(plan) { case s: org.apache.spark.sql.execution.SortExec => s }
    sorts.foreach { s =>
      val aggsBelow = collect(s.child) {
        case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
        case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => a
        case a: org.apache.spark.sql.execution.aggregate.SortAggregateExec => a
      }
      assert(aggsBelow.size >= 2,
        s"sort consumes a frame wider than counts-of-counts:\n$s")
    }
  }
}
