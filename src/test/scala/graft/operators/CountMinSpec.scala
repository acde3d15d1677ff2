package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val depth = 4
  private val width = 64

  test("estimates are one-sided (est >= true) and exact absent collisions") {
    // key k repeated k times, keys 1..40: 820 rows over 64 buckets x 4 rows
    val rows = (1L to 40L).flatMap(k => Seq.fill(k.toInt)(k))
    val df = rows.toDF("k")
    val sketch = Frequency.countMinBuild(df, col("k"), depth, width)
    val keys = (1L to 40L).toDF("k")
    val est = Frequency.countMinQuery(sketch, keys, col("k"), depth, width)
      .as[(Long, Long)].collect().toMap
    (1L to 40L).foreach { k =>
      assert(est(k) >= k, s"key $k: estimate ${est(k)} below true count $k")
    }
    // the min over 4 independent rows of 40 keys in 64 buckets is exact
    // for MOST keys; assert the aggregate witnesses exactness somewhere
    assert((1L to 40L).count(k => est(k) == k) >= 30)
  }

  test("absent keys estimate 0 unless a collision inflates them") {
    val df = Seq(5L, 5L, 9L).toDF("k")
    val sketch = Frequency.countMinBuild(df, col("k"), depth, width)
    val est = Frequency.countMinQuery(sketch, Seq(123456L).toDF("k"),
      col("k"), depth, width).as[(Long, Long)].collect().head._2
    assert(est >= 0L && est <= 3L)
  }

  test("sketches merge by summing cnt on (d, bucket)") {
    val all = (1L to 200L).map(k => k % 17L).toDF("k")
    val a = (1L to 100L).map(k => k % 17L).toDF("k")
    val b = (101L to 200L).map(k => k % 17L).toDF("k")
    val whole = Frequency.countMinBuild(all, col("k"), depth, width)
      .as[(Int, Long, Long)].collect().toSet
    val merged = Frequency.countMinBuild(a, col("k"), depth, width)
      .unionByName(Frequency.countMinBuild(b, col("k"), depth, width))
      .groupBy(col("d"), col("bucket")).agg(sum(col("cnt")).as("cnt"))
      .as[(Int, Long, Long)].collect().toSet
    assert(merged === whole)
  }
}
