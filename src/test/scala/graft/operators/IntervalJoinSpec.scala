package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def iv(rows: (Long, Long, Long, Long)*) =
    rows.toSeq.toDF("k", "id", "s", "e")

  test("overlap semantics: closed endpoints, key-scoped, no duplicates") {
    val l = iv((1L, 1L, 10L, 20L), (1L, 2L, 30L, 40L), (2L, 3L, 10L, 20L))
    val r = iv((1L, 10L, 20L, 25L),  // touches id=1 at endpoint 20
      (1L, 11L, 0L, 9L),             // ends just before id=1
      (1L, 12L, 15L, 35L),           // spans id=1 AND id=2's gap into 30-40
      (2L, 13L, 19L, 19L))           // point interval inside id=3
    val out = RangeJoin.intervalJoin(
        l, r.withColumnRenamed("id", "rid").withColumnRenamed("k", "k"),
        keys = Seq("k"), "s", "e", "s", "e", bucketMicros = 4)
      .select(col("id"), col("rid")).as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 10L), (1L, 12L), (2L, 12L), (3L, 13L)))
  }

  test("pairs spanning many shared buckets appear exactly once") {
    val l = iv((1L, 1L, 0L, 1000L))
    val r = iv((1L, 2L, 0L, 1000L))
    val out = RangeJoin.intervalJoin(l,
      r.withColumnRenamed("id", "rid"), Seq("k"), "s", "e", "s", "e",
      bucketMicros = 8)
    assert(out.count() === 1L)
  }

  test("outer join types are rejected (non-owner copies would null-extend)") {
    val l = iv((1L, 1L, 0L, 10L))
    val r = iv((1L, 2L, 20L, 30L))
    val e = intercept[IllegalArgumentException] {
      RangeJoin.intervalJoin(l, r.withColumnRenamed("id", "rid"),
        Seq("k"), "s", "e", "s", "e", bucketMicros = 8, joinType = "left_outer")
    }
    assert(e.getMessage.contains("only inner"))
  }

  test("inverted interval fails by name, not by explosion") {
    val l = iv((1L, 1L, 50L, 10L))
    val r = iv((1L, 2L, 0L, 100L))
    val e = intercept[Exception] {
      RangeJoin.intervalJoin(l, r.withColumnRenamed("id", "rid"),
        Seq("k"), "s", "e", "s", "e", bucketMicros = 8).count()
    }
    assert(e.getMessage.contains("inverted") ||
      e.getCause != null && e.getCause.getMessage.contains("inverted"))
  }
}
