package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RepairSpec extends SparkSpec {
  import spark.implicits._

  private def tbl(rows: (Long, String)*) = rows.toSeq.toDF("k", "v")

  test("diff surfaces updates as L/R pairs, deletes as L, inserts as R") {
    val l = tbl((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
    val r = tbl((1L, "a"), (2L, "B"), (4L, "d"), (5L, "e"))
    val out = Repair.diff(l, r, keys = Seq("k"), compare = Seq("v"))
      .as[(String, Long, String)].collect().toSet
    assert(out === Set(
      ("L", 2L, "b"), ("R", 2L, "B"),   // update
      ("L", 3L, "c"),                    // delete
      ("R", 5L, "e")))                   // insert
  }

  test("identical replicas diff to empty, even with few buckets") {
    val l = tbl((1L to 50L).map(i => (i, s"v$i")): _*)
    assert(Repair.diff(l, l, Seq("k"), Seq("v"), nBuckets = 4).count() === 0L)
  }

  test("identical rows with NULL values never diff (null-safe compare)") {
    // k=1 has a null v on BOTH sides; k=2 genuinely differs, dirtying a
    // bucket — with nBuckets=1 the null row shares the dirty bucket and
    // must still compare equal (a null-unsafe join would emit it L and R)
    val l = Seq((1L, Option.empty[String]), (2L, Some("x"))).toDF("k", "v")
    val r = Seq((1L, Option.empty[String]), (2L, Some("y"))).toDF("k", "v")
    val out = Repair.diff(l, r, Seq("k"), Seq("v"), nBuckets = 1)
      .as[(String, Long, Option[String])].collect().toSet
    assert(out === Set(("L", 2L, Some("x")), ("R", 2L, Some("y"))))
  }

  test("duplicate-count drift of an identical tuple surfaces on the heavier side") {
    val l = tbl((1L, "a"), (1L, "a"), (2L, "b"))
    val r = tbl((1L, "a"), (2L, "b"), (2L, "b"))
    val out = Repair.diff(l, r, Seq("k"), Seq("v"), nBuckets = 1)
      .as[(String, Long, String)].collect().toSet
    assert(out === Set(("L", 1L, "a"), ("R", 2L, "b")))
  }

  test("small nBuckets still finds every difference (many rows per bucket)") {
    val l = tbl((1L to 200L).map(i => (i, s"v$i")): _*)
    val r = tbl((1L to 200L).map(i =>
      (i, if (i % 37 == 0) "CHANGED" else s"v$i")): _*)
    val out = Repair.diff(l, r, Seq("k"), Seq("v"), nBuckets = 2)
      .as[(String, Long, String)].collect().toSet
    val changed = (1L to 200L).filter(_ % 37 == 0)
    assert(out === changed.flatMap(i =>
      Seq(("L", i, s"v$i"), ("R", i, "CHANGED"))).toSet)
  }
}
