package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def sky(pts: (Long, Long, Long)*): Set[(Long, Long, Long)] =
    Skyline.minimize2(pts.toSeq.toDF("id", "x", "y"), col("x"), col("y"))
      .as[(Long, Long, Long)].collect().toSet

  // textbook dominance: no other point <= on both dims and < on one
  private def naive(pts: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
    pts.filter { case (_, x, y) =>
      !pts.exists { case (_, bx, by) =>
        bx <= x && by <= y && (bx < x || by < y)
      }
    }.toSet

  test("frontier on a staircase with interior points") {
    val pts = Seq((1L, 1L, 9L), (2L, 3L, 5L), (3L, 5L, 2L), (4L, 9L, 1L),
      (5L, 4L, 6L), (6L, 6L, 6L), (7L, 2L, 8L))
    assert(sky(pts: _*) === naive(pts))
    assert(sky(pts: _*) === Set((1L, 1L, 9L), (7L, 2L, 8L), (2L, 3L, 5L),
      (3L, 5L, 2L), (4L, 9L, 1L)))
  }

  test("duplicates of a frontier point all survive; tie-x larger-y is dominated") {
    val pts = Seq((1L, 2L, 2L), (2L, 2L, 2L), (3L, 2L, 5L), (4L, 5L, 1L))
    assert(sky(pts: _*) === naive(pts))
    assert(sky(pts: _*) === Set((1L, 2L, 2L), (2L, 2L, 2L), (4L, 5L, 1L)))
  }

  test("equal-y across increasing x: only the smallest x survives") {
    val pts = Seq((1L, 1L, 3L), (2L, 2L, 3L), (3L, 3L, 3L))
    assert(sky(pts: _*) === naive(pts))
    assert(sky(pts: _*) === Set((1L, 1L, 3L)))
  }

  test("matches naive dominance on a pseudo-random cloud") {
    val pts = (1L to 200L).map { i =>
      val h = i * 2654435761L
      (i, math.abs(h % 50), math.abs((h >> 8) % 50))
    }
    assert(sky(pts: _*) === naive(pts))
  }

  test("null coordinates are dropped, not frontier members") {
    val df = Seq((1L, Some(1L), Some(1L)), (2L, None, Some(0L)),
      (3L, Some(0L), None)).toDF("id", "x", "y")
    val out = Skyline.minimize2(df, col("x"), col("y"))
      .select("id").as[Long].collect().toSet
    assert(out === Set(1L))
  }
}
