package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SpatialSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(ls: Seq[(Long, Long, Long)], rs: Seq[(Long, Long, Long)],
      r: Long): Set[(Long, Long, Long)] =
    Spatial.chebyshevJoin(
        ls.toDF("lid", "lx", "ly"), col("lx"), col("ly"),
        rs.toDF("rid", "rx", "ry"), col("rx"), col("ry"), r)
      .select(col("lid"), col("rid"), col("cheb_dist"))
      .as[(Long, Long, Long)].collect().toSet

  private def naive(ls: Seq[(Long, Long, Long)], rs: Seq[(Long, Long, Long)],
      r: Long): Set[(Long, Long, Long)] =
    (for {
      (lid, lx, ly) <- ls
      (rid, rx, ry) <- rs
      d = math.max(math.abs(lx - rx), math.abs(ly - ry))
      if d <= r
    } yield (lid, rid, d)).toSet

  test("matches brute force, including pairs at exactly distance r") {
    val ls = Seq((1L, 0L, 0L), (2L, 10L, 10L), (3L, 23L, 7L), (4L, 100L, 100L))
    val rs = Seq((11L, 5L, 5L), (12L, 10L, 15L), (13L, 30L, 0L), (14L, 200L, 0L))
    val r = 5L
    val got = pairs(ls, rs, r)
    assert(got === naive(ls, rs, r))
    assert(got.contains((1L, 11L, 5L))) // boundary d == r included
  }

  test("negative coordinates land in floor-divided cells (no zero-cell fold)") {
    // points straddling 0: truncating division would put -1 and +1 in the
    // same cell and break the one-cell-apart invariant
    val ls = Seq((1L, -1L, -1L), (2L, -9L, 3L), (3L, -16L, -16L))
    val rs = Seq((11L, 1L, 1L), (12L, -12L, 5L), (13L, -20L, -20L))
    for (r <- Seq(2L, 4L, 8L))
      assert(pairs(ls, rs, r) === naive(ls, rs, r), s"r=$r")
  }

  test("each qualifying pair is emitted exactly once (no stencil duplicates)") {
    val ls = Seq((1L, 7L, 7L))
    val rs = Seq((11L, 8L, 8L)) // adjacent cells at r=8: same-cell AND neighbor
    val df = Spatial.chebyshevJoin(
      ls.toDF("lid", "lx", "ly"), col("lx"), col("ly"),
      rs.toDF("rid", "rx", "ry"), col("rx"), col("ry"), 8L)
    assert(df.count() === 1L)
  }

  test("dense cluster: every pair within r, none beyond") {
    val ls = (0L until 20L).map(i => (i, i % 5L, i / 5L))
    val rs = (0L until 20L).map(i => (100L + i, i % 4L, i / 4L))
    for (r <- Seq(1L, 2L, 3L))
      assert(pairs(ls, rs, r) === naive(ls, rs, r), s"r=$r")
  }
}
