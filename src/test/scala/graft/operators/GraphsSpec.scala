package graft.operators

import graft.SparkSpec

class GraphsSpec extends SparkSpec {
  import spark.implicits._

  private def g(edges: (Long, Long)*) = edges.toSeq.toDF("s", "d")

  private def tri(edges: (Long, Long)*): (Long, Long, Long) =
    Graphs.triangleCount(g(edges: _*), "s", "d")
      .as[(Long, Long, Long)].head()

  test("K4 has 4 triangles; stars and paths none") {
    assert(tri((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)) ===
      ((4L, 6L, 4L)))
    assert(tri((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)) === ((5L, 4L, 0L)))
    assert(tri((1L, 2L), (2L, 3L), (3L, 4L)) === ((4L, 3L, 0L)))
  }

  test("reversed duplicates, parallel edges and self-loops collapse") {
    assert(tri((1L, 2L), (2L, 1L), (2L, 3L), (2L, 3L), (3L, 1L), (1L, 1L)) ===
      ((3L, 3L, 1L)))
  }

  test("two triangles sharing an edge both count") {
    // {1,2,3} and {2,3,4} share edge 2-3
    assert(tri((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)) ===
      ((4L, 5L, 2L)))
  }

  test("skewed star with one closing rim edge: exactly one triangle") {
    // celebrity node 1 connected to 2..50, plus rim edge 2-3
    val edges = (2L to 50L).map(i => (1L, i)) :+ (2L, 3L)
    assert(tri(edges: _*) === ((50L, 50L, 1L)))
  }
}
