package graft.operators

import graft.SparkSpec

class HierarchySpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long, Long)], maxDepth: Int = 32) =
    Hierarchy.explode(edges.toDF("p", "c", "q"), "p", "c", "q", maxDepth)
      .as[(Long, Long, Long, Long)].collect().toSet

  test("chain multiplies quantities along the path") {
    // 1 -(2)-> 2 -(3)-> 3 -(5)-> 4
    val got = run(Seq((1L, 2L, 2L), (2L, 3L, 3L), (3L, 4L, 5L)))
    assert(got === Set(
      (1L, 2L, 2L, 1L), (2L, 3L, 3L, 1L), (3L, 4L, 5L, 1L),
      (1L, 3L, 6L, 2L), (2L, 4L, 15L, 2L), (1L, 4L, 30L, 3L)))
  }

  test("DAG sums products across distinct paths, min_depth is shortest") {
    // diamond: 1->2 (x2), 1->3 (x3), 2->4 (x5), 3->4 (x7), plus direct 1->4 (x1)
    val got = run(Seq((1L, 2L, 2L), (1L, 3L, 3L), (2L, 4L, 5L),
      (3L, 4L, 7L), (1L, 4L, 1L)))
    // 1=>4: direct 1 + via-2 10 + via-3 21 = 32, shortest path depth 1
    assert(got.contains((1L, 4L, 32L, 1L)))
    assert(got.contains((1L, 2L, 2L, 1L)) && got.contains((1L, 3L, 3L, 1L)))
  }

  test("forest: disjoint roots never cross") {
    val got = run(Seq((1L, 2L, 1L), (10L, 20L, 1L)))
    assert(got === Set((1L, 2L, 1L, 1L), (10L, 20L, 1L, 1L)))
  }

  test("cycle fails by name at the depth bound") {
    val e = intercept[IllegalStateException](
      run(Seq((1L, 2L, 1L), (2L, 1L, 1L)), maxDepth = 4))
    assert(e.getMessage.contains("maxDepth=4"))
  }

  test("deep chain exactly at maxDepth succeeds") {
    val chain = (1L to 5L).map(i => (i, i + 1, 1L)) // depth-5 closure
    val got = run(chain, maxDepth = 5)
    assert(got.contains((1L, 6L, 1L, 5L)))
    assert(got.size === 15) // n*(n+1)/2 pairs for a 6-node chain
  }

  test("deep hierarchy folds completed levels: persisted blocks stay bounded") {
    graft.Caches.clear(spark)
    val base = spark.sparkContext.getPersistentRDDs.size
    val chain = (1L to 24L).map(i => (i, i + 1, 1L)) // 24 closure levels
    val got = Hierarchy.explode(chain.toDF("p", "c", "q"), "p", "c", "q",
        maxDepth = 32, foldEvery = 4)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got.contains((1L, 25L, 1L, 24L)))
    assert(got.size === 24 * 25 / 2)
    // edges + the fold accumulator + at most foldEvery+1 unfolded levels;
    // without folding this chain would hold ~25 persisted level RDDs here
    val live = spark.sparkContext.getPersistentRDDs.size - base
    assert(live <= 9, s"expected bounded persisted blocks, got $live")
    graft.Caches.clear(spark)
  }

  test("chaos: explode under continuous block loss recovers from checkpoint files") {
    // same discipline as the pageRank chaos spec: every persistent RDD is
    // unpersisted every 75ms while a 12-level chain explodes with a
    // durable checkpointDir — fold accumulators and live levels must
    // all fall back to their checkpoint files and finish bit-identical
    val dir = java.nio.file.Files.createTempDirectory("graft_hchaos").toFile
    try {
      val chain = (1L to 12L).map(i => (i, i + 1, 1L))
      val expected = run(chain)
      val got = graft.Chaos.killingBlocks(spark) {
        Hierarchy.explode(chain.toDF("p", "c", "q"), "p", "c", "q",
            checkpointDir = Some(dir.getAbsolutePath), foldEvery = 3)
          .as[(Long, Long, Long, Long)].collect().toSet
      }
      assert(got === expected)
    } finally {
      graft.Caches.clear(spark)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).toSeq.flatten.foreach(rm); f.delete(); ()
      }
      rm(dir)
    }
  }

  test("checkpointDir: levels become RELIABLE checkpoints, results unchanged") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_hck").toFile
    def rddDirs(): Int = {
      def walk(f: java.io.File): Int =
        if (!f.isDirectory) 0
        else (if (f.getName.startsWith("rdd-")) 1 else 0) +
          Option(f.listFiles()).toSeq.flatten.map(walk).sum
      walk(dir)
    }
    try {
      val edges = Seq((1L, 2L, 2L), (2L, 3L, 3L), (3L, 4L, 5L))
      val plain = run(edges)
      val rel = Hierarchy.explode(edges.toDF("p", "c", "q"), "p", "c", "q",
          checkpointDir = Some(dir.getAbsolutePath))
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(rel === plain)
      assert(rddDirs() >= 3,
        "each closure level should write a reliable checkpoint")
    } finally {
      graft.Caches.clear(spark)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).toSeq.flatten.foreach(rm); f.delete(); ()
      }
      rm(dir)
    }
  }
}
