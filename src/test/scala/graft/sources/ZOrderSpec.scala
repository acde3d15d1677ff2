package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sinks.ZOrder

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave spreads bits: output bit i*n+j is bit i of column j") {
    val got = spark.range(1)
      .select(
        ZOrder.interleave(Seq(lit(3L), lit(0L)), 4).as("a"),   // 0b11,0b00 -> 0b0101
        ZOrder.interleave(Seq(lit(0L), lit(3L)), 4).as("b"),   // -> 0b1010
        ZOrder.interleave(Seq(lit(5L), lit(6L)), 4).as("c"))   // 101/110 -> 111001
      .as[(Long, Long, Long)].head()
    assert(got === ((5L, 10L, 57L)))
  }

  test("z-order write prunes on BOTH dimensions; answers equal the unpruned read") {
    // two independent uniform dims: a 1-D sort would prune only its own
    val dir = Files.createTempDirectory("graft_zorder").toString
    val df = spark.range(4096).select(
      (col("id") % 64).as("x"),
      (col("id") / 64).cast("long").as("y"),
      col("id").as("payload"))
    ZOrder.write(df, dir, Seq("x", "y"), numFiles = 16)

    val all = ZOrder.index(spark, dir).select("file").distinct().count()
    assert(all === 16)

    // range predicate on x alone: a quarter of the domain
    val fx = ZOrder.selectFiles(spark, dir, Seq(("x", 0L, 15L)))
    // same on y alone
    val fy = ZOrder.selectFiles(spark, dir, Seq(("y", 0L, 15L)))
    assert(fx.size < 16, s"x-pruning admitted all files")
    assert(fy.size < 16, s"y-pruning admitted all files")

    // conjunction prunes harder than either alone
    val fxy = ZOrder.selectFiles(spark, dir, Seq(("x", 0L, 15L), ("y", 0L, 15L)))
    assert(fxy.size <= math.min(fx.size, fy.size))

    // pruning never changes answers
    val pruned = ZOrder.read(spark, dir, Seq(("x", 0L, 15L), ("y", 0L, 15L)))
      .agg(count(lit(1)), sum(col("payload"))).as[(Long, Long)].head()
    val direct = spark.read.parquet(dir)
      .filter(col("x").between(0, 15) && col("y").between(0, 15))
      .agg(count(lit(1)), sum(col("payload"))).as[(Long, Long)].head()
    assert(pruned === direct)
    assert(pruned._1 === 16L * 16L)
  }

  test("empty admitted set returns an empty frame with the right schema") {
    val dir = Files.createTempDirectory("graft_zorder_e").toString
    val df = spark.range(100).select(col("id").as("x"), col("id").as("y"))
    ZOrder.write(df, dir, Seq("x", "y"), numFiles = 4)
    val out = ZOrder.read(spark, dir, Seq(("x", 1000L, 2000L)))
    assert(out.columns.toSeq === Seq("x", "y"))
    assert(out.count() === 0)
  }

  test("a predicate on an unindexed column fails loudly, not with zero files") {
    val dir = Files.createTempDirectory("graft_zorder_u").toString
    val df = spark.range(100).select(col("id").as("x"), col("id").as("y"))
    ZOrder.write(df, dir, Seq("x"), numFiles = 2)
    val e = intercept[IllegalArgumentException] {
      ZOrder.selectFiles(spark, dir, Seq(("y", 0L, 10L)))
    }
    assert(e.getMessage.contains("not in the index"))
  }
}
