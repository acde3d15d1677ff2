package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sinks.ZoneMap

/** File-level data skipping: clustered write, footer-only index, pruned
  * read equivalence.
  */
class ZoneMapSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir() =
    Files.createTempDirectory("graft_zonemap").toString

  private def sample = (0L until 1000L).map(i => (i, s"v$i")).toDF("k", "v")

  test("write clusters into range-disjoint files and indexes every file") {
    val dir = freshDir()
    ZoneMap.write(sample, dir, "k", numFiles = 4)
    val idx = ZoneMap.index(spark, dir)
      .as[(String, Long, Long, Long)].collect().sortBy(_._2)
    assert(idx.length === 4)
    assert(idx.map(_._4).sum === 1000L)
    // range partitioning ⇒ zones are pairwise disjoint
    idx.sliding(2).foreach { case Array(a, b) => assert(a._3 < b._2); case _ => }
  }

  test("pruned read equals the full filtered read and touches fewer files") {
    val dir = freshDir()
    ZoneMap.write(sample, dir, "k", numFiles = 4)
    val selected = ZoneMap.selectFiles(spark, dir, 100L, 120L)
    assert(selected.nonEmpty && selected.size < 4,
      s"narrow range should prune files, selected ${selected.size} of 4")
    val pruned = ZoneMap.read(spark, dir, "k", 100L, 120L)
      .as[(Long, String)].collect().toSet
    val full = spark.read.parquet(dir).filter(col("k").between(100L, 120L))
      .as[(Long, String)].collect().toSet
    assert(pruned === full)
    assert(pruned.size === 21)
  }

  test("out-of-range read selects zero files but keeps the schema") {
    val dir = freshDir()
    ZoneMap.write(sample, dir, "k", numFiles = 4)
    assert(ZoneMap.selectFiles(spark, dir, 5000L, 6000L).isEmpty)
    val out = ZoneMap.read(spark, dir, "k", 5000L, 6000L)
    assert(out.columns.toSeq === Seq("k", "v"))
    assert(out.count() === 0L)
  }

  test("buildIndex reads footers only and survives int32 zone columns") {
    val dir = freshDir()
    sample.select(col("k").cast("int").as("k32"), col("v"))
      .repartitionByRange(3, col("k32")).sortWithinPartitions("k32")
      .write.mode("overwrite").parquet(dir)
    ZoneMap.buildIndex(spark, dir, "k32")
    val idx = ZoneMap.index(spark, dir).as[(String, Long, Long, Long)].collect()
    assert(idx.length === 3)
    assert(idx.map(_._4).sum === 1000L)
    assert(idx.map(_._2).min === 0L && idx.map(_._3).max === 999L)
  }

  test("a non-indexable zone column fails loudly") {
    val dir = freshDir()
    sample.withColumn("d", col("k").cast("double"))
      .write.mode("overwrite").parquet(dir)
    val e = intercept[org.apache.spark.SparkException] {
      ZoneMap.buildIndex(spark, dir, "d")
    }
    assert(e.getMessage != null)
  }
}
