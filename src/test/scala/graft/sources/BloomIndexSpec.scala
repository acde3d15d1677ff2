package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sinks.BloomIndex

class BloomIndexSpec extends SparkSpec {
  import spark.implicits._

  test("point lookup prunes hash-distributed files where min/max stats cannot") {
    val dir = Files.createTempDirectory("graft_bloom").toString
    // hash-cluster by key: each key's rows land in exactly one of 16
    // files, but every file spans the full key RANGE — zone maps admit all
    val df = spark.range(20000).select(
      (col("id") % 2000).as("k"), col("id").as("payload"))
    df.repartition(16, col("k")).write.mode("overwrite").parquet(dir)
    BloomIndex.build(spark, dir, "k", expectedItemsPerFile = 4096)

    val admitted = BloomIndex.selectFiles(spark, dir, "k", 1234L)
    assert(admitted.size < 16 / 2,
      s"bloom admitted ${admitted.size}/16 files — no pruning")

    val got = BloomIndex.read(spark, dir, "k", 1234L)
      .agg(count(lit(1)), sum(col("payload"))).as[(Long, Long)].head()
    val want = spark.read.parquet(dir).filter(col("k") === 1234L)
      .agg(count(lit(1)), sum(col("payload"))).as[(Long, Long)].head()
    assert(got === want)
    assert(got._1 === 10L) // 20000 ids over 2000 keys
  }

  test("an absent key returns empty, never a wrong row") {
    val dir = Files.createTempDirectory("graft_bloom_a").toString
    spark.range(1000).select((col("id") % 100).as("k"), col("id").as("p"))
      .repartition(4, col("k")).write.mode("overwrite").parquet(dir)
    BloomIndex.build(spark, dir, "k", expectedItemsPerFile = 512)
    assert(BloomIndex.read(spark, dir, "k", 99999L).count() === 0L)
  }

  test("files appended after the build are admitted (fail-open), not silently skipped") {
    val dir = Files.createTempDirectory("graft_bloom_f").toString
    spark.range(1000).select((col("id") % 100).as("k"), col("id").as("p"))
      .repartition(4, col("k")).write.mode("overwrite").parquet(dir)
    BloomIndex.build(spark, dir, "k", expectedItemsPerFile = 512)
    // a late file with a brand-new key the index has never seen
    Seq((7777L, 1L)).toDF("k", "p").coalesce(1)
      .write.mode("append").parquet(dir)
    assert(BloomIndex.read(spark, dir, "k", 7777L).count() === 1L)
  }
}
