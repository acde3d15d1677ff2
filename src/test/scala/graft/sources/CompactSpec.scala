package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sinks.Compact

class CompactSpec extends SparkSpec {
  import spark.implicits._

  private def fs = new Path("/").getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def files(dir: String): Seq[String] =
    fs.listStatus(new Path(dir)).toSeq.map(_.getPath.getName)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith("."))

  test("compacts small files into one, leaves the large file, preserves every row") {
    val dir = Files.createTempDirectory("graft_compact").toString
    spark.range(1200).select(col("id")).repartition(12)
      .write.mode("overwrite").parquet(dir)
    // a file well over the small threshold, appended separately
    spark.range(100000, 160000).select(col("id")).coalesce(1)
      .write.mode("append").parquet(dir)
    val before = files(dir)
    val big = before.maxBy(n => fs.getFileStatus(new Path(dir, n)).getLen)
    val bigLen = fs.getFileStatus(new Path(dir, big)).getLen

    val stats = Compact.compact(spark, dir,
      targetBytes = 1L << 30, smallBytes = bigLen)
    assert(stats.compacted === 12)
    assert(stats.written === 1)

    val after = files(dir)
    assert(after.contains(big), "large file must be untouched")
    assert(after.size === 2, s"12 smalls -> 1: $after")
    assert(spark.read.parquet(dir).agg(count(lit(1)), sum(col("id")))
      .as[(Long, Long)].head() ===
      ((61200L, (0L until 1200).sum + (100000L until 160000L).sum)))
  }

  test("fewer than two small files is a no-op") {
    val dir = Files.createTempDirectory("graft_compact_n").toString
    spark.range(100).coalesce(1).write.mode("overwrite").parquet(dir)
    val stats = Compact.compact(spark, dir)
    assert(stats === Compact.Stats(1, 0, 0))
  }

  test("recover rolls a marked transaction forward: attempt in, originals out") {
    val dir = Files.createTempDirectory("graft_compact_r").toString
    spark.range(100).repartition(2).write.mode("overwrite").parquet(dir)
    val originals = files(dir)
    // the replacement attempt (as if the compaction job finished)...
    spark.range(100).coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/.compact-attempt-testtx")
    // ...and its published marker listing the originals to delete
    val marker = new Path(s"$dir/_compact_tx/testtx")
    fs.mkdirs(marker.getParent)
    val out = fs.create(marker, true)
    out.write(originals.mkString("\n").getBytes(StandardCharsets.UTF_8)); out.close()

    Compact.recover(spark, dir)
    val after = files(dir)
    assert(after.forall(_.startsWith("compact-testtx-")), after.toString)
    assert(originals.forall(!after.contains(_)))
    assert(!fs.exists(marker))
    assert(!fs.exists(new Path(s"$dir/.compact-attempt-testtx")))
    assert(spark.read.parquet(dir).count() === 100)
    // replay is a no-op
    Compact.recover(spark, dir)
    assert(files(dir) === after)
  }

  test("recover rolls an unmarked attempt back: pre-commit garbage deleted") {
    val dir = Files.createTempDirectory("graft_compact_b").toString
    spark.range(100).repartition(2).write.mode("overwrite").parquet(dir)
    val before = files(dir)
    spark.range(50).coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/.compact-attempt-orphan")
    Compact.recover(spark, dir)
    assert(files(dir) === before)
    assert(!fs.exists(new Path(s"$dir/.compact-attempt-orphan")))
    assert(spark.read.parquet(dir).count() === 100)
  }
}
