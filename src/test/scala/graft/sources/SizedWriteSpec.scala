package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.{GraftSession, SparkSpec}
import graft.sinks.Sized

/** [[Sized.rebalancedWrite]]: output file count follows the DATA size at
  * the requested granularity, not the input partition count — and an
  * oversized single partition is SPLIT, which plain coalesce cannot do.
  */
class SizedWriteSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def tmp(name: String) =
    s"${sys.props("java.io.tmpdir")}/graft_sizedspec_$name"

  private def partFiles(path: String): Int = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).count(_.getPath.getName.startsWith("part-"))
  }

  test("file count follows the advisory size, not the task count") {
    val li = GraftSession.table(spark, dir, "lineitem")
      .select("l_orderkey", "l_quantity", "l_returnflag")
    val spread = li.repartition(16)
    Sized.rebalancedWrite(spread, tmp("small"), targetShuffleBytes = 32L << 10)
    Sized.rebalancedWrite(spread, tmp("big"), targetShuffleBytes = 64L << 20)
    val (small, big) = (partFiles(tmp("small")), partFiles(tmp("big")))
    // 64 MB advisory swallows the whole sf0.001 table: exactly one file;
    // 32 KB yields strictly more — the count tracked bytes, not the 16
    // input partitions
    assert(big === 1, s"big-target files = $big")
    assert(small > big, s"small=$small big=$big")
    // row preservation
    assert(spark.read.parquet(tmp("small")).count() === li.count())
  }

  test("an oversized single partition is split, not passed through") {
    val li = GraftSession.table(spark, dir, "lineitem")
      .select("l_orderkey", "l_quantity").repartition(1)
    Sized.rebalancedWrite(li, tmp("split"), targetShuffleBytes = 32L << 10)
    assert(partFiles(tmp("split")) > 1,
      "rebalance must split the one oversized input partition")
  }
}
