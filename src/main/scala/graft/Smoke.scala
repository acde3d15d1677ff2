package graft

import org.apache.spark.sql.SparkSession

/** Local smoke runner mirroring the driver's t1 check: run
  * `SparkEntry.entry` on sf0.001 and require rows > 0.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(master = "local[8]", shufflePartitions = 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    df.show(20, truncate = false)
    val n = df.count()
    println(s"[smoke] entry rows = $n")
    assert(n > 0, "entry must return rows")
    spark.stop()
  }
}
