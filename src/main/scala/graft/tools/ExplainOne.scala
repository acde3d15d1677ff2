package graft.tools

import org.apache.spark.sql.SparkSession

/** Local plan-audit helper: print the formatted physical plan of one or
  * more SparkEntry queries (`runMain graft.tools.ExplainOne q1,q2 [sfDir]`).
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("cogroup3").split(",").toSeq
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"==== $n ====")
      graft.SparkEntry.queries(n)(spark, dir).explain("formatted")
      graft.Caches.clear(spark)
    }
    spark.stop()
  }
}
