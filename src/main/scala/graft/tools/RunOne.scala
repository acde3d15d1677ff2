package graft.tools
object RunOne {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("dsir_select").split(",").toSeq
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.local()
    names.foreach { n =>
      println(s"==== $n ====")
      graft.SparkEntry.queries(n)(spark, dir).show(20, false)
      graft.Caches.clear(spark)
    }
    spark.stop()
  }
}
