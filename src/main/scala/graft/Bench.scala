package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** Median of an odd-length sample. */
  private def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // identical code measured 9.6x apart across rounds on single runs:
    // per-query medians over SPARK_GRAFT_RUNS (default 3) are the signal
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // the local SFs are MBs, not TBs: AQE's default 64 MB advisory size
      // would coalesce every exchange to ~1 partition and serialize the
      // CPU-heavy stages; target small partitions so all cores stay busy
      // (at production scale the 64 MB default is correct)
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256k")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.sql.warehouse.dir", sys.props("java.io.tmpdir") + "/graft_warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_ONLY=q1,q2 restricts the set (local iteration); unset = all
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = only.fold(SparkEntry.queries)(f => SparkEntry.queries.filter(kv => f(kv._1)))
    // untimed warm-up: JIT/janino/parquet-reader/shuffle/broadcast machinery
    // initialization otherwise lands entirely on whichever query runs first
    // (measured ~4-6 s on the first query, independent of the query)
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    Caches.clear(spark)
    // deterministic name order so per-query times are comparable across runs
    val failed = Seq.newBuilder[String]
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to runs).flatMap { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true } catch {
            case e: Throwable =>
              // a swallowed failure would read as a (fast, green) result
              System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
              failed += name
              false
          }
          finally Caches.clear(spark)
        if (ok) Some((System.nanoTime() - t0) / 1e9) else None
      }
      name -> (if (times.isEmpty) 0.0 else median(times))
    }
    def fmt(v: Double): String = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val failedJson = failed.result().distinct.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    // ONE machine-parseable line, flushed before shutdown so JVM teardown
    // or interleaved executor logs can't truncate it (bit round 2's report)
    System.out.println(
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"failed":$failedJson,"runs":$runs,"sf":"$sfDir"}""")
    System.out.flush()
    spark.stop()
  }
}
