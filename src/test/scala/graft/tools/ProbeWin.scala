package graft.tools
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StreamOps

/** Boundary probe for append-mode window aggregation: does a window whose
  * end equals the final watermark exactly emit, or not?
  */
object ProbeWin {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local()
    import s.implicits._
    val h = 3600L * 1000000
    val T0 = 1700000000000000L  // not hour-aligned; irrelevant
    // anchor at exactly hour-aligned max: windows end at T0+k*h
    val base = (T0 / h) * h
    // max ts at base+12h exactly => wm = base+10h exactly (2h delay)
    // windows ending at base+9h (< wm), base+10h (== wm), base+11h (> wm)
    val rows = Seq(
      (1L, base + 8L * h + 100L), // in window [8h,9h) end=9h < wm
      (2L, base + 9L * h + 100L), // end=10h == wm
      (3L, base + 10L * h + 100L), // end=11h > wm
      (4L, base + 12L * h)         // max anchor, window [12h,13h)
    ).map { case (id, us) => (id, new java.sql.Timestamp(us / 1000)) }
    val p = "/tmp/probe_win_events"
    rows.toDF("event_id", "ts").coalesce(1).write.mode("overwrite").parquet(p)
    val raw = StreamOps.parquetStream(s, p)
    val agg = raw.withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
    val ckpt = java.nio.file.Files.createTempDirectory("probe_ck").toString
    val q = agg.writeStream.outputMode("append").format("memory")
      .queryName("probe_win").option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = s.table("probe_win")
      .select((col("window.end").cast("long") * 1000000L - base).as("end_off"))
      .as[Long].collect().toSet
    println(s"end=9h  emitted=${got.contains(9L * h)}")
    println(s"end=10h emitted=${got.contains(10L * h)} (== wm)")
    println(s"end=11h emitted=${got.contains(11L * h)}")
    s.stop()
  }
}
