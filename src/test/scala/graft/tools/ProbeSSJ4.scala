package graft.tools
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StreamOps

object ProbeSSJ4 {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local()
    import s.implicits._
    val maxUs = 1700000000000000L + 20L * 3600 * 1000000
    // equalize both sides' watermark anchors: a click AND a purchase at maxUs
    val offs = Seq(8999L, 9000L, 9001L, 9002L, 9060L, 9600L)
    val clicks = offs.zipWithIndex.map { case (off, i) =>
      (1000L + i, 1L + i, "click", maxUs - off * 1000000L)
    } ++ Seq((1L, 998L, "click", maxUs))
    val anchor = Seq((2L, 999L, "purchase", maxUs))
    val rows = (clicks ++ anchor).map { case (id, u, t, us) =>
      (id, u, t, new java.sql.Timestamp(us / 1000)) }
    val p = "/tmp/probe_ssj_events4"
    rows.toDF("event_id", "user_id", "event_type", "ts")
      .coalesce(1).write.mode("overwrite").parquet(p)
    def side(tpe: String, prefix: String) =
      StreamOps.parquetStream(s, p)
        .filter(col("event_type") === tpe)
        .select(col("event_id").as(s"${prefix}_id"), col("user_id").as(s"${prefix}_user"),
          col("ts").as(s"${prefix}_ts"))
    val joined = StreamOps.intervalJoin(
      side("click", "c"), "c_ts", side("purchase", "p"), "p_ts",
      keys = Seq("c_user" -> "p_user"), within = "30 minutes",
      watermark = "2 hours", joinType = "left_outer")
    val ckpt = java.nio.file.Files.createTempDirectory("probe_ck").toString
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("probe_out4").option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    q.recentProgress.foreach { pr =>
      println(s"BATCH ${pr.batchId} rows=${pr.numInputRows} wm=${pr.eventTime.get("watermark")} sink=${pr.sink.numOutputRows}") }
    val got = s.table("probe_out4").filter(col("p_id").isNull)
      .select("c_id").as[Long].collect().toSet
    offs.zipWithIndex.foreach { case (off, i) =>
      println(s"off=${off}s emitted=${got.contains(1000L + i)}") }
    s.stop()
  }
}
