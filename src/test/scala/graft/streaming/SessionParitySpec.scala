package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.SparkSpec
import graft.operators.Sessionize

/** Batch/streaming sessionization parity: the SAME event set grouped by
  * Spark's streaming `session_window` and by the batch [[Sessionize]]
  * operator must produce the same session structure (per-user session
  * count and per-session event counts).
  *
  * Boundary semantics differ by construction — `session_window` merges
  * events whose [ts, ts+gap) windows OVERLAP, so a pair exactly `gap`
  * apart splits; [[Sessionize]] breaks only when the gap is EXCEEDED, so
  * the same pair stays together. The fixture therefore keeps every
  * intra-session gap strictly below and every break strictly above the
  * gap, where both definitions agree — the production case (real event
  * streams don't land on exact microsecond boundaries).
  */
class SessionParitySpec extends SparkSpec {
  import spark.implicits._

  test("streaming session_window and batch Sessionize agree off-boundary") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // (user, seconds): user 1 -> sessions {0,100,250} and {1000,1100};
    // user 2 -> {500} and {5000, 5200}; gap 300s
    val events = Seq(
      (1L, 0L), (1L, 100L), (1L, 250L), (1L, 1000L), (1L, 1100L),
      (2L, 500L), (2L, 5000L), (2L, 5200L))

    val input = MemoryStream[(Long, Long)]
    val stream = input.toDS().toDF("user_id", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withWatermark("ts", "0 seconds")
      .groupBy(session_window(col("ts"), "300 seconds"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("n_events"))
    val q = stream.writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("session_parity")
      .trigger(Trigger.ProcessingTime(0)).start()
    val streamed =
      try {
        input.addData(events: _*)
        q.processAllAvailable()
        spark.table("session_parity").as[(Long, Long)].collect().toSeq.sorted
      } finally q.stop()

    val batch = Sessionize.sessions(
        events.toDF("user_id", "sec").withColumn("ts", timestamp_seconds(col("sec"))),
        user = "user_id", ts = "ts", gapSeconds = 300L)
      .select(col("user_id"), col("n_events")).as[(Long, Long)]
      .collect().toSeq.sorted

    assert(streamed === batch)
    assert(batch === Seq((1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L)))
  }
}
