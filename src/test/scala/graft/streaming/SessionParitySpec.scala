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

  test("sessionizeStream (transformWithState): batch break rule, timer flush, open sessions held") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[(Long, Long)]
    val stream = StreamOps.sessionizeStream(
      input.toDS().toDF("user_id", "sec")
        .withColumn("ts", timestamp_seconds(col("sec"))),
      keyCol = "user_id", tsCol = "ts", gapSeconds = 300L)
    val q = stream.toDF().writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("tws_sessions")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      // all times offset +1000 s: an event at EXACTLY the initial
      // watermark (epoch 0) is dropped by the operator's late-row filter
      // — a degenerate corner no real stream hits, not the semantics
      // under test here
      // user 5 probes the boundary: 301 s EXCEEDS the gap → two sessions
      input.addData((1L, 1000L), (1L, 1100L), (2L, 1050L), (5L, 1000L), (5L, 1301L))
      q.processAllAvailable()
      // 1400-1100 = 300 s = the gap EXACTLY → same session (the batch
      // operator's strictly-greater break; session_window would split)
      input.addData((1L, 1400L), (3L, 10000L))
      q.processAllAvailable()
      // watermark jumps to 20000 s: users 1/2/5 flush via timers with no
      // new records of their own; user 3 becomes final too
      input.addData((4L, 20000L))
      q.processAllAvailable()
      val got = spark.table("tws_sessions")
        .as[(Long, Long, Long, Long)].collect().toSeq.sorted
      val S = 1000000L // seconds → micros
      assert(got === Seq(
        (1L, 1000L * S, 1400L * S, 3L),  // bridged across batches, gap-inclusive
        (2L, 1050L * S, 1050L * S, 1L),  // timer flush, no further records
        (3L, 10000L * S, 10000L * S, 1L),
        (5L, 1000L * S, 1000L * S, 1L),  // 301 s split into two sessions
        (5L, 1301L * S, 1301L * S, 1L)))
      // user 4's session (deadline 20300 s > watermark 20000 s) stays open
      assert(!got.exists(_._1 == 4L))
    } finally {
      q.stop()
      saved.fold(spark.conf.unset(providerKey))(v => spark.conf.set(providerKey, v))
    }
  }

  test("sessionizeStream: a late event (behind the watermark) is dropped, not merged") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[(Long, Long)]
    val stream = StreamOps.sessionizeStream(
      input.toDS().toDF("user_id", "sec")
        .withColumn("ts", timestamp_seconds(col("sec"))),
      keyCol = "user_id", tsCol = "ts", gapSeconds = 300L)
    val q = stream.toDF().writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("tws_sessions_late")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData((1L, 1000L), (2L, 5000L))
      q.processAllAvailable()
      // watermark is now 5000 s (delay 0): a user-1 event at 1100 s is
      // LATE — the operator must drop it, and the finality rule is sound
      // exactly because it does (a finalized rank/session never changes)
      input.addData((1L, 1100L), (9L, 20000L))
      q.processAllAvailable()
      val got = spark.table("tws_sessions_late")
        .as[(Long, Long, Long, Long)].collect().toSeq.filter(_._1 == 1L)
      val S = 1000000L
      assert(got === Seq((1L, 1000L * S, 1000L * S, 1L)),
        s"late event must not extend the session: $got")
    } finally {
      q.stop()
      saved.fold(spark.conf.unset(providerKey))(v => spark.conf.set(providerKey, v))
    }
  }
}
