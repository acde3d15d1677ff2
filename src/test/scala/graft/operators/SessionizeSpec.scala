package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  // (user, ts seconds, event id) — user 1: two sessions split by a 100 s
  // gap; user 2: one single-event session; equal timestamps for user 1's
  // first two events exercise the tie-break.
  private def events = Seq(
    (1L, 10L, 100L), (1L, 10L, 101L), (1L, 40L, 102L),
    (1L, 200L, 103L), (1L, 230L, 104L),
    (2L, 500L, 200L))
    .toDF("user_id", "sec", "event_id")
    .withColumn("ts", timestamp_seconds(col("sec")))

  test("assign: breaks on gap, deterministic under equal timestamps") {
    val got = Sessionize.assign(events, "user_id", "ts", gapSeconds = 60,
        tieBreak = Seq("event_id"))
      .select(col("event_id"), col("session_seq")).as[(Long, Long)]
      .collect().toMap
    assert(got === Map(100L -> 1L, 101L -> 1L, 102L -> 1L,
      103L -> 2L, 104L -> 2L, 200L -> 1L))
  }

  test("sessions: integer summaries per session") {
    val got = Sessionize.sessions(events, "user_id", "ts", gapSeconds = 60,
        tieBreak = Seq("event_id"))
      .select(col("user_id"), col("session_seq"), col("n_events"),
        col("start_us"), col("end_us"), col("duration_us"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      (1L, 1L, 3L, 10000000L, 40000000L, 30000000L),
      (1L, 2L, 2L, 200000000L, 230000000L, 30000000L),
      (2L, 1L, 1L, 500000000L, 500000000L, 0L)))
  }

  test("boundary: a gap of exactly gapSeconds does NOT break the session") {
    val e = Seq((1L, 0L, 1L), (1L, 60L, 2L), (1L, 121L, 3L))
      .toDF("user_id", "sec", "event_id")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val got = Sessionize.assign(e, "user_id", "ts", gapSeconds = 60,
        tieBreak = Seq("event_id"))
      .select(col("event_id"), col("session_seq")).as[(Long, Long)]
      .collect().toMap
    // 0 -> 60 is exactly the gap (kept together); 60 -> 121 exceeds it
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 2L))
  }
}
