package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.SparkSpec
import graft.operators.Resample

/** Batch/streaming resample parity: the same events through
  * [[StreamOps.resampleStream]] (event-time timers) and
  * [[Resample.resampleFill]] (dense grid + window fill) must produce the
  * same densified series for every bucket the stream can finalize — all
  * buckets whose end the final watermark passed. With a 0-second
  * watermark that is every bucket strictly before the one holding each
  * stream's max timestamp.
  */
class ResampleParitySpec extends SparkSpec {
  import spark.implicits._

  test("streaming gap-fill equals batch gap-fill on watermark-final buckets") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // (key, sec, value): key 1 occupies buckets 0,3,4 of width 100s
    // (gaps at 1,2); key 2 occupies buckets 1,5 (gaps 2,3,4); a late max
    // event at 1000s pushes the watermark past every bucket end
    val events = Seq(
      (1L, 10L, 1.0), (1L, 20L, 5.0), (1L, 330L, 2.0), (1L, 450L, 3.0),
      (2L, 150L, 7.0), (2L, 560L, 4.0), (9L, 1000L, 0.0))

    val input = MemoryStream[(Long, Long, Double)]
    val stream = StreamOps.resampleStream(
      input.toDS().toDF("k", "sec", "v")
        .withColumn("ts", timestamp_seconds(col("sec"))),
      keyCol = "k", tsCol = "ts", valueCol = "v", intervalUs = 100000000L)
    val q = stream.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("resample_parity")
      .trigger(Trigger.ProcessingTime(0)).start()
    val streamed =
      try {
        input.addData(events: _*)
        q.processAllAvailable()
        spark.table("resample_parity")
          .as[(Long, Long, Long, Double)].collect().toSeq.sorted
      } finally q.stop()

    val wmUs = events.map(_._2).max * 1000000L
    val batch = Resample.resampleFill(
        events.toDF("k", "sec", "v")
          .select(col("k"), (col("sec") * 1000000L).as("us"), col("v")),
        keys = Seq("k"), tsUs = col("us"), intervalUs = 100000000L,
        aggs = Seq(count(lit(1)).as("n"), max(col("v")).as("v")),
        fillCols = Seq("v"), gapDefaults = Map("n" -> lit(0L)))
      .filter(col("bucket_us") + 100000000L <= wmUs)
      .select(col("k"), col("bucket_us"), col("n"), col("v"))
      .as[(Long, Long, Long, Double)].collect().toSeq.sorted

    assert(streamed === batch)
    // the gaps really were emitted: key 1 has 2, key 2 has 3
    assert(streamed.count(r => r._3 == 0L) === 5)
    // and forward-fill crossed them: key 2's bucket 2-4 carry 7.0
    assert(streamed.filter(r => r._1 == 2L && r._3 == 0L).map(_._4) ===
      Seq(7.0, 7.0, 7.0))
  }

  test("timers flush gaps without new records: two batches, late second batch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Long, Double)]
    val stream = StreamOps.resampleStream(
      input.toDS().toDF("k", "sec", "v")
        .withColumn("ts", timestamp_seconds(col("sec"))),
      keyCol = "k", tsCol = "ts", valueCol = "v", intervalUs = 100000000L)
    val q = stream.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("resample_timer")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData((1L, 10L, 1.0), (1L, 250L, 2.0))
      q.processAllAvailable()
      // watermark 250s: only bucket 0 final so far
      // a different key's event advances the watermark; key 1's bucket 1
      // (a gap) and bucket 2 must flush via its timer, no new key-1 rows
      input.addData((5L, 1000L, 9.0))
      q.processAllAvailable()
      val got = spark.table("resample_timer")
        .as[(Long, Long, Long, Double)].collect().toSeq.filter(_._1 == 1L).sorted
      assert(got === Seq(
        (1L, 0L, 1L, 1.0),
        (1L, 100000000L, 0L, 1.0),   // gap flushed by timer
        (1L, 200000000L, 1L, 2.0)))
    } finally q.stop()
  }
}
