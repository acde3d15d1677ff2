package graft.misc

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._

import graft.{Jobs, SparkSpec}
import graft.operators.Records._

class JobsSpec extends SparkSpec {
  import spark.implicits._

  test("runAll executes every action and returns results in input order") {
    val df = (1 to 1000).toDF("x")
    val results = Jobs.runAll(spark, Seq(
      "evens" -> (() => df.filter($"x" % 2 === 0).count()),
      "odds" -> (() => df.filter($"x" % 2 === 1).count()),
      "sum" -> (() => df.agg(sum($"x")).as[Long].head())))
    assert(results === Seq(500L, 500L, 500500L))
  }

  test("runAll overlaps actions (both in flight at once)") {
    val inFlight = new AtomicInteger()
    val sawOverlap = new AtomicInteger()
    def action(): Long = {
      val now = inFlight.incrementAndGet()
      if (now > 1) sawOverlap.incrementAndGet()
      try {
        Thread.sleep(150)
        if (inFlight.get() > 1) sawOverlap.incrementAndGet()
        spark.range(10).count()
      } finally { inFlight.decrementAndGet(); () }
    }
    Jobs.runAll(spark, Seq("a" -> (() => action()), "b" -> (() => action())))
    assert(sawOverlap.get() > 0, "two unbounded actions never overlapped")
  }

  test("first failure propagates and is all-or-nothing") {
    val e = intercept[Exception] {
      Jobs.runAll(spark, Seq(
        "ok" -> (() => spark.range(100).count()),
        "boom" -> (() => throw new IllegalStateException("sink failed"))))
    }
    assert(e.getMessage.contains("sink failed"))
  }

  test("failure stops queued actions from ever starting (bounded pool)") {
    // parallelism=1 serializes the pool: "boom" fails (and records the
    // root cause BEFORE its future completes), so the queued "late" must
    // be skipped — the old shutdown() drained the queue and a sink could
    // write output after the caller saw the batch fail
    val lateRan = new AtomicInteger()
    val e = intercept[IllegalStateException] {
      Jobs.runAll(spark, Seq(
        "boom" -> (() => throw new IllegalStateException("sink failed")),
        "late" -> (() => { lateRan.incrementAndGet(); spark.range(10).count() })),
        parallelism = 1)
    }
    assert(e.getMessage === "sink failed") // root cause, not a CancellationException
    assert(lateRan.get() === 0, "queued action ran after the batch failed")
  }

  test("forkBranches: one scan feeds concurrent port sinks, cache released") {
    val scans = spark.sparkContext.longAccumulator("scans")
    val base = (1 to 300).toDS().mapPartitions { it =>
      scans.add(1); it // counts upstream partition computations
    }.toDF("x")
    val ports = base.branch(
      when($"x" % 3 === 0, "fizz").when($"x" % 5 === 0, "buzz").otherwise("rest"))
    val before = spark.sparkContext.getPersistentRDDs.size
    val counts = Jobs.forkBranches(ports, Seq(
      "fizz" -> ((df: org.apache.spark.sql.DataFrame) => df.count()),
      "buzz" -> ((df: org.apache.spark.sql.DataFrame) => df.count()),
      "rest" -> ((df: org.apache.spark.sql.DataFrame) => df.count())))
    assert(counts.sum === 300L)
    assert(counts === Seq(100L, 40L, 160L))
    // every upstream partition computed exactly once (the persist is the
    // single materialization; three ports read the cached blocks)
    assert(scans.value === base.rdd.getNumPartitions)
    assert(spark.sparkContext.getPersistentRDDs.size === before)
  }
}
