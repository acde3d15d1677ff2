package graft

/** Pins the Verify-level leak gate: an operator that persists WITHOUT
  * routing through [[Caches.track]] must fail the correctness dump (not
  * just show up in the bench diag) — the round-4 failure mode was an
  * untracked persist silently taxing every later query in the session.
  */
class VerifySpec extends SparkSpec {
  import spark.implicits._

  test("a deliberately-leaky operator fails the gate; a tracked one passes") {
    Caches.clear(spark, blocking = true)
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))

    // tracked persist: the gate must stay green
    val good = Caches.track(Seq(1, 2, 3).toDF("x").persist())
    good.count()
    assert(!Verify.leakCheck(spark, "good_operator"),
      "a Caches-tracked persist must not trip the leak gate")

    // untracked persist — the leak: survives Caches.clear, trips the gate
    val leaky = Seq(4, 5, 6).toDF("x").persist()
    leaky.count()
    assert(Verify.leakCheck(spark, "leaky_operator"),
      "an untracked persist must trip the leak gate")

    // the gate force-drops the leak so it cannot tax the NEXT query
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
    assert(!Verify.leakCheck(spark, "after_cleanup"))
  }
}
