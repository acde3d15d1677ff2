package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq(
    (1L, "a", 10), (2L, "b", 20), (3L, "c", 30), (4L, "d", 40)
  ).toDF("k", "name", "v")

  test("applyChanges: upsert, delete, last-seq-wins, untouched passthrough") {
    val changes = Seq(
      (2L, "b1", 21, "U", 1L), // superseded by seq 2
      (2L, "b2", 22, "U", 2L), // wins for key 2
      (3L, "c", 30, "D", 1L), // key 3 removed
      (5L, "e", 50, "I", 1L), // new key
      (4L, "d9", 49, "I", 1L), // I on existing key = upsert
      (9L, "x", 0, "D", 1L) // delete of absent key = no-op
    ).toDF("k", "name", "v", "_op", "_seq")
    val out = Merge.applyChanges(base, changes, Seq("k"))
      .as[(Long, String, Int)].collect().sortBy(_._1)
    assert(out === Seq((1L, "a", 10), (2L, "b2", 22), (4L, "d9", 49), (5L, "e", 50)))
  }

  test("applyChanges: an op outside I/U/D fails the job naming the value") {
    val bad = Seq((1L, "a", 11, "Z", 1L)).toDF("k", "name", "v", "_op", "_seq")
    val e = intercept[Exception] {
      Merge.applyChanges(base, bad, Seq("k")).collect()
    }
    assert(e.getMessage.contains("Z") || e.getCause.getMessage.contains("Z"))
  }

  test("applyChanges: composite primary key") {
    val b2 = Seq((1L, "p", 10), (1L, "q", 11)).toDF("k1", "k2", "v")
    val ch = Seq((1L, "q", 99, "U", 1L)).toDF("k1", "k2", "v", "_op", "_seq")
    val out = Merge.applyChanges(b2, ch, Seq("k1", "k2"))
      .as[(Long, String, Int)].collect().sortBy(r => (r._1, r._2))
    assert(out === Seq((1L, "p", 10), (1L, "q", 99)))
  }

  test("snapshotDiff classifies I/U/D and round-trips through applyChanges") {
    val next = Seq[(Long, String, Option[Int])](
      (1L, "a", Some(10)), // unchanged -> absent from diff
      (2L, "b9", Some(20)), // value changed -> U
      (4L, "d", None), // null-safe change -> U
      (5L, "e", Some(50)) // new key -> I   (key 3 dropped -> D)
    ).toDF("k", "name", "v")
    val diff = Merge.snapshotDiff(base, next, Seq("k"))
    val ops = diff.select("k", "_op").as[(Long, String)].collect().sortBy(_._1)
    assert(ops === Seq((2L, "U"), (3L, "D"), (4L, "U"), (5L, "I")))
    val roundTrip = Merge.applyChanges(base,
      diff.withColumn("_seq", lit(1L)), Seq("k"))
    assert(roundTrip.as[(Long, String, Option[Int])].collect().sortBy(_._1) ===
      next.as[(Long, String, Option[Int])].collect().sortBy(_._1))
  }

  test("scd2History: validity chains per key with tie-broken endpoints") {
    val versions = Seq(
      (1L, 100L, 10L), (1L, 200L, 11L), (1L, 300L, 12L),
      (2L, 150L, 20L),
      (3L, 100L, 30L), (3L, 100L, 31L) // equal ts: event_id tie-breaks
    ).toDF("k", "ts", "eid")
    val out = Merge.scd2History(versions, Seq("k"), "ts", tieBreak = Seq("eid"))
      .select("k", "eid", "valid_from", "valid_to", "is_current")
      .as[(Long, Long, Long, Option[Long], Boolean)].collect().sortBy(r => (r._1, r._2))
    assert(out === Seq(
      (1L, 10L, 100L, Some(200L), false),
      (1L, 11L, 200L, Some(300L), false),
      (1L, 12L, 300L, None, true),
      (2L, 20L, 150L, None, true),
      (3L, 30L, 100L, Some(100L), false),
      (3L, 31L, 100L, None, true)))
  }

  // ---- survivorship ----------------------------------------------------

  private def surv(a: Seq[(Long, Option[String], Option[Long])],
      b: Seq[(Long, Option[String], Option[Long])]) =
    Merge.survivorship(
      Seq(a.toDF("k", "name", "bal"), b.toDF("k", "name", "bal")),
      pk = Seq("k"), fields = Seq("name", "bal"))
      .as[(Long, Option[String], Option[Long])].collect().toSet

  test("survivorship: most trusted non-null wins per FIELD, gaps fall through") {
    val master = Seq(
      (1L, Some("m1"), None),          // bal gap -> feed's
      (2L, None, Some(20L)),           // name gap -> feed's
      (3L, Some("m3"), Some(30L)))     // complete -> all master
    val feed = Seq(
      (1L, Some("f1"), Some(11L)),
      (2L, Some("f2"), Some(21L)),
      (3L, Some("f3"), Some(31L)),
      (4L, Some("f4"), Some(41L)))     // only in the feed
    assert(surv(master, feed) === Set(
      (1L, Some("m1"), Some(11L)),
      (2L, Some("f2"), Some(20L)),
      (3L, Some("m3"), Some(30L)),
      (4L, Some("f4"), Some(41L))))
  }

  test("survivorship: a field null in every source stays null") {
    assert(surv(Seq((1L, None, Some(5L))), Seq((1L, None, None))) ===
      Set((1L, None, Some(5L))))
  }

  test("survivorship fails the job when a key repeats within one source") {
    val dup = Seq((1L, Some("a"), Some(1L)), (1L, Some("b"), Some(2L)))
    val other = Seq((1L, Some("c"), Some(3L)))
    val e = intercept[Exception] {
      surv(dup, other)
    }
    assert(e.getMessage.contains("appears more than once") || e.getCause != null)
  }

  test("survivorship duplicate guard survives projecting AWAY the first field") {
    // column pruning must not drop the raise_error with the pruned field
    val dup = Seq((1L, Some("a"), Some(1L)), (1L, Some("b"), Some(2L)))
      .toDF("k", "name", "bal")
    val other = Seq((1L, Some("c"), Some(3L))).toDF("k", "name", "bal")
    val e = intercept[Exception] {
      Merge.survivorship(Seq(dup, other), Seq("k"), Seq("name", "bal"))
        .select("k", "bal").collect()
    }
    assert(e.getMessage.contains("appears more than once") || e.getCause != null)
  }

  test("survivorship fails the job on a null key") {
    val a = Seq((Some(1L), "x")).toDF("k", "name")
    val b = Seq((Option.empty[Long], "y")).toDF("k", "name")
    val e = intercept[Exception] {
      Merge.survivorship(Seq(a, b), Seq("k"), Seq("name")).collect()
    }
    assert(e.getMessage.contains("null in key") || e.getCause != null)
  }
}
