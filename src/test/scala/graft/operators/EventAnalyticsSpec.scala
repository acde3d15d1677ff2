package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  // (user, tsUs, type)
  private def ev(rows: (Long, Long, String)*) =
    rows.toSeq.toDF("u", "ts", "t")

  test("funnel: strict ordering, window bound, monotone counts") {
    val events = ev(
      // u1 completes all three in order
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      // u2 clicks BEFORE viewing — click must not count
      (2L, 10L, "click"), (2L, 20L, "view"),
      // u3 converts outside the window (view at 0, purchase at 1000)
      (3L, 0L, "view"), (3L, 5L, "click"), (3L, 1000L, "purchase"),
      // u4 never views
      (4L, 10L, "purchase"))
    val out = Funnel.reach(events, col("u"), col("ts"),
      Seq("view" -> (col("t") === "view"), "click" -> (col("t") === "click"),
        "purchase" -> (col("t") === "purchase")),
      windowUs = Some(100L))
      .orderBy("step_seq")
      .as[(Int, String, Long)].collect()
    assert(out === Array((1, "view", 3L), (2, "click", 2L), (3, "purchase", 1L)))
  }

  test("funnel: same-timestamp step events do not satisfy strictly-after") {
    val events = ev((1L, 10L, "view"), (1L, 10L, "click"))
    val out = Funnel.reach(events, col("u"), col("ts"),
      Seq("view" -> (col("t") === "view"), "click" -> (col("t") === "click")))
      .orderBy("step_seq").as[(Int, String, Long)].collect()
    assert(out === Array((1, "view", 1L), (2, "click", 0L)))
  }

  test("matchPattern: greedy chain with negation, strict interior bounds") {
    val steps = Seq("a" -> (col("t") === "A"), "b" -> (col("t") === "B"),
      "c" -> (col("t") === "C"))
    def run(events: org.apache.spark.sql.DataFrame) =
      Sequences.matchPattern(events, col("u"), col("ts"), steps,
          exclude = col("t") === "X", windowUs = Some(100L))
        .as[(Long, Long, Long, Long)].collect().toSet
    val events = ev(
      // u1: clean chain
      (1L, 10L, "A"), (1L, 20L, "B"), (1L, 30L, "C"),
      // u2: X strictly inside (t0, t2) — excluded
      (2L, 10L, "A"), (2L, 20L, "B"), (2L, 25L, "X"), (2L, 30L, "C"),
      // u3: X exactly AT t0 and AT t2 — strict interior, match survives
      (3L, 10L, "A"), (3L, 10L, "X"), (3L, 20L, "B"), (3L, 30L, "C"),
      (3L, 30L, "X"),
      // u4: X before the chain and after it — irrelevant
      (4L, 1L, "X"), (4L, 10L, "A"), (4L, 20L, "B"), (4L, 30L, "C"),
      (4L, 99L, "X"),
      // u5: chain exceeds the window (C at 200 > 10 + 100)
      (5L, 10L, "A"), (5L, 20L, "B"), (5L, 200L, "C"),
      // u6: steps out of order
      (6L, 10L, "B"), (6L, 20L, "A"), (6L, 30L, "C"))
    assert(run(events) === Set(
      (1L, 10L, 20L, 30L),
      (3L, 10L, 20L, 30L),
      (4L, 10L, 20L, 30L)))
    graft.Caches.clear(spark)
  }

  test("matchPattern: greedy mins pick the EARLIEST chain, negation judges that chain only") {
    val steps = Seq("a" -> (col("t") === "A"), "b" -> (col("t") === "B"))
    // the earliest chain (A@10, B@20) contains X@15 — excluded, even
    // though a later clean chain (A@30, B@40) exists: greedy first-match
    // semantics, deterministic and documented
    val events = ev(
      (1L, 10L, "A"), (1L, 15L, "X"), (1L, 20L, "B"),
      (1L, 30L, "A"), (1L, 40L, "B"))
    val out = Sequences.matchPattern(events, col("u"), col("ts"), steps,
      exclude = col("t") === "X").collect()
    assert(out.isEmpty)
    graft.Caches.clear(spark)
  }

  test("cohorts: retention triangle with floor-division buckets") {
    val events = ev(
      (1L, 5L, "x"), (1L, 15L, "x"), (1L, 25L, "x"),   // cohort 0, offsets 0,1,2
      (2L, 12L, "x"), (2L, 27L, "x"),                   // cohort 1, offsets 0,1
      (3L, 21L, "x"))                                   // cohort 2, offset 0
    val out = Cohorts.retention(events, col("u"), col("ts"), bucketUs = 10L)
      .orderBy("cohort_bucket", "bucket_offset")
      .as[(Long, Long, Long)].collect()
    assert(out === Array(
      (0L, 0L, 1L), (0L, 1L, 1L), (0L, 2L, 1L),
      (1L, 0L, 1L), (1L, 1L, 1L),
      (2L, 0L, 1L)))
  }

  test("cohorts: pre-epoch timestamps bucket by floor, not truncation") {
    val events = ev((1L, -5L, "x"), (1L, 5L, "x"))
    val out = Cohorts.retention(events, col("u"), col("ts"), bucketUs = 10L)
      .orderBy("bucket_offset").as[(Long, Long, Long)].collect()
    // first seen at -5 → cohort -1; the +5 event lands one bucket later
    assert(out === Array((-1L, 0L, 1L), (-1L, 1L, 1L)))
  }

  test("transitions: per-user ordered bigrams with tie-break") {
    val events = spark.createDataFrame(Seq(
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"), (1L, 30L, 3L, "a"),
      (2L, 10L, 4L, "b"), (2L, 10L, 5L, "a")   // tie → event_id order: b then a
    )).toDF("u", "ts", "eid", "t")
    val out = Sequences.transitions(events, col("u"), col("ts"), col("t"),
        tieBreak = Seq(col("eid")))
      .orderBy("from_type", "to_type").as[(String, String, Long)].collect()
    assert(out === Array(("a", "b", 1L), ("b", "a", 2L)))
  }

  test("transitions: expression tie-breaks and colliding names are safe") {
    val events = spark.createDataFrame(Seq(
      (1L, 10L, 4L, "b"), (1L, 10L, 5L, "a")
    )).toDF("u", "ts", "to_type_src", "t")
    // tie-break is an EXPRESSION (negated id → descending), and its input
    // column name shares a prefix with the payload alias
    val out = Sequences.transitions(events, col("u"), col("ts"), col("t"),
        tieBreak = Seq(-col("to_type_src")))
      .as[(String, String, Long)].collect()
    assert(out === Array(("a", "b", 1L)))
  }
}

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def namesDf(names: String*) =
    names.zipWithIndex.map { case (n, i) => (i.toLong, n) }.toDF("id", "s")

  test("deletion-neighborhood join finds every distance<=1 pair, no extras") {
    val df = namesDf("cat", "cut", "cart", "at", "dog", "dig", "cat")
    val out = FuzzyJoin.selfJoinDist1(df, col("id"), col("s"))
      .select("a", "b").as[(Long, Long)].collect().toSet
    // brute force over the same set
    val all = df.as[(Long, String)].collect()
    val expect = (for {
      (ia, sa) <- all; (ib, sb) <- all if ia < ib
      if levenshteinDist(sa, sb) <= 1
    } yield (ia, ib)).toSet
    assert(out === expect)
    assert(expect.contains((0L, 1L)))   // cat/cut substitution
    assert(expect.contains((0L, 3L)))   // cat/at deletion
    assert(expect.contains((0L, 6L)))   // cat/cat equal
    assert(!expect.contains((0L, 4L)))  // cat/dog distance 2
  }

  test("empty and single-char strings are handled") {
    val df = namesDf("", "a", "b", "ab")
    val out = FuzzyJoin.selfJoinDist1(df, col("id"), col("s"))
      .select("a", "b").as[(Long, Long)].collect().toSet
    // ""~"a", ""~"b", "a"~"b", "a"~"ab", "b"~"ab"
    assert(out === Set((0L, 1L), (0L, 2L), (1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("hot variant buckets are dropped and reported, not exploded") {
    val df = (0L until 100L).map(i => (i, "same")).toDF("id", "s")
    val out = FuzzyJoin.selfJoinDist1(df, col("id"), col("s"), maxBucket = 10)
    assert(out.count() === 0L)   // every bucket over-bound → all dropped
  }

  test("maxDist=2: composed deletion neighborhood matches brute force") {
    // exercises two substitutions (cat/cot/cut chains), delete+substitute
    // (cart/cut), double deletion (cart/at? dist 2 via 2 deletes), and
    // pairs at distance 3 that must NOT link (cat/dug... use dog vs cat)
    val df = namesDf("cat", "cut", "cart", "at", "dog", "dug", "coat", "c")
    val out = FuzzyJoin.selfJoin(df, col("id"), col("s"), maxDist = 2)
      .select("a", "b", "dist").as[(Long, Long, Int)].collect().toSet
    val all = df.as[(Long, String)].collect()
    val expect = (for {
      (ia, sa) <- all; (ib, sb) <- all if ia < ib
      d = levenshteinDist(sa, sb) if d <= 2
    } yield (ia, ib, d)).toSet
    assert(out === expect)
    assert(expect.contains((1L, 2L, 2)))  // cut/cart substitute+insert
    assert(expect.contains((2L, 3L, 2)))  // cart/at two deletions
    assert(!expect.exists(p => p._1 == 0L && p._2 == 4L)) // cat/dog d=3
  }

  private def levenshteinDist(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0 }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }
}
