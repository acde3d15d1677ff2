package graft.misc

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions
import graft.iterative.Rounds
import graft.similarity.Ann
import graft.sinks.DirectOutput

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("tokens/ngrams handle empty and short strings") {
    val df = Seq("", "a", "one two", "  padded  ").toDF("t")
    val out = df.select(
      TextFunctions.tokenCount($"t").as("n"),
      size(TextFunctions.charNgrams($"t", 3)).as("ng"),
      size(TextFunctions.wordShingles($"t", 2)).as("sh")).collect()
    assert(out.map(_.getInt(0)).toSeq === Seq(0, 1, 2, 1))
    assert(out.map(_.getInt(1)).toSeq === Seq(0, 0, 5, 8))
    assert(out.map(_.getInt(2)).toSeq === Seq(0, 0, 1, 0))
  }

  test("tokenChunks: overlapping windows, short tail, empty input") {
    val df = Seq(
      "a b c d e f g h i j", // 10 tokens: chunks at 0 (4) and 3 (4) and 6 (4) and 9 (1)
      "a b", // shorter than one chunk
      "").toDF("t")
    val out = df.select(
      TextFunctions.tokenChunks(TextFunctions.tokens($"t"), 4, 3).as("c"))
      .as[Seq[String]].collect()
    assert(out(0) === Seq("a b c d", "d e f g", "g h i j", "j"))
    assert(out(1) === Seq("a b"))
    assert(out(2) === Seq.empty)
  }

  test("langId picks the profile with most stopword hits, ties to first") {
    val df = Seq(
      "the cat and the dog in the house",   // en
      "der hund und die katze ist da",      // de
      "xyzzy plugh")                         // no hits anywhere -> first profile
      .toDF("t")
    assert(df.select(TextFunctions.langId($"t")).as[String].collect().toSeq ===
      Seq("en", "de", "en"))
  }

  test("winnowing fingerprints are deterministic and edit-local") {
    val a = "abcdefghijklmnopqrstuvwxyz0123456789abcdefghij"
    val b = a.replace("mnop", "mXop")
    val df = Seq(a, a, b).toDF("t")
    val fps = df.select(TextFunctions.winnowFingerprints($"t").as("f"))
      .as[Seq[Long]].collect()
    assert(fps(0) === fps(1)) // deterministic
    // local edit: fingerprint sets still share most hashes
    val shared = fps(0).toSet.intersect(fps(2).toSet).size.toDouble / fps(0).toSet.size
    assert(shared > 0.5)
  }

  test("emailCount/redactEmails find and scrub addresses, leave clean text alone") {
    val df = Seq(
      "reach me at a.b+c@example.co.uk or x@y.io today",
      "no pii here",
      "").toDF("t")
    val out = df.select(
      TextFunctions.emailCount($"t").as("n"),
      TextFunctions.redactEmails($"t").as("r")).collect()
    assert(out.map(_.getInt(0)).toSeq === Seq(2, 0, 0))
    assert(out(0).getString(1) === "reach me at [EMAIL] or [EMAIL] today")
    assert(out(1).getString(1) === "no pii here")
  }

  test("redactPii scrubs email, IPv4, and phone in a fixed chain order") {
    val df = Seq(
      "mail a@b.co ip 10.0.255.1 ph +12 345-6789 end",
      "u@10.0.0.1.com or bare 10.0.0.1", // email-first order keeps the host intact
      "x255.1.1.12y is not word-bounded, keep it",
      "no pii").toDF("t")
    val out = df.select(TextFunctions.redactPii($"t")).as[String].collect()
    assert(out(0) === "mail [EMAIL] ip [IP] ph [PHONE] end")
    assert(out(1) === "[EMAIL] or bare [IP]")
    assert(out(2) === "x255.1.1.12y is not word-bounded, keep it")
    assert(out(3) === "no pii")
  }

  test("repetitionStats counts total/distinct/top token frequencies per doc") {
    val df = Seq(
      (1L, "spam spam spam ham"),
      (2L, "all tokens differ here")).toDF("doc_id", "text")
    val got = TextFunctions.repetitionStats(df, Seq("doc_id"), $"text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(1L -> ((4L, 2L, 3L)), 2L -> ((4L, 4L, 1L))))
  }
}

class AnnSpec extends SparkSpec {
  import spark.implicits._

  test("IVF recall against exact top-k on fixture embeddings") {
    val dir = "/root/testdata/sf0.001"
    val emb = graft.GraftSession.table(spark, dir, "embeddings")
    val q = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 20)
    val exact = Ann.bruteForce(q, emb, "vec_id", "embedding", "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = graft.similarity.Ivf.topK(q, emb, "vec_id", "embedding", "vec_id", "embedding",
      k = 5, nCells = 8, nProbe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(ivf).size.toDouble / exact.size
    // random vectors are the worst case; half the cells probed -> high recall
    assert(recall > 0.6, s"IVF recall $recall")
  }

  test("int8-quantized IVF matches the float IVF top-k almost everywhere") {
    val dir = "/root/testdata/sf0.001"
    val emb = graft.GraftSession.table(spark, dir, "embeddings")
    val q = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 20)
    def run(quant: Boolean) = {
      val f = if (quant) graft.similarity.Ivf.topKQuantized _ else graft.similarity.Ivf.topK _
      f(q, emb, "vec_id", "embedding", "vec_id", "embedding", 5, 8, 4, 11L, true, 10000, 1)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    }
    val (fl, qt) = (run(false), run(true))
    // int8 error (~scale/2 per component) may flip near-ties only: the two
    // result sets must agree on the overwhelming majority of pairs
    val agree = fl.intersect(qt).size.toDouble / fl.size
    assert(agree > 0.9, s"quantized/float agreement $agree")
  }

  test("IVF is deterministic across runs") {
    val dir = "/root/testdata/sf0.001"
    val emb = graft.GraftSession.table(spark, dir, "embeddings")
    val q = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 5)
    def run() = graft.similarity.Ivf.topK(q, emb, "vec_id", "embedding", "vec_id", "embedding",
      k = 3, nCells = 8, nProbe = 2).collect().toSet
    assert(run() === run())
  }

  test("knnJoin: symmetric edges, exact jaccard, deterministic top-k") {
    import org.apache.spark.sql.functions.col
    import graft.functions.TextFunctions.{shingleHashesOf, tokens}
    // doc 1 and 2 share most 2-shingles; 3 shares some; 4 is disjoint
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d e f g x"),
      (3L, "e f g h p q r s"),
      (4L, "t u v w y z m n")).toDF("doc_id", "text")
    val out = graft.similarity.KnnJoin.knnJoin(
      docs.withColumn("_toks", tokens(col("text"))),
      id = "doc_id", shingles = shingleHashesOf(col("_toks"), 2), k = 2, minSim = 0.1)
      .select("doc", "neighbor", "rank").as[(Long, Long, Int)].collect().toSet
    // edges are symmetric: 1<->2 rank 1 both ways; 4 has no neighbor
    assert(out.contains((1L, 2L, 1)) && out.contains((2L, 1L, 1)))
    assert(out.contains((1L, 3L, 2)) && out.contains((3L, 1L, 1)))
    assert(!out.exists(_._1 == 4L))
    // rank never exceeds k and is unique per doc
    assert(out.groupBy(_._1).forall { case (_, rs) =>
      rs.map(_._3).toSeq.sorted == (1 to rs.size).toSeq && rs.size <= 2 })
  }

  test("knnJoin: ubiquitous shingle is cut and contributes no edges") {
    import org.apache.spark.sql.functions.col
    // "common" appears in all 12 docs (df 12 > maxShingleFreq 5): docs
    // related ONLY through it must have no edge, and the survivors'
    // jaccard must exclude it from the denominator
    val docs = ((0L to 9L).map(i => (i, Seq("common", s"solo$i"))) ++ Seq(
      (20L, Seq("common", "x", "y")),
      (21L, Seq("common", "x", "y")))).toDF("doc_id", "sh")
    val out = graft.similarity.KnnJoin.knnJoin(
      docs, id = "doc_id", shingles = col("sh"), k = 2, minSim = 0.1,
      maxShingleFreq = 5)
      .select("doc", "neighbor", "jaccard").as[(Long, Long, Double)].collect()
    // only the planted pair survives, at jaccard 1.0 over {x, y}
    assert(out.toSet === Set((20L, 21L, 1.0), (21L, 20L, 1.0)))
  }

  test("bruteForce ranks planted neighbor first") {
    val q = (0 until 8).map(i => math.sin(i + 1.0).toFloat).toArray
    val near = q.map(x => x * 1.001f)
    val mid = (0 until 8).map(i => (math.sin(i + 1.0) + 0.5).toFloat).toArray
    val far = (0 until 8).map(i => math.cos(i * 2.0).toFloat).toArray
    val corpus = Seq((10L, near.toSeq), (11L, mid.toSeq), (12L, far.toSeq))
      .toDF("vec_id", "embedding")
    val queries = Seq((0L, q.toSeq)).toDF("vec_id", "embedding")
    val top = Ann.bruteForce(queries, corpus, "vec_id", "embedding", "vec_id", "embedding", k = 2)
      .orderBy("rank").select("neighbor_id").as[Long].collect()
    assert(top === Array(10L, 11L))
  }

  test("hardNegatives skips same-label vectors however close they sit") {
    val q = (0 until 8).map(i => math.sin(i + 1.0).toFloat).toArray
    val near = q.map(x => x * 1.001f)           // same label — must be skipped
    val mid = (0 until 8).map(i => (math.sin(i + 1.0) + 0.5).toFloat).toArray
    val far = (0 until 8).map(i => math.cos(i * 2.0).toFloat).toArray
    val corpus = Seq((10L, near.toSeq, 1), (11L, mid.toSeq, 2), (12L, far.toSeq, 2))
      .toDF("vec_id", "embedding", "label")
    val queries = Seq((0L, q.toSeq, 1)).toDF("vec_id", "embedding", "label")
    val out = Ann.hardNegatives(queries, corpus, "vec_id", "embedding", "label",
      "vec_id", "embedding", "label", k = 2)
      .orderBy("rank").select("neighbor_id", "neighbor_label")
      .as[(Long, Int)].collect()
    // nearest DIFFERENT-label first; the same-label twin never appears
    assert(out === Array((11L, 2), (12L, 2)))
  }
}

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin matches latest prior right row; null right times never match") {
    val left = Seq((1L, 10L, 100), (2L, 10L, 5)).toDF("id", "k", "t")
    val right = Seq((50L, 10L, Some(90)), (51L, 10L, Some(95)), (52L, 10L, None))
      .toDF("rid", "k", "t")
    val out = graft.operators.AsOf.asofJoin(left, right, Seq("k"), "t", "t",
      rightPayload = Seq("rid"), rightTieBreak = Seq("rid"))
      .select("id", "rid").as[(Long, Option[Long])].collect().toMap
    assert(out(1L) === Some(51L)) // latest prior (95 <= 100)
    assert(out(2L) === None)      // nothing at or before t=5; null-time row excluded
  }

  test("asofJoin equals the SCD-2 validity-predicate lookup on duplicate version times") {
    // two versions at the SAME time t=10: the zero-width interval [10,10)
    // must never match; the greater-tiebreak version wins for ts >= 10
    val versions = Seq((70L, 10L, 10), (71L, 10L, 10), (72L, 10L, 20))
      .toDF("rid", "k", "t")
    val facts = Seq((1L, 10L, 9), (2L, 10L, 10), (3L, 10L, 15), (4L, 10L, 25))
      .toDF("id", "k", "t")
    val got = graft.operators.AsOf.asofJoin(facts, versions, Seq("k"), "t", "t",
      rightPayload = Seq("rid"), rightTieBreak = Seq("rid"))
      .select("id", "rid").as[(Long, Option[Long])].collect().toMap
    assert(got === Map(1L -> None, 2L -> Some(71L), 3L -> Some(71L), 4L -> Some(72L)))
  }
}

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("rangeJoin finds rows across bucket boundaries, honors open upper bound") {
    // window = [t-60s, t) with the default 60s buckets: left t=1000 spans
    // buckets 15 and 16; candidates at 941 (bucket 15) and 990 (bucket 16)
    // match, 900 is below the window, 1000 is excluded by the open bound.
    val left = Seq((1L, 10L, 1000L), (2L, 99L, 1000L))
      .toDF("id", "k", "sec").withColumn("t", timestamp_seconds(col("sec")))
    val right = Seq((50L, 10L, 941L), (51L, 10L, 990L), (52L, 10L, 900L), (53L, 10L, 1000L))
      .toDF("rid", "k", "rsec").withColumn("rt", timestamp_seconds(col("rsec")))
    val out = graft.operators.RangeJoin.rangeJoin(
      left, right, Seq("k"), "t", "rt",
      lowerMicros = -60L * 1000000L, upperMicros = 0L,
      includeUpper = false, joinType = "left_outer")
      .groupBy(col("id")).agg(count(col("rid")).as("n"), collect_set(col("rid")).as("rids"))
      .as[(Long, Long, Set[Long])].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) === ((2L, Set(50L, 51L))))
    assert(out(2L) === ((0L, Set.empty[Long]))) // unmatched key, still present once
  }

  test("rangeJoin works as a numeric band join (non-timestamp columns)") {
    val left = Seq((1L, 10L, 500L)).toDF("id", "k", "pos")
    val right = Seq((50L, 10L, 495L), (51L, 10L, 505L), (52L, 10L, 600L))
      .toDF("rid", "k", "rpos")
    val rids = graft.operators.RangeJoin.rangeJoin(
      left, right, Seq("k"), "pos", "rpos",
      lowerMicros = -10L, upperMicros = 10L)
      .select("rid").as[Long].collect().toSet
    assert(rids === Set(50L, 51L))
  }
}

class DirectOutputSpec extends SparkSpec {
  import spark.implicits._

  test("transaction: commit marker lifecycle and rollback of orphan attempts") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tx_test").toString
    val conf = spark.sparkContext.hadoopConfiguration
    val df = Seq((1, "a"), (2, "b")).toDF("k", "v")

    DirectOutput.write("t1", s"$dir/_tx", Seq(DirectOutput.Spec(df, s"$dir/out")))
    assert(spark.read.parquet(s"$dir/out").count() === 2)
    assert(new java.io.File(s"$dir/out/_GRAFT_COMMITTED").exists())
    assert(!new java.io.File(s"$dir/_tx/.graft-tx-t1").exists()) // marker cleared

    // orphan attempt (no marker) must be rolled back by recover
    new java.io.File(s"$dir/out/.attempt-dead").mkdirs()
    DirectOutput.recover(conf, s"$dir/_tx", Seq(s"$dir/out"))
    assert(!new java.io.File(s"$dir/out/.attempt-dead").exists())
    assert(spark.read.parquet(s"$dir/out").count() === 2) // data intact
  }

  test("recover rolls FORWARD a crash between marker creation and rename") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tx_fw").toString
    val conf = spark.sparkContext.hadoopConfiguration
    // simulate the crash window: attempt written, marker live, renames not run
    Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
      .write.parquet(s"$dir/out/.attempt-crashed")
    new java.io.File(s"$dir/_tx").mkdirs()
    new java.io.File(s"$dir/_tx/.graft-tx-crashed").createNewFile()

    DirectOutput.recover(conf, s"$dir/_tx", Seq(s"$dir/out"))
    assert(spark.read.parquet(s"$dir/out").count() === 3) // rolled forward
    assert(new java.io.File(s"$dir/out/_GRAFT_COMMITTED").exists())
    assert(!new java.io.File(s"$dir/out/.attempt-crashed").exists())
    assert(!new java.io.File(s"$dir/_tx/.graft-tx-crashed").exists()) // marker cleared
  }

  test("scoped recover leaves a foreign writer's in-flight transaction alone") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tx_scope").toString
    val conf = spark.sparkContext.hadoopConfiguration
    // two writers share the path: ours crashed pre-commit (attempt, no
    // marker), theirs is mid-commit (attempt + live marker)
    Seq((1, "a")).toDF("k", "v").write.parquet(s"$dir/out/.attempt-mine-0")
    Seq((2, "b")).toDF("k", "v").write.parquet(s"$dir/out/.attempt-theirs-7")
    new java.io.File(s"$dir/_tx").mkdirs()
    new java.io.File(s"$dir/_tx/.graft-tx-theirs-7").createNewFile()

    DirectOutput.recover(conf, s"$dir/_tx", Seq(s"$dir/out"), txFilter = _.startsWith("mine-"))
    // ours rolled back; theirs untouched — marker AND attempt still live
    assert(!new java.io.File(s"$dir/out/.attempt-mine-0").exists())
    assert(new java.io.File(s"$dir/out/.attempt-theirs-7").exists())
    assert(new java.io.File(s"$dir/_tx/.graft-tx-theirs-7").exists())
  }

  test("a failed prepare deletes sibling attempts before rethrowing") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tx_fail").toString
    val ok = Seq((1, "a")).toDF("k", "v")
    // second spec fails at write time: its dataframe throws on execution
    val bad = ok.filter(raise_error(lit("boom")).isNull)
    intercept[Exception] {
      DirectOutput.write("t9", s"$dir/_tx", Seq(
        DirectOutput.Spec(ok, s"$dir/out_ok"), DirectOutput.Spec(bad, s"$dir/out_bad")))
    }
    // the successful sibling's attempt dir is pre-commit garbage: gone now,
    // not parked until a later recover()
    val leftovers = Option(new java.io.File(s"$dir/out_ok").listFiles())
      .map(_.map(_.getName).filter(_.startsWith(".attempt")).toSeq).getOrElse(Seq.empty)
    assert(leftovers.isEmpty, s"orphaned attempts: $leftovers")
    assert(!new java.io.File(s"$dir/out_ok/_GRAFT_COMMITTED").exists()) // nothing committed
  }
}

class BranchWriteAllSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Records._

  test("writeAll commits a 3-port sink fan-out from ONE Spark job") {
    val root = java.nio.file.Files.createTempDirectory("graft_branch_out").toString
    val ports = (1 to 300).toDF("x").branch(
      when($"x" % 3 === 0, "fizz").when($"x" % 5 === 0, "buzz").otherwise("rest"))
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    org.apache.spark.ListenerBusTestHook.waitUntilEmpty(spark.sparkContext)
    spark.sparkContext.addSparkListener(listener)
    try {
      ports.writeAll("tx1", s"$root/_tx", Seq(
        "fizz" -> s"$root/fizz", "buzz" -> s"$root/buzz", "rest" -> s"$root/rest"))
      org.apache.spark.ListenerBusTestHook.waitUntilEmpty(spark.sparkContext)
      // the reference's one-materialization fan-out: one staged
      // partitionBy write, driver-side renames — NOT one job per port
      assert(jobs.get() === 1, s"expected ONE staged write job, saw ${jobs.get()}")
    } finally spark.sparkContext.removeSparkListener(listener)
    val fizz = spark.read.parquet(s"$root/fizz")
    assert(fizz.columns.toSeq === Seq("x"), "tag column must not be in the files")
    assert(fizz.count() === 100L)
    assert(spark.read.parquet(s"$root/buzz").count() === 40L)
    assert(spark.read.parquet(s"$root/rest").count() === 160L)
    // transactional: every port carries the committed marker, staging gone
    for (p <- Seq("fizz", "buzz", "rest"))
      assert(new java.io.File(s"$root/$p/_GRAFT_COMMITTED").exists())
    assert(!new java.io.File(s"$root/_tx/.branch-stage-tx1").exists())
    assert(!new java.io.File(s"$root/_tx/.graft-tx-tx1").exists())
  }

  test("writeAll: a listed port with no rows commits an empty marked dir") {
    val root = java.nio.file.Files.createTempDirectory("graft_branch_empty").toString
    (1 to 10).toDF("x").branch(lit("all"))
      .writeAll("tx1", s"$root/_tx", Seq("all" -> s"$root/all", "none" -> s"$root/none"))
    assert(spark.read.parquet(s"$root/all").count() === 10L)
    assert(new java.io.File(s"$root/none/_GRAFT_COMMITTED").exists())
    assert(!new java.io.File(s"$root/none").listFiles().exists(_.getName.startsWith("part-")))
  }
}

class RoundsSpec extends SparkSpec {
  import spark.implicits._

  test("cacheOnce builds a NEVER input exactly once across rounds") {
    var builds = 0
    val rounds = new Rounds(spark)
    val out = rounds.run(Seq(Map("x" -> "1"), Map("x" -> "2"), Map("x" -> "1"))) { (ctx, r) =>
      val base = r.cacheOnce("base") { builds += 1; Seq(1, 2, 3).toDF("n") }
      base.filter($"n" <= ctx("x").toInt)
    }
    assert(builds === 1)
    assert(out.map(_._2.count()) === Seq(1L, 2L, 1L))
    rounds.close()
  }

  test("cacheByParameter memoizes per distinct parameter signature") {
    var builds = 0
    val rounds = new Rounds(spark)
    rounds.run(Seq(Map("p" -> "a"), Map("p" -> "b"), Map("p" -> "a"))) { (ctx, r) =>
      r.cacheByParameter("dim", ctx, Seq("p")) { c => builds += 1; Seq(c("p")).toDF("v") }
    }
    assert(builds === 2)
    rounds.close()
  }

  test("runAll overlaps ALWAYS rounds and returns results in round order") {
    val inFlight = new java.util.concurrent.atomic.AtomicInteger()
    val sawOverlap = new java.util.concurrent.atomic.AtomicInteger()
    val rounds = new Rounds(spark)
    val out = rounds.runAll(Seq(Map("x" -> "1"), Map("x" -> "2"))) { (ctx, _) =>
      inFlight.incrementAndGet()
      try {
        Thread.sleep(150)
        if (inFlight.get() > 1) sawOverlap.incrementAndGet()
        // ALWAYS vertex: rebuilt in the round, action executed here
        spark.range(100).filter($"id" % ctx("x").toInt === 0).count()
      } finally { inFlight.decrementAndGet(); () }
    }
    assert(sawOverlap.get() > 0, "two unbounded rounds never overlapped")
    assert(out.map { case (ctx, n) => ctx("x") -> n } === Seq("1" -> 100L, "2" -> 50L))
    rounds.close()
  }

  test("runAll slot bound: peak in-flight rounds never exceeds parallelism") {
    // the reference's numSlots backpressure (IterativeBatchExecutor's
    // bounded round queue): an 8-round sweep with parallelism=2 must
    // hold at most 2 concurrent actions, not submit all 8 at once
    val inFlight = new java.util.concurrent.atomic.AtomicInteger()
    val peak = new java.util.concurrent.atomic.AtomicInteger()
    val rounds = new Rounds(spark)
    val out = rounds.runAll(
        (1 to 8).map(i => Map("x" -> i.toString)), parallelism = 2) { (ctx, _) =>
      val now = inFlight.incrementAndGet()
      peak.accumulateAndGet(now, math.max)
      try {
        Thread.sleep(50)
        spark.range(10).count() + ctx("x").toLong
      } finally { inFlight.decrementAndGet(); () }
    }
    assert(peak.get() <= 2, s"slot bound violated: peak=${peak.get()}")
    assert(out.map(_._2) === (1 to 8).map(10L + _))
    rounds.close()
  }

  test("concurrent rounds build a shared NEVER input exactly once") {
    val builds = new java.util.concurrent.atomic.AtomicInteger()
    val rounds = new Rounds(spark)
    val out = rounds.runAll((1 to 4).map(i => Map("x" -> i.toString))) { (ctx, r) =>
      val base = r.cacheOnce("base") {
        builds.incrementAndGet()
        Seq(1, 2, 3, 4).toDF("n")
      }
      base.filter($"n" <= ctx("x").toInt).count()
    }
    assert(builds.get() === 1, "computeIfAbsent must build once under contention")
    assert(out.map(_._2) === Seq(1L, 2L, 3L, 4L))
    rounds.close()
  }

  test("checkpointDir makes cached inputs survive total block loss") {
    // reliable mode: after close() drops every block the sweep persisted,
    // a result frame built on a cached input must still read — from the
    // checkpoint files, not dead blocks (the executor-loss story for a
    // 1000-round production sweep)
    val dir = java.nio.file.Files.createTempDirectory("graft-rounds-ckpt").toString
    val rounds = new Rounds(spark, checkpointDir = Some(dir))
    val out = rounds.run(Seq(Map("x" -> "2"))) { (ctx, r) =>
      val base = r.cacheOnce("base") { Seq(1, 2, 3).toDF("n") }
      base.filter($"n" <= ctx("x").toInt)
    }
    val result = out.head._2
    assert(result.count() === 2L)
    rounds.close() // unpersists the sweep's blocks
    assert(result.count() === 2L)
  }
}

class Bm25Spec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("bm25 ranks the term-dense short doc first, respects idf") {
    val docs = Seq(
      (1L, "apple apple apple banana"),
      (2L, "apple banana banana cherry cherry cherry cherry"),
      (3L, "banana cherry date date date date date date date date")).toDF("doc_id", "text")
    val top = graft.functions.Bm25.topDocs(docs, "doc_id", col("text"),
      terms = Seq("apple"), k = 3)
      .orderBy("rank").select("doc_id").as[Long].collect()
    // doc1: tf=3 in 4 tokens beats doc2: tf=1 in 7 tokens
    assert(top === Array(1L, 2L))
    val scores = graft.functions.Bm25.scores(docs, "doc_id", col("text"))
      .as[(Long, String, Double)].collect()
      .map { case (d, t, s) => (d, t) -> s }.toMap
    // idf: 'apple' (2 docs) out-scores 'banana' (3 docs) at equal tf/dl
    assert(scores((1L, "apple")) > scores((1L, "banana")))
    // all scores positive and finite
    assert(scores.values.forall(s => s > 0 && java.lang.Double.isFinite(s)))
  }
}

class QuantizeSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.functions.VectorFunctions

  test("int8 quantize/dequantize bounds reconstruction error at scale/2") {
    val vecs = Seq(
      (1L, Seq(0.5, -1.0, 0.25, 0.125)),
      (2L, Seq(127.0, -127.0, 1.0, 0.0)),
      (3L, Seq(0.0, 0.0, 0.0, 0.0))).toDF("id", "v")
    val out = VectorFunctions.quantizeInt8Col(vecs, col("v"), "q")
      .withColumn("deq", VectorFunctions.dequantizeInt8(col("q")))
      .select(col("id"), col("q.scale").as("scale"),
        zip_with(col("v"), col("deq"), (a, b) => abs(a - b)).as("err"))
      .as[(Long, Double, Seq[Double])].collect()
    for ((id, scale, errs) <- out; e <- errs)
      assert(e <= scale / 2 + 1e-12, s"id=$id err=$e scale=$scale")
    // zero vector round-trips to zeros, not NaN
    val z = out.find(_._1 == 3L).get
    assert(z._3.forall(_ == 0.0))
  }
}
