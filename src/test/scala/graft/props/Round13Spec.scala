package graft.props

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec
import graft.functions.TextFunctions
import graft.operators.Blocklist
import graft.similarity.Bitext

/** Round-13 operators: hand-checked cases plus seam fuzz, same
  * discipline as the earlier rounds' property suites.
  *
  *  - [[Blocklist.filterBlocked]]: an entry blocks its exact host and
  *    every subdomain, never a sibling or a partial-label match;
  *  - [[graft.functions.TopNgramStats]]: the codegen'd per-row count map
  *    must agree EXACTLY with a naive Scala n-gram counter on random
  *    token lists drawn from a tiny alphabet (forcing repeats);
  *  - [[Bitext.mine]]: mutual top-1 + margin on constructed vectors —
  *    a planted translation survives, a one-directional best (hub) dies
  *    on mutuality, a close runner-up dies on margin.
  */
class Round13Spec extends SparkSpec {
  import spark.implicits._
  import Props.samples

  // ---------------------------------------------------------- blocklist

  test("blocklist blocks exact host and subdomains, not siblings or label infixes") {
    val docs = Seq(
      (1L, "bad.com"),            // exact
      (2L, "a.bad.com"),          // subdomain
      (3L, "deep.a.bad.com"),     // deeper subdomain
      (4L, "notbad.com"),         // label infix — must SURVIVE
      (5L, "bad.com.evil.org"),   // blocked pattern as a NON-suffix — survives
      (6L, "good.org"),
      (7L, "cdn.pin.net"),        // exact multi-label entry
      (8L, "pin.net")             // parent of an entry — survives
    ).toDF("doc_id", "host")
    val bl = Seq("bad.com", "cdn.pin.net").toDF("pattern")
    val kept = Blocklist.filterBlocked(docs, "doc_id", col("host"), bl)
      .select("doc_id").as[Long].collect().sorted
    assert(kept === Array(4L, 5L, 6L, 8L))
  }

  test("empty blocklist keeps everything; duplicate patterns block once") {
    val docs = Seq((1L, "a.b"), (2L, "c.d")).toDF("doc_id", "host")
    assert(Blocklist.filterBlocked(docs, "doc_id", col("host"),
      Seq.empty[String].toDF("pattern")).count() === 2L)
    val dup = Seq("a.b", "a.b").toDF("pattern")
    assert(Blocklist.filterBlocked(docs, "doc_id", col("host"), dup)
      .select("doc_id").as[Long].collect() === Array(2L))
  }

  test("filterBlockedBroadcast == filterBlocked on random host/blocklist sets") {
    // small label alphabet forces suffix collisions between hosts and
    // patterns of every depth; ~1 in 8 hosts is NULL (a malformed URL
    // whose canonical host did not parse) — both paths must KEEP it
    val labelGen = Gen.oneOf("a", "b", "cc", "d1")
    val realHost = Gen.chooseNum(1, 4).flatMap(k => Gen.listOfN(k, labelGen)).map(_.mkString("."))
    val hostGen = Gen.frequency(7 -> realHost, 1 -> Gen.const(null: String))
    val caseGen = Gen.zip(
      Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, hostGen)),
      Gen.chooseNum(0, 5).flatMap(n => Gen.listOfN(n, realHost)))
    for (((hosts, patterns), i) <- samples(caseGen, 25).zipWithIndex) {
      val docs = hosts.zipWithIndex.map { case (h, j) => (j.toLong, h) }.toDF("doc_id", "host")
      val bl = patterns.toDF("pattern")
      def ids(df: org.apache.spark.sql.DataFrame) =
        df.select("doc_id").as[Long].collect().sorted.toSeq
      val viaJoin = ids(Blocklist.filterBlocked(docs, "doc_id", col("host"), bl))
      val viaBc = ids(Blocklist.filterBlockedBroadcast(docs, col("host"), bl))
      assert(viaBc === viaJoin, s"case $i hosts=$hosts patterns=$patterns")
    }
  }

  test("null host survives both blocklist paths") {
    val docs = Seq((1L, "bad.com"), (2L, null: String), (3L, "ok.org"))
      .toDF("doc_id", "host")
    val bl = Seq("bad.com").toDF("pattern")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids(Blocklist.filterBlocked(docs, "doc_id", col("host"), bl)) === Seq(2L, 3L))
    assert(ids(Blocklist.filterBlockedBroadcast(docs, col("host"), bl)) === Seq(2L, 3L))
  }

  test("filterBlockedBroadcast fails fast above maxPatterns") {
    val docs = Seq((1L, "a.b")).toDF("doc_id", "host")
    val bl = Seq("a.b", "c.d").toDF("pattern")
    val e = intercept[IllegalArgumentException] {
      Blocklist.filterBlockedBroadcast(docs, col("host"), bl, maxPatterns = 1)
    }
    assert(e.getMessage.contains("filterBlocked"))
  }

  // ------------------------------------------------------ TopNgramStats

  private def naiveNgram(toks: Seq[String], n: Int): (Int, Int, Int, Int, Int) = {
    // char counts in code points, matching UTF8String.numChars / DuckDB len
    val totalChars = toks.map(t => t.codePointCount(0, t.length)).sum +
      (if (toks.size > 1) toks.size - 1 else 0)
    val grams = toks.sliding(n).filter(_.size == n).map(_.mkString(" ")).toSeq
    val counts = grams.groupBy(identity).map { case (g, occ) => (g, occ.size) }
    val topCount = if (counts.isEmpty) 0 else counts.values.max
    val topCover = if (counts.isEmpty) 0
      else counts.map { case (g, c) => c * g.codePointCount(0, g.length) }.max
    (toks.size, totalChars, grams.size, topCount, topCover)
  }

  test("TopNgramStats equals the naive counter on random token lists") {
    val tokGen = Gen.oneOf("a", "bb", "ccc", "éé", "中文", "x")
    val listGen = Gen.chooseNum(0, 40).flatMap(k => Gen.listOfN(k, tokGen))
    for ((toks, i) <- samples(listGen, 60).zipWithIndex; n <- Seq(1, 2, 3)) {
      val df = Seq((i.toLong, toks)).toDF("id", "toks")
        .select(TextFunctions.topNgramStats(col("toks"), n).as("s"))
        .select("s.n_tokens", "s.total_chars", "s.n_ngrams", "s.top_count", "s.top_cover")
      val got = df.as[(Int, Int, Int, Int, Int)].collect()(0)
      assert(got === naiveNgram(toks, n), s"toks=$toks n=$n")
    }
  }

  test("TopNgramStats hand case: repeated bigram dominates") {
    // "spam ham spam ham spam": bigrams = [spam ham, ham spam, spam ham,
    // ham spam] -> top_count 2; covers: 2*8 = 16 both -> top_cover 16
    val got = Seq(Seq("spam", "ham", "spam", "ham", "spam")).toDF("toks")
      .select(TextFunctions.topNgramStats(col("toks"), 2).as("s"))
      .select("s.n_tokens", "s.total_chars", "s.n_ngrams", "s.top_count", "s.top_cover")
      .as[(Int, Int, Int, Int, Int)].collect()(0)
    assert(got === ((5, 22, 4, 2, 16)))
  }

  // ------------------------------------------------------------- bitext

  test("bitext mine: mutual top-1 with margin — plant survives, hub and near-tie die") {
    // 4-dim toy space. src s1 has a planted translation t1 (=2*s1, cos 1).
    // t9 is a HUB equal to s2's direction, but s9 is closer to t9 than s2
    // is from t9's viewpoint -> s2's match dies on mutuality.
    // s3's top-1 t3a barely beats t3b (cos ratio < 21/20) -> dies on margin.
    val src = Seq(
      (1L, Seq(1f, 0f, 0f, 0f)),
      (2L, Seq(0f, 1f, 0.3f, 0f)),
      (3L, Seq(0f, 0f, 0f, 1f)),
      (9L, Seq(0f, 1f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val tgt = Seq(
      (101L, Seq(2f, 0f, 0f, 0f)),     // plant for s1
      (109L, Seq(0f, 1f, 0f, 0f)),     // hub: top-1 for s2 AND s9; mutual only with s9
      (103L, Seq(0f, 0f, 0.1f, 1f)),   // s3 top-1...
      (104L, Seq(0f, 0f, 0.12f, 1f))   // ...but runner-up within 5% margin
    ).toDF("vec_id", "embedding")
    val got = Bitext.mine(src, tgt, "vec_id", "embedding", "vec_id", "embedding")
      .as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 101L), (9L, 109L)))
  }

  test("bitext mine: negative-cosine top-1 never mines") {
    val src = Seq((1L, Seq(1f, 0f))).toDF("vec_id", "embedding")
    val tgt = Seq((2L, Seq(-1f, 0f)), (3L, Seq(-1f, 0.1f))).toDF("vec_id", "embedding")
    assert(Bitext.mine(src, tgt, "vec_id", "embedding", "vec_id", "embedding").count() === 0L)
  }

  test("bitext mine fails fast above maxSrcRows") {
    val src = Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f))).toDF("vec_id", "embedding")
    val tgt = Seq((3L, Seq(1f, 0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Bitext.mine(src, tgt, "vec_id", "embedding", "vec_id", "embedding",
        maxSrcRows = 1L).count()
    }
    assert(e.getMessage.contains("smaller batches"))
  }
}
