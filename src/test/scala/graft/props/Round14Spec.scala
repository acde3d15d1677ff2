package graft.props

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec
import graft.functions.TextFunctions

/** Round-14 additions: the duplicate-n-gram half of the Gopher
  * repetition rules, and the bounded-allocation restructure of the
  * n-gram counting machinery.
  *
  *  - [[graft.functions.DupNgramStats]]: the codegen'd interval sweep
  *    must agree EXACTLY with a naive boolean-position-array union on
  *    random token lists from a tiny alphabet (forcing dup grams at
  *    every n, with heavy occurrence overlap);
  *  - hand cases pin the union semantics (overlapping occurrences never
  *    double-count; a self-concatenated text is covered wall to wall);
  *  - a multi-hundred-kB document exercises the hash-keyed + verified
  *    [[graft.functions.GramTable]] (no gram strings materialized; the
  *    string-keyed map it replaced allocated O(doc_chars x n) per row)
  *    and must still match the naive counter bit-for-bit.
  */
class Round14Spec extends SparkSpec {
  import spark.implicits._
  import Props.samples

  /** Positional-union ground truth: mark every covered char position of
    * the space-joined text in a boolean array, count marks. Char
    * positions are CODE POINTS (= UTF8String.numChars / DuckDB len).
    */
  private def naiveDup(toks: Seq[String], n: Int): Int = {
    val nGrams = toks.size - n + 1
    if (nGrams < 2) return 0
    val offs = toks.scanLeft(0)((o, t) => o + t.codePointCount(0, t.length) + 1)
    val total = offs.last - 1
    val grams = (0 until nGrams).map(i => (i, toks.slice(i, i + n).mkString(" ")))
    val counts = grams.groupBy(_._2).map { case (g, o) => (g, o.size) }
    val covered = new Array[Boolean](math.max(total, 0))
    for ((i, g) <- grams if counts(g) > 1; p <- offs(i) until (offs(i + n) - 1))
      covered(p) = true
    covered.count(identity)
  }

  private def engineDup(toks: Seq[String], minN: Int, maxN: Int): (Int, Int, Seq[Int]) =
    Seq(Tuple1(toks)).toDF("toks")
      .select(TextFunctions.dupNgramStats(col("toks"), minN, maxN).as("d"))
      .select("d.n_tokens", "d.total_chars", "d.dup_chars")
      .as[(Int, Int, Seq[Int])].collect()(0)

  test("DupNgramStats equals the naive positional union on random token lists") {
    // 3-token alphabet (with multi-byte entries so char != byte counting
    // is exercised) makes duplicate grams common at every n
    val tokGen = Gen.oneOf("a", "éé", "中文")
    val listGen = Gen.chooseNum(0, 60).flatMap(k => Gen.listOfN(k, tokGen))
    for ((toks, i) <- samples(listGen, 50).zipWithIndex) {
      val (nTok, total, dup) = engineDup(toks, 2, 6)
      val expectedTotal = toks.map(t => t.codePointCount(0, t.length)).sum +
        (if (toks.size > 1) toks.size - 1 else 0)
      assert(nTok === toks.size)
      assert(total === expectedTotal, s"case $i toks=$toks")
      for (n <- 2 to 6)
        assert(dup(n - 2) === naiveDup(toks, n), s"case $i n=$n toks=$toks")
    }
  }

  test("DupNgramStats hand case: overlapping occurrences union, not sum") {
    // toks = a b a b a b: dup bigrams "a b" (x3 at 0,2,4) and "b a" (x2 at
    // 1,3) — every position is covered; a sum over occurrences would
    // overcount to 5*3=15, the union is total_chars=11
    val (_, total, dup) = engineDup(Seq("a", "b", "a", "b", "a", "b"), 2, 2)
    assert(total === 11)
    assert(dup === Seq(11))
  }

  test("DupNgramStats hand case: disjoint dup runs add up") {
    // "x y x y q zz w zz w": dup "x y" at 0,2 covers [0,3)+[4,7)=6 chars;
    // dup "zz w" at 5,7 covers chars of "zz w zz w" = 9 ... spelled out:
    // joined = "x y x y q zz w zz w" (19 chars). "x y" occurrences cover
    // [0,3) and [4,7) = 6; "zz w" occurrences cover [10,14) and [15,19) = 8.
    val toks = Seq("x", "y", "x", "y", "q", "zz", "w", "zz", "w")
    val (_, total, dup) = engineDup(toks, 2, 2)
    assert(total === 19)
    assert(dup === Seq(14))
    assert(naiveDup(toks, 2) === 14)
  }

  test("DupNgramStats: self-concatenated text is covered wall to wall") {
    val doc = Seq("the", "quick", "brown", "fox", "jumps", "over", "it")
    val twice = doc ++ doc
    val (_, total, dup) = engineDup(twice, 5, 10)
    // every n-gram with n <= 7 repeats (shifted by one period); the dup
    // coverage at n=5 is the whole text EXCEPT the one separator between
    // the copies (dup occurrences cluster on tokens 0..6 and 7..13, and
    // no duplicated gram spans the seam). For n > 7 no exact repeat
    // exists (all 7 tokens distinct, so equal grams need a period-7
    // shift, which does not fit) — naive confirms both.
    for (n <- 5 to 10)
      assert(dup(n - 5) === naiveDup(twice, n), s"n=$n")
    assert(dup(0) === total - 1)
    assert(dup(5) === 0)
  }

  test("DupNgramStats and TopNgramStats on a multi-hundred-kB document " +
      "match the naive counters (bounded per-row allocation)") {
    // ~200k tokens over a 40-word vocab => ~1.4 MB of text, ~200k grams
    // per n. The hash-keyed GramTable allocates O(n_grams) fixed-size
    // slots and ZERO gram strings; the string-keyed map this replaced
    // built ~200k n-word strings per n per row.
    val vocab = (0 until 40).map(i => s"w$i")
    val rnd = new scala.util.Random(14)
    val toks = Seq.fill(200000)(vocab(rnd.nextInt(vocab.size)))
    val t0 = System.nanoTime()
    val (nTok, total, dup) = engineDup(toks, 3, 3)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(nTok === 200000)
    assert(dup(0) === naiveDup(toks, 3))
    assert(total === toks.map(_.length).sum + toks.size - 1)
    // completion well under naive-quadratic territory; generous bound so
    // a loaded host never flakes this
    assert(secs < 120.0, s"took $secs s")

    val top = Seq(Tuple1(toks)).toDF("toks")
      .select(TextFunctions.topNgramStats(col("toks"), 3).as("s"))
      .select("s.n_ngrams", "s.top_count", "s.top_cover")
      .as[(Int, Int, Int)].collect()(0)
    val grams = toks.sliding(3).map(_.mkString(" ")).toSeq
    val counts = grams.groupBy(identity).map { case (g, o) => (g, o.size) }
    assert(top === ((grams.size, counts.values.max,
      counts.map { case (g, c) => c * g.length }.max)))
  }

  // --------------------------------------------------------- DupLineStats

  test("DupLineStats equals the naive split-and-count on random line lists") {
    // tiny line alphabet (with empties and multi-byte) forces duplicates;
    // a duplicate is every occurrence beyond a value's first
    val lineGen = Gen.oneOf("", "home", "éé menu", "x")
    val docGen = Gen.chooseNum(0, 12).flatMap(k => Gen.listOfN(k, lineGen))
    for ((lines, i) <- samples(docGen, 40).zipWithIndex) {
      val text = lines.mkString("\n")
      val got = Seq(Tuple1(text)).toDF("text")
        .select(TextFunctions.dupLineStats(col("text")).as("d"))
        .select("d.n_lines", "d.total_chars", "d.dup_lines", "d.dup_chars")
        .as[(Int, Int, Int, Int)].collect()(0)
      // split keeps empties: "" splits to one empty line
      val split = text.split("\n", -1).toSeq
      val counts = split.groupBy(identity).map { case (l, o) => (l, o.size) }
      val dupLines = counts.values.map(_ - 1).sum
      val dupChars = counts.map { case (l, c) => (c - 1) * l.codePointCount(0, l.length) }.sum
      assert(got === ((split.size, text.codePointCount(0, text.length),
        dupLines, dupChars)), s"case $i lines=$lines")
    }
  }

  test("DupLineStats with a multi-byte separator equals naive string split") {
    // paragraph mode: sep = "\n\n"; raw text fuzz (not joined segments)
    // exercises partial-separator runs ("\n\n\n" = one sep + a "\n" char
    // in the next segment, leftmost-first like split/string_split)
    val charGen = Gen.frequency(4 -> Gen.const("a"), 2 -> Gen.const("\n"),
      1 -> Gen.const("é"), 1 -> Gen.const("b"))
    val textGen = Gen.chooseNum(0, 30).flatMap(k => Gen.listOfN(k, charGen)).map(_.mkString)
    for ((text, i) <- samples(textGen, 50).zipWithIndex) {
      val got = Seq(Tuple1(text)).toDF("text")
        .select(TextFunctions.dupLineStats(col("text"), "\n\n").as("d"))
        .select("d.n_lines", "d.total_chars", "d.dup_lines", "d.dup_chars")
        .as[(Int, Int, Int, Int)].collect()(0)
      // java split on a LITERAL (quoted) pattern matches the
      // leftmost-first non-overlapping semantics
      val segs = text.split(java.util.regex.Pattern.quote("\n\n"), -1).toSeq
      val counts = segs.groupBy(identity).map { case (l, o) => (l, o.size) }
      val dupLines = counts.values.map(_ - 1).sum
      val dupChars = counts.map { case (l, c) => (c - 1) * l.codePointCount(0, l.length) }.sum
      assert(got === ((segs.size, text.codePointCount(0, text.length),
        dupLines, dupChars)), s"case $i text=${text.replace("\n", "\\n")}")
      // and the dedup twin rebuilds exactly the keep-first join
      val ded = Seq(Tuple1(text)).toDF("text")
        .select(TextFunctions.dedupLinesInDoc(col("text"), "\n\n").as("d"))
        .select("d.clean_text", "d.n_lines", "d.n_removed")
        .as[(String, Int, Int)].collect()(0)
      val kept = segs.distinct
      assert(ded === ((kept.mkString("\n\n"), segs.size, segs.size - kept.size)),
        s"case $i text=${text.replace("\n", "\\n")}")
    }
  }

  test("DupLineStats hand case") {
    // "a\nbb\na\n\nbb\na": a x3 (2 dups), bb x2 (1 dup), "" x1 ->
    // dup_lines 3, dup_chars 2*1 + 1*2 = 4; 6 lines, 12 chars
    val got = Seq(Tuple1("a\nbb\na\n\nbb\na")).toDF("text")
      .select(TextFunctions.dupLineStats(col("text")).as("d"))
      .select("d.n_lines", "d.total_chars", "d.dup_lines", "d.dup_chars")
      .as[(Int, Int, Int, Int)].collect()(0)
    assert(got === ((6, 12, 3, 4)))
  }

  // ------------------------------------------------------ DedupLinesInDoc

  test("DedupLinesInDoc equals naive keep-first on random line lists") {
    val lineGen = Gen.oneOf("", "home", "éé menu", "x", "home")
    val docGen = Gen.chooseNum(0, 12).flatMap(k => Gen.listOfN(k, lineGen))
    for ((lines, i) <- samples(docGen, 40).zipWithIndex) {
      val text = lines.mkString("\n")
      val got = Seq(Tuple1(text)).toDF("text")
        .select(TextFunctions.dedupLinesInDoc(col("text")).as("d"))
        .select("d.clean_text", "d.n_lines", "d.n_removed")
        .as[(String, Int, Int)].collect()(0)
      val split = text.split("\n", -1).toSeq
      val kept = split.distinct // Seq.distinct keeps first occurrences in order
      assert(got === ((kept.mkString("\n"), split.size, split.size - kept.size)),
        s"case $i lines=$lines")
    }
  }

  test("DedupLinesInDoc hand case: repeats drop, order and empties survive") {
    val got = Seq(Tuple1("menu\nbody\nmenu\n\nfooter\n\nbody")).toDF("text")
      .select(TextFunctions.dedupLinesInDoc(col("text")).as("d"))
      .select("d.clean_text", "d.n_lines", "d.n_removed")
      .as[(String, Int, Int)].collect()(0)
    assert(got === (("menu\nbody\n\nfooter", 7, 3)))
  }

  // -------------------------------------------------------- bitext / IVF

  import graft.similarity.Bitext

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.as[(Long, Long)].collect().toSet

  test("mineIvf with nProbe = nCells equals the exact arm on random vectors") {
    // exhaustive probing makes the candidate set the full corpus, so the
    // two arms must agree PAIR-FOR-PAIR (same ranking, ties, margin)
    val vecGen = Gen.listOfN(4, Gen.chooseNum(-10, 10).map(_ / 10f))
      .map(v => if (v.forall(_ == 0f)) v.updated(0, 1f) else v)
    val caseGen = Gen.zip(
      Gen.chooseNum(1, 6).flatMap(k => Gen.listOfN(k, vecGen)),
      Gen.chooseNum(4, 12).flatMap(k => Gen.listOfN(k, vecGen)))
    for (((srcV, tgtV), i) <- samples(caseGen, 15).zipWithIndex) {
      val src = srcV.zipWithIndex.map { case (v, j) => (j.toLong, v) }
        .toDF("vec_id", "embedding")
      val tgt = tgtV.zipWithIndex.map { case (v, j) => (100L + j, v) }
        .toDF("vec_id", "embedding")
      val exact = pairs(Bitext.mine(src, tgt,
        "vec_id", "embedding", "vec_id", "embedding"))
      val ivf = pairs(Bitext.mineIvf(src, tgt,
        "vec_id", "embedding", "vec_id", "embedding", nCells = 4, nProbe = 4))
      assert(ivf === exact, s"case $i src=$srcV tgt=$tgtV")
    }
  }

  test("mineIvf recalls every planted twin at nProbe = 1") {
    // a scaled twin has the source's exact direction, hence the same
    // nearest centroid — probing ONE cell always finds it; margin holds
    // because nothing else in the fixture comes near cosine 1
    val dim = 8
    def unit(i: Int) = Seq.tabulate(dim)(j => if (j == i) 1f else 0f)
    val src = (0 until dim).map(i => (i.toLong, unit(i))).toDF("vec_id", "embedding")
    val twins = (0 until dim).map(i => (1000L + i, unit(i).map(_ * 2f)))
    val noise = Seq(
      (2000L, Seq.fill(dim)(0.5f)),
      (2001L, Seq.tabulate(dim)(j => if (j < 2) 0.6f else 0.1f)))
    val tgt = (twins ++ noise).toDF("vec_id", "embedding")
    val got = pairs(Bitext.mineIvf(src, tgt,
      "vec_id", "embedding", "vec_id", "embedding", nCells = 4, nProbe = 1))
    val want = (0 until dim).map(i => (i.toLong, 1000L + i)).toSet
    assert(got === want)
    // and the exact arm agrees on this fixture
    assert(pairs(Bitext.mine(src, tgt,
      "vec_id", "embedding", "vec_id", "embedding")) === want)
  }
}
