package graft.props

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec

/** Round-15 additions: incremental bitext mining against a persisted IVF
  * index, plus the fixture-size guard for the bitext arm pin.
  *
  *  - [[graft.similarity.Bitext.mineIndexed]] given a prebuilt index must
  *    equal [[graft.similarity.Bitext.mineIvf]] pair-for-pair at the same
  *    nProbe (fuzzed), and at nProbe = nCells equal the exact arm;
  *  - the `bitext_mine_incremental` query must NOT rebuild its persisted
  *    index on a second batch — the on-disk index files stay untouched
  *    while the second mine still returns the exact-arm result;
  *  - the oracle fixtures must all sit BELOW the IVF arm pin: the pin
  *    switches RESULTS (approximate forward recall), so a fixture at or
  *    above it would plan the approximate arm under the exact-ranking
  *    oracle and surface only as a confusing hash mismatch.
  */
class Round15Spec extends SparkSpec {
  import spark.implicits._
  import Props.samples

  import graft.similarity.{Bitext, Ivf}

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.as[(Long, Long)].collect().toSet

  test("mineIndexed on a prebuilt index equals mineIvf at the same nProbe") {
    val vecGen = Gen.listOfN(4, Gen.chooseNum(-10, 10).map(_ / 10f))
      .map(v => if (v.forall(_ == 0f)) v.updated(0, 1f) else v)
    val caseGen = Gen.zip(
      Gen.chooseNum(1, 6).flatMap(k => Gen.listOfN(k, vecGen)),
      Gen.chooseNum(4, 12).flatMap(k => Gen.listOfN(k, vecGen)),
      Gen.chooseNum(1, 4))
    for (((srcV, tgtV, nProbe), i) <- samples(caseGen, 15).zipWithIndex) {
      val src = srcV.zipWithIndex.map { case (v, j) => (j.toLong, v) }
        .toDF("vec_id", "embedding")
      val tgt = tgtV.zipWithIndex.map { case (v, j) => (100L + j, v) }
        .toDF("vec_id", "embedding")
      val cs = Ivf.trainCentroids(tgt, "vec_id", "embedding", nCells = 4)
      val oneShot = pairs(Bitext.mineIvf(src, tgt,
        "vec_id", "embedding", "vec_id", "embedding",
        nCells = 4, nProbe = nProbe, centroids = cs))
      val indexed = pairs(Bitext.mineIndexed(src,
        Ivf.index(tgt, "vec_id", "embedding", cs), cs,
        "vec_id", "embedding", nProbe = nProbe))
      assert(indexed === oneShot, s"case $i nProbe=$nProbe src=$srcV tgt=$tgtV")
      if (nProbe == 4) {
        val exact = pairs(Bitext.mine(src, tgt,
          "vec_id", "embedding", "vec_id", "embedding"))
        assert(indexed === exact, s"case $i exact-arm equality src=$srcV tgt=$tgtV")
      }
    }
  }

  test("bitext_mine_incremental: second batch reuses the persisted index") {
    val dir = "/root/testdata/sf0.001"
    val run = graft.SparkEntry.queries("bitext_mine_incremental")
    val first = pairs(run(spark, dir))
    // the on-disk index this query persists (persistedIndex tag "bitext",
    // keyed by data dir + applicationId)
    val dirKey = Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(dir))
    val idxPath = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_index_bitext_${dirKey}_${spark.sparkContext.applicationId}")
    assert(idxPath.isDirectory, s"persisted index missing at $idxPath")
    def fileStamps() = idxPath.listFiles().map(f => (f.getName, f.lastModified, f.length))
      .sortBy(_._1).toSeq
    val before = fileStamps()
    val second = pairs(run(spark, dir))
    assert(fileStamps() === before,
      "second mine rewrote the persisted index — incremental mining must " +
        "probe the stored cells, not rebuild them")
    assert(second === first)
    // and the incremental arm agrees with the one-shot exact arm the
    // oracle replays (nProbe = nCells below the pin)
    assert(second === pairs(graft.SparkEntry.queries("bitext_mine")(spark, dir)))
  }

  test("every oracle fixture sits below the bitext IVF arm pin") {
    // BitextIvfMinCorpusRows changes RESULTS (IVF forward recall is
    // approximate); the exact-ranking oracle is valid only while every
    // driver-checked fixture plans the exact/all-cells arm. A larger
    // future fixture must fail HERE, by name, not as a hash mismatch.
    val pin = graft.queries.NorthStarQueries.BitextIvfMinCorpusRows
    val roots = new java.io.File("/root/testdata").listFiles()
    assume(roots != null, "/root/testdata not present on this box")
    val fixtures = roots.filter(d => d.isDirectory && d.getName.startsWith("sf")
      && new java.io.File(d, "embeddings.parquet").exists)
    assert(fixtures.nonEmpty)
    for (d <- fixtures) {
      val rows = spark.read.parquet(s"${d.getPath}/embeddings.parquet").count()
      assert(rows < pin,
        s"fixture ${d.getName} has $rows embeddings rows >= " +
          s"BitextIvfMinCorpusRows ($pin): the bitext queries would plan " +
          "the approximate IVF arm under the exact-ranking oracle — raise " +
          "the pin in NorthStarQueries or shrink the fixture")
    }
  }

  test("DoubleSortKey: order-preserving bijection on fuzzed doubles") {
    import graft.functions.DoubleSortKey.key
    val gen = Gen.oneOf(
      Gen.chooseNum(-1e12, 1e12),
      Gen.chooseNum(-1.0, 1.0),
      Gen.oneOf(0.0, -0.0, 1.0, -1.0, Double.MinPositiveValue,
        -Double.MinPositiveValue, Double.MaxValue, Double.MinValue))
    val vals = samples(Gen.listOfN(40, gen), 25).flatten
    for (a <- vals; b <- vals.take(40)) {
      // ±0.0: equal as doubles, but the key is a bijection on BITS and
      // totals the order (-0.0 below 0.0) — the documented IEEE edge
      if (!(a == 0.0 && b == 0.0))
        assert((a < b) === (key(a) < key(b)), s"order broken for ($a, $b)")
      assert((a == b) === (key(a) == key(b)) ||
        // -0.0 == 0.0 as doubles but the key is a BIJECTION on bits
        (a == 0.0 && b == 0.0),
        s"tie contract broken for ($a, $b)")
    }
    // the codegen'd column agrees with the scalar
    val df = vals.take(100).toDF("d")
      .select(col("d"), graft.functions.VectorExprFunctions
        .double_sort_key(col("d")).as("k"))
      .as[(Double, Long)].collect()
    assert(df.forall { case (d, k) => k == key(d) })
  }

  test("searchTopKAgg equals the window-ranked IVF search on batch frames") {
    val vecGen = Gen.listOfN(4, Gen.chooseNum(-10, 10).map(_ / 10f))
      .map(v => if (v.forall(_ == 0f)) v.updated(0, 1f) else v)
    for ((corpusV, i) <- samples(
        Gen.chooseNum(6, 20).flatMap(n => Gen.listOfN(n, vecGen)), 10).zipWithIndex) {
      val corpus = corpusV.zipWithIndex.map { case (v, j) => (j.toLong, v) }
        .toDF("vec_id", "embedding")
      val cs = Ivf.trainCentroids(corpus, "vec_id", "embedding", nCells = 4)
      val indexed = Ivf.index(corpus, "vec_id", "embedding", cs)
      val queries = corpus.filter(col("vec_id") < 3)
      for (nProbe <- Seq(1, 4)) {
        val window = Ivf.search(queries, indexed, "vec_id", "embedding",
            cs, k = 3, nProbe = nProbe)
          .as[(Long, Long, Int)].collect().toSet
        val agged = Ivf.searchTopKAgg(queries, indexed, "vec_id", "embedding",
            cs, k = 3, nProbe = nProbe)
          .select(col("query_id"), posexplode(col("_top")))
          .select(col("query_id"), col("col.id"), (col("pos") + 1).cast("int"))
          .as[(Long, Long, Int)].collect().toSet
        assert(agged === window, s"case $i nProbe=$nProbe corpus=$corpusV")
      }
    }
  }

  test("SemDedup.prune drops exactly the most-prototypical quota per cluster") {
    import graft.similarity.SemDedup
    val vecGen = Gen.listOfN(3, Gen.chooseNum(-10, 10).map(_ / 10f))
      .map(v => if (v.forall(_ == 0f)) v.updated(0, 1f) else v)
    for ((vs, i) <- samples(
        Gen.chooseNum(8, 24).flatMap(n => Gen.listOfN(n, vecGen)), 8).zipWithIndex) {
      val corpus = vs.zipWithIndex.map { case (v, j) => (j.toLong, v) }
        .toDF("vec_id", "embedding")
      val kept = SemDedup.prune(corpus, "vec_id", "embedding", k = 3,
          dropNum = 1, dropDen = 2)
        .select("vec_id").as[Long].collect().toSet
      // replay in plain Scala from the same deterministic centroids
      val cs = Ivf.trainCentroids(corpus, "vec_id", "embedding", nCells = 3)
      def cos(a: Seq[Float], c: Array[Double]): Double = {
        val dot = a.zip(c).map { case (x, y) => x * y }.sum
        val na = math.sqrt(a.map(x => x.toDouble * x).sum)
        val nc = math.sqrt(c.map(y => y * y).sum)
        dot / (na * nc)
      }
      def cell(a: Seq[Float]): Int = {
        // nearest centroid over NORMALIZED inputs = cosine argmax,
        // first index wins ties (Ivf.nearest contract)
        val sims = cs.map(c => cos(a, c))
        sims.zipWithIndex.maxBy { case (s, j) => (s, -j) }._2
      }
      val expect = vs.zipWithIndex.map { case (v, j) => (j.toLong, cell(v), cos(v, cs(cell(v)))) }
        .groupBy(_._2).values.flatMap { cl =>
          val ranked = cl.sortBy { case (id, _, c) => (-c, id) }
          ranked.drop(cl.size / 2).map(_._1)
        }.toSet
      assert(kept === expect, s"case $i vs=$vs")
    }
  }

  test("c4_filter: every plant class gets its hand-derived verdict") {
    // The good-page plant keeps exactly 5 of 8 lines (short line,
    // javascript line, and the unpunctuated line drop); the lorem/curly
    // plants keep one MORE line (their appended line is well-formed) but
    // fail the page rule; the 3-sentence plant fails the >= 5 floor; the
    // identity rows have no newline and no terminal punctuation at all.
    val out = graft.SparkEntry.queries("c4_filter")(spark, "/root/testdata/sf0.001")
      .select("doc_id", "n_lines", "n_kept", "doc_pass")
      .as[(Long, Long, Long, Boolean)].collect()
    assert(out.nonEmpty)
    val byClass = out.groupBy(_._1 / 1000000L)
    for ((cls, exp) <- Seq(11L -> (8L, 5L, true), 12L -> (9L, 6L, false),
        13L -> (9L, 6L, false), 14L -> (3L, 3L, false))) {
      val rows = byClass.getOrElse(cls, Array.empty)
      assert(rows.nonEmpty, s"plant class $cls missing from the fixture")
      assert(rows.forall(r => (r._2, r._3, r._4) == exp),
        s"class $cls: expected $exp, got ${rows.find(r => (r._2, r._3, r._4) != exp)}")
    }
    val idents = byClass.getOrElse(0L, Array.empty)
    assert(idents.nonEmpty &&
      idents.forall(r => r._2 == 1L && r._3 == 0L && !r._4))
  }

  test("c4_filter line rules: each rule drops exactly its target line") {
    // Hand-checked on a 6-line page: rule-by-rule attribution, clean
    // rebuild order, and the kept-line text surviving verbatim.
    val docs = Seq((1L,
      "one two three.\nshort.\nhas javascript inside.\nno punct here\n" +
        "quoted line ok\"\nfour five six!")).toDF("doc_id", "text")
    // reuse the query's column semantics via the oracle-equal rules:
    val lines = split(col("text"), "\n", -1)
    val kept = filter(lines, l =>
      (endswith(l, lit(".")) || endswith(l, lit("!")) ||
        endswith(l, lit("?")) || endswith(l, lit("\""))) &&
        size(filter(split(l, " ", -1), t => t =!= "")) >= 3 &&
        !array_contains(split(lower(l), " ", -1), "javascript"))
    val r = docs.select(size(lines).as("n"), size(kept).as("k"),
      array_join(kept, "\n").as("c")).as[(Int, Int, String)].head()
    assert(r === ((6, 3,
      "one two three.\nquoted line ok\"\nfour five six!")))
  }
}
