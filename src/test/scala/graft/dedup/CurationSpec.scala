package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions
import graft.similarity.SemDedup

/** Curation operators: benchmark decontamination, SemDeDup k-means
  * semantic dedup, and Gopher quality signals.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  // 12 tokens; any 8-gram of `leaky` overlaps `benchDoc`
  private val benchDoc =
    "what is the capital of france the capital of france is paris"
  private val leaky = // benchDoc minus its last 2 tokens: shares 8-grams
    "what is the capital of france the capital of france"
  private val cleanDoc =
    "distributed query engines schedule shuffle stages across many executor processes"

  private def bench = Seq((0L, benchDoc)).toDF("doc_id", "text")
    .withColumn("_toks", TextFunctions.tokens(col("text")))
  private def batch = Seq((10L, leaky), (11L, cleanDoc)).toDF("doc_id", "text")
    .withColumn("_toks", TextFunctions.tokens(col("text")))

  test("decontaminate flags exactly the leaking doc with its distinct-gram count") {
    val out = Decontaminate.flag(batch, "doc_id", col("_toks"), bench, col("_toks"), n = 8)
      .as[(Long, Long)].collect().toSet
    // leaky has 10 tokens -> 3 8-grams, all present in benchDoc's grams
    assert(out === Set((10L, 3L)))
  }

  test("decontaminate shuffle-join path agrees with the broadcast path") {
    val bc = Decontaminate.flag(batch, "doc_id", col("_toks"), bench, col("_toks"), n = 8)
      .as[(Long, Long)].collect().toSet
    val sj = Decontaminate.flag(batch, "doc_id", col("_toks"), bench, col("_toks"), n = 8,
      broadcastBench = false).as[(Long, Long)].collect().toSet
    assert(bc === sj)
  }

  test("clean keeps only uncontaminated docs, original schema") {
    val out = Decontaminate.clean(batch, "doc_id", col("_toks"), bench, col("_toks"), n = 8)
    assert(out.columns.toSeq === Seq("doc_id", "text", "_toks"))
    assert(out.select("doc_id").as[Long].collect().toSeq === Seq(11L))
  }

  test("cleanIndexed against a parquet-persisted gram index equals clean") {
    val p = java.nio.file.Files.createTempDirectory("graft_benchgrams").toString
    Decontaminate.benchGrams(bench, col("_toks"), n = 8)
      .write.mode("overwrite").parquet(p)
    val out = Decontaminate.cleanIndexed(batch, "doc_id", col("_toks"),
      spark.read.parquet(p), n = 8)
    assert(out.select("doc_id").as[Long].collect().toSeq === Seq(11L))
  }

  test("docs shorter than n grams are never flagged") {
    val shortDoc = Seq((20L, "what is the capital")).toDF("doc_id", "text")
      .withColumn("_toks", TextFunctions.tokens(col("text")))
    val out = Decontaminate.flag(shortDoc, "doc_id", col("_toks"), bench, col("_toks"), n = 8)
    assert(out.count() === 0L)
  }

  // --- SemDeDup ---

  private def unit(xs: Double*): Array[Float] = {
    val n = math.sqrt(xs.map(x => x * x).sum)
    xs.map(x => (x / n).toFloat).toArray
  }

  // two well-separated directions, 4 dims; ids chosen so keep-smallest
  // is observable
  private def vecs = Seq(
    (1L, unit(1, 0, 0, 0)),
    (2L, unit(1, 0, 0, 0)),          // identical to 1 -> dropped
    (3L, unit(0.99, 0.141, 0, 0)),   // cos ~0.99 vs 1 -> kept at 0.999
    (4L, unit(0, 0, 1, 0)),
    (5L, unit(0, 0, 1, 0))           // identical to 4 -> dropped
  ).toDF("vec_id", "embedding")

  test("semdedup assign is total and stable for identical vectors") {
    val asg = SemDedup.assign(vecs, "vec_id", "embedding", k = 2, sampleN = 10)
      .as[(Long, Int)].collect().toMap
    assert(asg.keySet === Set(1L, 2L, 3L, 4L, 5L))
    assert(asg.values.forall(c => c >= 0 && c < 2))
    assert(asg(1L) === asg(2L)) // identical vectors, identical argmax
    assert(asg(4L) === asg(5L))
  }

  test("semdedup pairs finds identical vectors, dedup keeps the smaller id") {
    val prs = SemDedup.pairs(vecs, "vec_id", "embedding", k = 2, threshold = 0.999,
        sampleN = 10)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(prs.contains((1L, 2L)) && prs.contains((4L, 5L)))
    assert(!prs.exists { case (a, b) => Set(a, b) === Set(1L, 3L) }) // 0.99 < 0.999
    val kept = SemDedup.dedup(vecs, "vec_id", "embedding", k = 2, threshold = 0.999,
        sampleN = 10)
      .select("vec_id").as[Long].collect().toSet
    assert(kept === Set(1L, 3L, 4L))
  }

  test("semdedup maxCluster guard drops an over-bound cluster's pairs, reported") {
    // k=1 -> every vector in one cluster of size 5 > maxCluster=4
    val prs = SemDedup.pairs(vecs, "vec_id", "embedding", k = 1, threshold = 0.999,
      sampleN = 10, maxCluster = 4)
    assert(prs.count() === 0L)
  }

  // --- Gopher quality ---

  private def sig(text: String) =
    Seq(Tuple1(text)).toDF("text")
      .select(TextFunctions.gopherSignals(TextFunctions.tokens(col("text"))).as("q"))
      .select("q.n_words", "q.sum_word_len", "q.n_alpha_words", "q.n_stop", "q.pass")
      .as[(Long, Long, Long, Long, Boolean)].head()

  test("gopher signals: a normal passing document") {
    val text = (("the quick brown fox jumps over the lazy dog and " * 6).trim)
    val (n, sumLen, nAlpha, nStop, pass) = sig(text)
    assert(n === 60 && nAlpha === 60)
    assert(nStop >= 2 && pass)
    assert(sumLen === text.replace(" ", "").length)
  }

  test("gopher signals: too short / no stopwords / non-alpha all fail") {
    assert(!sig("short doc")._5)                       // < 50 words
    val noStop = ("alpha beta gamma delta " * 15).trim // 60 words, no en stopwords
    assert(!sig(noStop)._5)
    val numeric = (("1 2 3 4 5 6 7 8 9 10 the and " * 5).trim) // 60 words, 50/60 non-alpha
    val s3 = sig(numeric)
    assert(s3._3 * 5 < s3._1 * 4 && !s3._5)
  }

  test("gopher signals: empty token array yields zeros and fail, not nulls") {
    val (n, sumLen, nAlpha, nStop, pass) = sig("")
    assert(n === 0L && sumLen === 0L && nAlpha === 0L && nStop === 0L && !pass)
  }

  test("gopher signals: mean word length bounds via integer cross-multiply") {
    // 50 words of length 2 -> mean 2 < 3 -> fail
    val shortWords = (("so we it is to be or an my at " * 5).trim)
    val s = sig(shortWords)
    assert(s._1 === 50 && s._2 < s._1 * 3 && !s._5)
  }

  test("cleanSemantic drops near-benchmark vectors, passes null vectors through") {
    import org.apache.spark.sql.functions.col
    val bench = Seq((100L, Seq(1.0f, 0.0f, 0.0f))).toDF("vec_id", "v")
    val corpus = Seq(
      (1L, Some(Seq(0.999f, 0.01f, 0.0f))), // near the benchmark -> dropped
      (2L, Some(Seq(0.0f, 1.0f, 0.0f))),    // orthogonal -> kept
      (3L, None))                           // null vector -> passes through
      .toDF("vec_id", "v")
    val out = Decontaminate.cleanSemantic(
        corpus, "vec_id", col("v"), bench, col("v"), threshold = 0.9)
      .select("vec_id").as[Long].collect().toSet
    assert(out === Set(2L, 3L))
  }
}
