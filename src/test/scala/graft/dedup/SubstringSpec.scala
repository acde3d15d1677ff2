package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions

/** Exact duplicated-substring spans (gram-run form of Lee et al. 2022). */
class SubstringSpec extends SparkSpec {
  import spark.implicits._

  // docA and docB share the 6-token run "three four five six seven eight";
  // docC is organically unique; docD repeats a 4-token phrase within itself
  private val docA =
    "one two three four five six seven eight nine ten eleven twelve"
  private val docB = "x1 x2 three four five six seven eight x3 x4"
  private val docC = "alpha beta gamma delta epsilon zeta eta theta"
  private val docD = "p q r s p q r s"

  private def docs = Seq((1L, docA), (2L, docB), (3L, docC), (4L, docD))
    .toDF("doc_id", "text")
    .withColumn("_toks", TextFunctions.tokens(col("text")))

  test("duplicatedSpans finds the cross-doc run in both docs, 1-based, merged") {
    val out = Substring.duplicatedSpans(docs, "doc_id", col("_toks"),
        L = 4, minSpanTokens = 5)
      .as[(Long, Long, Long)].collect().toSet
    // the shared 6-token run = 3 consecutive duplicated 4-grams starting
    // at token 3 in BOTH docs -> one span of 3 + 4 - 1 = 6 tokens
    assert(out === Set((1L, 3L, 6L), (2L, 3L, 6L)))
  }

  test("within-doc repetition is duplication too; minSpanTokens prunes") {
    val all = Substring.duplicatedSpans(docs, "doc_id", col("_toks"),
        L = 4, minSpanTokens = 4)
      .as[(Long, Long, Long)].collect().toSet
    // docD: "p q r s" recurs at positions 1 and 5 -> two 4-token spans
    assert(all === Set((1L, 3L, 6L), (2L, 3L, 6L), (4L, 1L, 4L), (4L, 5L, 4L)))
    val strict = Substring.duplicatedSpans(docs, "doc_id", col("_toks"),
        L = 4, minSpanTokens = 7)
      .as[(Long, Long, Long)].collect()
    assert(strict.isEmpty)
  }

  test("hot-gram broadcast branch and semi-join branch agree") {
    // hotGramFreq = 1: every duplicated gram rides the broadcast branch
    // (count >= 2 > 1); default: every one rides the semi-join branch
    val hot = Substring.duplicatedSpans(docs, "doc_id", col("_toks"),
        L = 4, minSpanTokens = 4, hotGramFreq = 1)
      .as[(Long, Long, Long)].collect().toSet
    val cold = Substring.duplicatedSpans(docs, "doc_id", col("_toks"),
        L = 4, minSpanTokens = 4, hotGramFreq = 1000000)
      .as[(Long, Long, Long)].collect().toSet
    assert(hot === cold)
  }

  test("dupStats counts gram positions exactly; short docs report (0, 0)") {
    val short = docs.unionByName(
      Seq((5L, "too few tokens")).toDF("doc_id", "text")
        .withColumn("_toks", TextFunctions.tokens(col("text"))))
    val out = Substring.dupStats(short, "doc_id", col("_toks"), L = 4)
      .as[(Long, Long, Long)].collect().toMap2
    assert(out(1L) === ((9L, 3L)))  // 12 tokens -> 9 grams, 3 duplicated
    assert(out(2L) === ((7L, 3L)))
    assert(out(3L) === ((5L, 0L)))
    assert(out(4L) === ((5L, 2L)))  // "p q r s" gram at pos 1 and 5
    assert(out(5L) === ((0L, 0L)))
  }

  test("clean drops over-budget docs, keeps schema, keeps gramless docs") {
    val short = docs.unionByName(
      Seq((5L, "too few tokens")).toDF("doc_id", "text")
        .withColumn("_toks", TextFunctions.tokens(col("text"))))
    // 30 % budget: docA 3/9 dropped? 3*10 > 9*3 -> dropped; docB 3/7
    // dropped; docD 2/5 dropped; docC 0/5 and gramless doc 5 kept
    val out = Substring.clean(short, "doc_id", col("_toks"), L = 4,
      num = 3, den = 10)
    assert(out.columns.toSeq === Seq("doc_id", "text", "_toks"))
    assert(out.select("doc_id").as[Long].collect().toSet === Set(3L, 5L))
  }

  private implicit class TripleOps(rows: Array[(Long, Long, Long)]) {
    def toMap2: Map[Long, (Long, Long)] =
      rows.map { case (a, b, c) => a -> ((b, c)) }.toMap
  }
}
