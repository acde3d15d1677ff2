package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions

class DsirSpec extends SparkSpec {
  import spark.implicits._

  // planted corpus: "wiki-like" docs share a vocabulary, "spam-like" docs
  // another; the target corpus is pure wiki-like
  private val wikiText = "the quick brown fox jumps over the lazy dog"
  private val spamText = "buy now click here free offer buy now win"
  private def raw = ((1L to 20L).map(i => (i, wikiText)) ++
    (21L to 40L).map(i => (i, spamText))).toDF("doc_id", "text")
    .withColumn("_toks", TextFunctions.tokens(col("text")))
  private def target = (100L to 104L).map(i => (i, wikiText))
    .toDF("doc_id", "text")
    .withColumn("_toks", TextFunctions.tokens(col("text")))

  private def scored = {
    val t = Dsir.fit(target, col("_toks"))
    val r = Dsir.fit(raw, col("_toks"))
    Dsir.score(raw, "doc_id", col("_toks"), t, r)
  }

  test("score: integer evidence matches hand counts; target-like docs weigh more") {
    val rows = scored.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(6))).toMap
    // wiki doc: 9 unigrams + 8 bigrams = 17 feats, every gram in the target model
    assert(rows(1L)._1 === 17L && rows(1L)._2 === 17L)
    // spam doc: 9 + 8 = 17 feats, zero target hits
    assert(rows(21L)._1 === 17L && rows(21L)._2 === 0L)
    val wikiW = rows(1L)._3; val spamW = rows(21L)._3
    assert(wikiW > spamW,
      s"target-like weight $wikiW must exceed off-target $spamW")
  }

  test("score: gram-less doc gets zeroed evidence and null log_w") {
    val t = Dsir.fit(target, col("_toks"))
    val r = Dsir.fit(raw, col("_toks"))
    val docs = Seq((1L, ""), (2L, "the quick")).toDF("doc_id", "text")
      .withColumn("_toks", TextFunctions.tokens(col("text")))
    val out = Dsir.score(docs, "doc_id", col("_toks"), t, r)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) === 0L && out(1L).isNullAt(6))
    assert(out(2L).getLong(1) === 3L && !out(2L).isNullAt(6)) // 2 uni + 1 bi
  }

  test("resample: deterministic, k respected, biased toward the target") {
    val s1 = Dsir.resample(scored, col("doc_id"), k = 10, seed = 7L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val s2 = Dsir.resample(scored, col("doc_id"), k = 10, seed = 7L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(s1 === s2, "same seed must draw the same set")
    assert(s1.size === 10)
    // weights separate wiki (hits everywhere) from spam (zero hits) by a
    // wide margin; Gumbel noise is O(1) per draw, so all picks are wiki
    assert(s1.forall(_ <= 20L), s"expected only target-like ids, got $s1")
    val s3 = Dsir.resample(scored, col("doc_id"), k = 10, seed = 8L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(s1 !== s3, "a different seed should draw a different set")
  }

  test("resample: temperature flattens the draw toward uniform") {
    // at very high temperature weights vanish and the draw is pure Gumbel
    // order — with 20 spam docs of 40 total, a 20-doc draw must include
    // spam ids (probability of all-wiki is astronomically small)
    val hot = Dsir.resample(scored, col("doc_id"), k = 20, seed = 7L,
      temperature = 1e9)
      .select("doc_id").as[Long].collect()
    assert(hot.exists(_ > 20L), "high temperature must admit off-target docs")
  }
}
