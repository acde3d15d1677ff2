package graft.misc

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.NgramLm

class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  // "a b" appears 3x (docs 1,2,3), "b c" 2x (docs 1,2), "c d" once
  // (doc 2, pruned at minCount=2), doc 4 has no bigrams
  private def docs = Seq(
    (1L, Seq("a", "b", "c")),
    (2L, Seq("a", "b", "c", "d")),
    (3L, Seq("a", "b")),
    (4L, Seq("x")))
    .toDF("doc_id", "toks")

  test("train: bigram counts with context totals, minCount prunes hapax") {
    val m = NgramLm.train(docs, col("toks"), minCount = 2L)
      .select(col("_cnt"), col("_ctx")).as[(Long, Long)].collect().toSeq.sorted
    // surviving: (a b) cnt=3 ctx(a)=3, (b c) cnt=2 ctx(b)=2; (c d) pruned
    assert(m === Seq((2L, 2L), (3L, 3L)))
  }

  test("score: per-doc integer evidence, zero-bigram docs included") {
    val m = NgramLm.train(docs, col("toks"), minCount = 2L)
    val got = NgramLm.score(docs, m, "doc_id", col("toks"))
      .select(col("doc_id"), col("n_bigrams"), col("n_hits"),
        col("hit_cnt_sum"), col("hit_ctx_sum"))
      .as[(Long, Long, Long, Long, Long)].collect()
      .map { case (id, a, b, c, d) => id -> ((a, b, c, d)) }.toMap
    assert(got(1L) === ((2L, 2L, 5L, 5L))) // (a b)+(b c): cnt 3+2, ctx 3+2
    assert(got(2L) === ((3L, 2L, 5L, 5L))) // (c d) missed
    assert(got(3L) === ((1L, 1L, 3L, 3L)))
    assert(got(4L) === ((0L, 0L, 0L, 0L)))
  }

  test("avg_logp ranks the familiar doc above the unfamiliar one") {
    val m = NgramLm.train(docs, col("toks"), minCount = 2L)
    val probe = Seq(
      (10L, Seq("a", "b", "c")), // all bigrams in-model
      (11L, Seq("q", "r", "s"))) // all bigrams OOV
      .toDF("doc_id", "toks")
    val s = NgramLm.score(probe, m, "doc_id", col("toks"))
      .select(col("doc_id"), col("avg_logp")).as[(Long, Double)].collect().toMap
    assert(s(10L) > s(11L))
  }
}
