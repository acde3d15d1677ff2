package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Collocations (fixed-point PMI), LinearModel (broadcast-weight scoring)
  * and the leakage-safe split.
  */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("pmiTopK: exact fixed-point scores, bigrams from adjacent tokens only") {
    // corpus: "a b" ×6, "a c" ×3, plus c-runs to pad unigram counts
    val docs = (Seq.fill(6)(Seq("a", "b")) ++ Seq.fill(3)(Seq("a", "c")) ++
      Seq(Seq("c", "c", "c"))).toDF("ts")
    val got = Collocations.pmiTopK(docs, col("ts"), minCount = 3, k = 10)
      .as[(String, String, Long, Long)].collect().toSeq
    // unigrams: a=9 b=6 c=6; bigrams: (a,b)=6 (a,c)=3 (c,c)=2; N=11
    // (a,b): 6*11*1e6 / (9*6) = 1222222; (a,c): 3*11*1e6 / (9*6) = 611111
    // (c,c) fails minCount
    assert(got === Seq(("a", "b", 6L, 1222222L), ("a", "c", 3L, 611111L)))
  }

  test("pmiTopK: empty and single-token docs produce no bigrams") {
    val docs = Seq(Seq.empty[String], Seq("a"), Seq("a", "a")).toDF("ts")
    val got = Collocations.pmiTopK(docs, col("ts"), minCount = 1, k = 10)
      .as[(String, String, Long, Long)].collect().toSeq
    // only ("a","a") ×1; unigram a=3, N=1: 1*1*1e6/9 = 111111
    assert(got === Seq(("a", "a", 1L, 111111L)))
  }

  test("LinearModel.score: tf-weighted margin, out-of-vocab ignored, empty doc kept") {
    val docs = Seq(
      (1L, Seq("good", "good", "bad")),
      (2L, Seq("unknown", "words")),
      (3L, Seq.empty[String])
    ).toDF("doc_id", "toks")
    val weights = Seq(("good", 10L), ("bad", -25L)).toDF("term", "weight_fp")
    val got = LinearModel.score(docs, "doc_id", col("toks"), weights, biasFp = 0L)
      .select(col("doc_id"), col("margin_fp"), col("margin_fp_keep"))
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, -5L, false), (2L, 0L, true), (3L, 0L, true)))
  }

  test("LinearModel.score fails by name on a duplicated weight term") {
    val docs = Seq((1L, Seq("good"))).toDF("doc_id", "toks")
    val weights = Seq(("good", 10L), ("good", 20L)).toDF("term", "weight_fp")
    val e = intercept[Exception] {
      LinearModel.score(docs, "doc_id", col("toks"), weights).collect()
    }
    assert(e.getMessage.contains("appears more than once"),
      e.getMessage.take(200))
  }

  test("dedupSafeSplit: cluster members co-travel; singletons match deterministicSplit") {
    val docs = (1L to 50L).toDF("id")
    // pairs chain 1-2-3 into one cluster and 10-11 into another
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val w = Seq("train" -> 80, "val" -> 10, "test" -> 10)
    val got = Sampling.dedupSafeSplit(docs, "id", pairs, "a", "b", w)
      .select(col("id"), col("group_id"), col("split"))
      .as[(Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L)._1 === 1L && got(2L)._1 === 1L && got(3L)._1 === 1L)
    assert(got(10L)._1 === 10L && got(11L)._1 === 10L)
    assert(Set(got(1L)._2, got(2L)._2, got(3L)._2).size === 1,
      "cluster {1,2,3} must land in one split")
    assert(got(10L)._2 === got(11L)._2)
    // singletons: identical to the per-id deterministic split
    val plain = Sampling.deterministicSplit((1L to 50L).toDF("id"), col("id"), w)
      .as[(Long, String)].collect().toMap
    (4L to 9L).foreach(i => assert(got(i)._2 === plain(i), s"id $i"))
    (12L to 50L).foreach(i => assert(got(i)._2 === plain(i), s"id $i"))
  }
}
