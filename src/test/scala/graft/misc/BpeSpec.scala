package graft.misc

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // word mass: "abab" x3, "ab" x2, "cd" x1 — by hand:
  //   round 0: (a,b) count 8 -> merge "ab"
  //   round 1: (ab,ab) count 3 -> merge "abab"
  //   round 2: (c,d) count 1 -> merge "cd"
  //   round 3: no pairs left -> exhausted
  private def corpus = Seq(
    (1L, Seq("abab", "abab", "abab", "ab")),
    (2L, Seq("ab", "cd")))
    .toDF("doc_id", "toks")

  test("train: deterministic merge sequence, stops when exhausted") {
    val m = Bpe.train(corpus, col("toks"), nMerges = 10)
    assert(m.map(x => (x.rank, x.left, x.right)) ===
      Seq((0, "a", "b"), (1, "ab", "ab"), (2, "c", "d")))
  }

  test("tokenStats: pieces follow the merge algebra exactly") {
    val m = Bpe.train(corpus, col("toks"), nMerges = 10)
    val probe = Seq((7L, Seq("ababab", "cd", "x")), (8L, Seq.empty[String]))
      .toDF("doc_id", "toks")
    // "ababab" -> [abab, ab] (greedy lowest-rank merges), "cd" -> [cd],
    // "x" -> [x]: 3 words, 9 chars, 4 pieces
    val all = Bpe.tokenStats(probe, "doc_id", col("toks"), m)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(all(7L) === ((3L, 9L, 4L)))
    assert(all(8L) === ((0L, 0L, 0L)))
  }

  test("tokenize: flat piece sequence per document") {
    val m = Bpe.train(corpus, col("toks"), nMerges = 10)
    val probe = Seq((7L, Seq("ababab", "cd", "x"))).toDF("doc_id", "toks")
    val got = Bpe.tokenize(probe, "doc_id", col("toks"), m)
      .as[(Long, Seq[String])].collect().head
    assert(got === ((7L, Seq("abab", "ab", "cd", "x"))))
  }

  test("merge budget respected: nMerges=1 learns only the top pair") {
    val m = Bpe.train(corpus, col("toks"), nMerges = 1)
    assert(m.map(x => (x.left, x.right)) === Seq(("a", "b")))
  }
}
