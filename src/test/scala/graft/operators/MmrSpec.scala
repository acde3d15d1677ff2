package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.similarity.Mmr

class MmrSpec extends SparkSpec {
  import spark.implicits._

  private def run(qs: Seq[(Long, Seq[Long])], cs: Seq[(Long, Seq[Long])],
      k: Int): Seq[(Long, Long, Long, Long, Long)] =
    Mmr.rerank(qs.toDF("qid", "qvec"), "qid", "qvec",
        cs.toDF("cid", "cvec"), "cid", "cvec", k)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
      .sortBy(r => (r._1, r._2))

  test("diversity beats pure relevance once the top pick is taken") {
    // q=[4,4]; a=[5,5] rel 40, b=[5,4] rel 36 but sim(b,a)=45,
    // c=[-2,5] rel 12 with sim(c,a)=15: step 2 MMR picks c (-3 > -9)
    // where a pure-relevance reranker would pick b.
    val got = run(Seq((100L, Seq(4L, 4L))),
      Seq((1L, Seq(5L, 5L)), (2L, Seq(5L, 4L)), (3L, Seq(-2L, 5L))), k = 3)
    assert(got === Seq(
      (100L, 1L, 1L, 40L, 40L),
      (100L, 2L, 3L, 12L, -3L),
      (100L, 3L, 2L, 36L, -9L)))
  }

  test("ties break on higher rel then lower candidate id") {
    // both b and c end step 2 with score2 = 0 and equal rel -> lower id
    val got = run(Seq((7L, Seq(4L, 0L))),
      Seq((1L, Seq(4L, 0L)), (4L, Seq(3L, 1L)), (2L, Seq(3L, 0L))), k = 2)
    assert(got.map(r => (r._2, r._3)) === Seq((1L, 1L), (2L, 2L)))
  }

  test("independent queries rerank independently; short candidate sets truncate") {
    val got = run(
      Seq((1L, Seq(1L, 0L)), (2L, Seq(0L, 1L))),
      Seq((10L, Seq(5L, 0L)), (11L, Seq(0L, 5L))), k = 5)
    // each query ranks both candidates, in opposite orders; k=5 truncates at 2
    val q1 = got.filter(_._1 == 1L).map(_._3)
    val q2 = got.filter(_._1 == 2L).map(_._3)
    assert(q1 === Seq(10L, 11L) && q2 === Seq(11L, 10L))
  }
}
