package graft.props

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec
import graft.operators.{Profile, Sampling}

/** Property checks for the round-7 operators against naive in-memory
  * references on randomized inputs.
  */
class Round7PropertiesSpec extends SparkSpec {
  import spark.implicits._
  import Props.samples

  private val keyedGen: Gen[List[Long]] =
    Gen.listOf(Gen.choose(0L, 40L)).map(_.take(400))

  test("keySkew agrees with a naive reference on random key distributions") {
    for (keys <- samples(keyedGen, 6) if keys.nonEmpty) {
      val out = Profile.keySkew(keys.toDF("k"), Seq("k")).collect().head
      // naive reference
      val counts = keys.groupBy(identity).map(_._2.size.toLong).toSeq.sorted
      val nKeys = counts.size
      def pct(p: Int): Long = {
        val rank = (p * nKeys + 99) / 100 // ⌈p·n/100⌉
        counts(math.max(rank - 1, 0).toInt)
      }
      assert(out.getAs[Long]("n_rows") === keys.size.toLong)
      assert(out.getAs[Long]("n_keys") === nKeys.toLong)
      assert(out.getAs[Long]("max_cnt") === counts.last)
      assert(out.getAs[Long]("p50_cnt") === pct(50), s"p50 on counts=$counts")
      assert(out.getAs[Long]("p90_cnt") === pct(90), s"p90 on counts=$counts")
      assert(out.getAs[Long]("p99_cnt") === pct(99), s"p99 on counts=$counts")
      assert(out.getAs[Long]("skew_x1000") ===
        counts.last * 1000L * nKeys / keys.size)
    }
  }

  private val docGen: Gen[List[(String, Long, Long)]] =
    Gen.listOf(Gen.zip(Gen.oneOf("a", "b", "c"), Gen.choose(1L, 50L)))
      .map(_.take(300).zipWithIndex.map { case ((src, tok), i) => (src, i.toLong, tok) })

  test("tokenBudgetMix matches the naive allocation + prefix-take replay") {
    for (docs <- samples(docGen, 6) if docs.nonEmpty) {
      val df = docs.toDF("src", "id", "tok")
      val budget = 200L
      val got = Sampling.tokenBudgetMix(df, "src", "id", col("tok"),
        budgetTokens = budget, temperature = 2.0)
        .select("id").as[Long].collect().toSet
      // naive replay of the documented algebra
      val totals = docs.groupBy(_._1).map { case (s, ds) => s -> ds.map(_._3).sum }
      val wi = totals.map { case (s, n) => s -> math.floor(math.sqrt(n.toDouble) * 1e9).toLong }
      val wSum = wi.values.sum
      val alloc = totals.map { case (s, n) =>
        s -> math.min(n, math.floor(budget.toDouble * wi(s) / wSum.toDouble).toLong)
      }
      // hash order replay (Sampling.hashBucket ring)
      def bucket(id: Long): Long = {
        val l = id & 0xFFFFL
        val h = (id & 0xFFFFFFFFL) >>> 16
        val m = ((h * 2654435761L % 4294967296L) * 65536L + l * 2654435761L) % 4294967296L
        m % (1L << 30)
      }
      val expect = docs.groupBy(_._1).flatMap { case (s, ds) =>
        var cum = 0L
        ds.sortBy(d => (bucket(d._2), d._2)).takeWhile { d =>
          cum += d._3; cum <= alloc(s)
        }.map(_._2)
      }.toSet
      assert(got === expect, s"alloc=$alloc")
    }
  }

  test("keySkew handles the single-key and all-distinct extremes") {
    val single = Profile.keySkew(Seq.fill(50)(7L).toDF("k"), Seq("k")).collect().head
    assert(single.getAs[Long]("n_keys") === 1L)
    assert(single.getAs[Long]("skew_x1000") === 1000L)
    val distinct = Profile.keySkew((1L to 50L).toDF("k"), Seq("k")).collect().head
    assert(distinct.getAs[Long]("max_cnt") === 1L)
    assert(distinct.getAs[Long]("p99_cnt") === 1L)
    assert(distinct.getAs[Long]("skew_x1000") === 1000L)
  }
}
