package graft.props

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec
import graft.functions.AggExpressions
import graft.operators.{Privacy, Quantiles, Stats}

/** Property checks for this round's operators: each distributed result is
  * compared against a naive driver-side reference on random inputs
  * (Props.samples — explicit seeds, deterministic).
  */
class Round8PropertiesSpec extends SparkSpec {
  import spark.implicits._
  import Props.samples

  test("bounded_topk agrees with sort-take on random multisets and k") {
    val gen = Gen.zip(Gen.choose(1, 8),
      Gen.listOf(Gen.zip(Gen.choose(0L, 3L), Gen.choose(-50L, 50L))))
    for ((k, rows) <- samples(gen, 6) if rows.nonEmpty) {
      val got = rows.toDF("g", "v").repartition(5).groupBy("g")
        .agg(AggExpressions.topkAgg(col("v"), k).as("t"))
        .as[(Long, Seq[Long])].collect().toMap
      val want = rows.groupBy(_._1).view
        .mapValues(_.map(_._2).sorted(Ordering[Long].reverse).take(k)).toMap
      assert(got === want, s"k=$k rows=$rows")
    }
  }

  test("bounded_topk_pair agrees with sort-take under (score desc, id asc)") {
    val gen = Gen.zip(Gen.choose(1, 6),
      Gen.listOf(Gen.zip(Gen.choose(0L, 2L), Gen.choose(-5L, 5L), Gen.choose(0L, 100L))))
    for ((k, rows0) <- samples(gen, 6) if rows0.nonEmpty) {
      // ids must be unique per group for a well-defined reference
      val rows = rows0.zipWithIndex.map { case ((g, s, _), i) => (g, s, i.toLong) }
      val got = rows.toDF("g", "s", "i").repartition(5).groupBy("g")
        .agg(AggExpressions.topkPairAgg(col("s"), col("i"), k).as("t"))
        .as[(Long, Seq[(Long, Long)])].collect().toMap
      val want = rows.groupBy(_._1).view.mapValues(
        _.map(r => (r._2, r._3)).sortBy(p => (-p._1, p._2)).take(k)).toMap
      assert(got === want, s"k=$k rows=$rows")
    }
  }

  test("winsorize matches the naive per-group integer-rank clip") {
    val gen = Gen.listOf(Gen.zip(Gen.choose(0L, 2L), Gen.choose(-20L, 20L)))
    for (rows <- samples(gen, 6) if rows.nonEmpty) {
      val got = rows.toDF("g", "v")
        .withColumn("_id", monotonically_increasing_id())
      val out = Quantiles.winsorize(got, "g", col("v"), "w", 1, 4, 3, 4)
        .select(col("g"), col("v"), col("w")).as[(Long, Long, Long)]
        .collect().groupBy(r => (r._1, r._2)).view.mapValues(_.head._3).toMap
      def thr(vs: Seq[Long], num: Int, den: Int): Long = {
        val sorted = vs.sorted
        val n = sorted.size
        // smallest v with |{<= v}| * den >= n * num
        sorted.find(v => sorted.count(_ <= v).toLong * den >= n.toLong * num).get
      }
      for ((g, vs) <- rows.groupBy(_._1).view.mapValues(_.map(_._2))) {
        val lo = thr(vs, 1, 4); val hi = thr(vs, 3, 4)
        for (v <- vs)
          assert(out((g, v)) === (v max lo min hi), s"g=$g v=$v lo=$lo hi=$hi")
      }
    }
  }

  test("kAnonymize releases exactly the naive filter's rows") {
    val gen = Gen.listOf(Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 2L)))
    for (rows0 <- samples(gen, 6) if rows0.nonEmpty) {
      val rows = rows0.zipWithIndex.map { case ((a, b), i) => (a, b, i.toLong) }
      val got = Privacy.kAnonymize(rows.toDF("a", "b", "id"), Seq("a", "b"), k = 3L)
        .select("id").as[Long].collect().toSet
      val want = rows.groupBy(r => (r._1, r._2)).values
        .filter(_.size >= 3).flatten.map(_._3).toSet
      assert(got === want, rows.toString)
    }
  }

  test("asofJoin agrees with the naive latest-prior scan on random event streams") {
    val gen = Gen.zip(
      Gen.listOf(Gen.zip(Gen.choose(0L, 2L), Gen.choose(0L, 30L))), // left (k, t)
      Gen.listOf(Gen.zip(Gen.choose(0L, 2L), Gen.choose(0L, 30L)))) // right (k, t)
    for ((ls0, rs0) <- samples(gen, 6) if ls0.nonEmpty) {
      val ls = ls0.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      val rs = rs0.zipWithIndex.map { case ((k, t), i) => (1000L + i, k, t) }
      val got = graft.operators.AsOf.asofJoin(
        ls.toDF("id", "k", "t"), rs.toDF("rid", "k", "t"), Seq("k"), "t", "t",
        rightPayload = Seq("rid"), rightTieBreak = Seq("rid"))
        .select("id", "rid").as[(Long, Option[Long])].collect().toMap
      val want = ls.map { case (id, k, t) =>
        val cands = rs.filter(r => r._2 == k && r._3 <= t)
        id -> (if (cands.isEmpty) None
               else Some(cands.maxBy(r => (r._3, r._1))._1))
      }.toMap
      assert(got === want, s"left=$ls right=$rs")
    }
  }

  test("tvdDrift equals the naive fraction on random two-sided mixes") {
    val gen = Gen.listOf(Gen.zip(Gen.choose(0L, 3L), Gen.oneOf(true, false)))
    for (rows <- samples(gen, 6)
        if rows.exists(!_._2) && rows.exists(_._2)) {
      val r = Stats.tvdDrift(rows.toDF("c", "s"), col("c"), col("s"))
        .select(col("tvd_num").cast("long"), col("tvd_den").cast("long"))
        .as[(Long, Long)].head()
      val t1 = rows.count(!_._2).toLong
      val t2 = rows.count(_._2).toLong
      val num = rows.groupBy(_._1).values.map { es =>
        val n1 = es.count(!_._2).toLong
        val n2 = es.count(_._2).toLong
        math.abs(n1 * t2 - n2 * t1)
      }.sum
      assert(r === ((num, 2 * t1 * t2)), rows.toString)
    }
  }
}
