package graft.props

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec
import graft.operators.{Maintain, Merge, Outliers, Repair}

/** Property checks for the round's reconciliation/maintenance/anomaly
  * operators: distributed results vs naive driver-side references on
  * random inputs (explicit seeds, deterministic).
  */
class Round9PropertiesSpec extends SparkSpec {
  import spark.implicits._
  import Props.samples

  test("Repair.sync: repaired replica EQUALS the primary for any drift") {
    val rowGen = Gen.listOf(Gen.zip(Gen.choose(0L, 40L), Gen.choose(0, 5)))
    for ((lrows0, drift) <- samples(Gen.zip(rowGen, Gen.listOf(Gen.choose(0L, 40L))), 6)) {
      // primary: key-unique rows
      val lrows = lrows0.distinctBy(_._1)
      if (lrows.nonEmpty) {
        val l = lrows.toDF("k", "v")
        val driftSet = drift.toSet
        // replica: drop some keys, corrupt some values, insert strays
        val rrows = lrows.filterNot(r => driftSet.contains(r._1) && r._1 % 3 == 0)
          .map { case (k, v) => if (driftSet.contains(k) && k % 3 == 1) (k, v + 100) else (k, v) } ++
          drift.filter(_ % 3 == 2).distinct.map(k => (k + 1000L, 9))
        val r = rrows.toDF("k", "v")
        val got = Repair.sync(l, r, Seq("k"), Seq("v"), nBuckets = 8)
          .as[(Long, Int)].collect().sorted.toSeq
        assert(got === lrows.sorted.toSeq, s"l=$lrows r=$rrows")
      }
    }
  }

  test("refreshSurvivorship(deltaWins) equals the full recompute with the feed on top") {
    val gGen = Gen.listOf(Gen.zip(Gen.choose(0L, 20L),
      Gen.option(Gen.alphaStr.map(_.take(3)))))
    for ((g0, d0) <- samples(Gen.zip(gGen, gGen), 6)) {
      val golden = g0.distinctBy(_._1)
      val delta = d0.distinctBy(_._1)
      if (golden.nonEmpty || delta.nonEmpty) {
        val got = Maintain.refreshSurvivorship(
          golden.toDF("pk", "f"), delta.toDF("pk", "f"), Seq("pk"), Seq("f"))
          .as[(Long, Option[String])].collect().toMap
        // reference: survivorship over (delta, golden) priority per key
        val gm = golden.toMap
        val dm = delta.toMap
        val want = (gm.keySet ++ dm.keySet).map { k =>
          k -> dm.getOrElse(k, None).orElse(gm.getOrElse(k, None))
        }.toMap
        assert(got === want, s"golden=$golden delta=$delta")
      }
    }
  }

  test("rollingAnomaly matches the naive trailing-window replay") {
    val evGen = Gen.listOf(Gen.zip(Gen.choose(0L, 2L), Gen.choose(0L, 50L),
      Gen.choose(0L, 1000L)))
    for (evs0 <- samples(evGen, 6) if evs0.nonEmpty) {
      val evs = evs0.zipWithIndex.map { case ((u, t, v), i) => (i.toLong, u, t, v) }
      val got = Outliers.rollingAnomaly(
        evs.toDF("id", "u", "t", "v"), Seq("u"), col("t"), col("v"),
        windowUs = 10L, kNum = 2, kDen = 1, minPrior = 3)
        .select(col("id"), col("n_prior"), col("is_anomaly"))
        .as[(Long, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      for ((id, u, t, v) <- evs) {
        val win = evs.filter(e => e._2 == u && e._3 >= t - 10 && e._3 <= t - 1).map(_._4)
        val n = win.size.toLong
        val s = win.sum
        val ss = win.map(x => x * x).sum
        val dev = BigInt(n) * v - s
        val anom = n >= 3 && dev * dev * 1 > BigInt(4) * (BigInt(n) * ss - BigInt(s) * s)
        assert(got(id) === ((n, anom)), s"event $id in $evs")
      }
    }
  }

  test("survivorship + refresh compose: a two-feed build then a correction equals the three-source build") {
    val src = Gen.listOf(Gen.zip(Gen.choose(0L, 12L), Gen.option(Gen.choose(0, 99))))
    for ((a0, b0, c0) <- samples(Gen.zip(src, src, src), 5)) {
      val (a, b, c) = (a0.distinctBy(_._1), b0.distinctBy(_._1), c0.distinctBy(_._1))
      if (a.nonEmpty && b.nonEmpty && c.nonEmpty) {
        val built = Merge.survivorship(
          Seq(a.toDF("pk", "f"), b.toDF("pk", "f")), Seq("pk"), Seq("f"))
        val refreshed = Maintain.refreshSurvivorship(
          built, c.toDF("pk", "f"), Seq("pk"), Seq("f"), deltaWins = true)
          .as[(Long, Option[Int])].collect().toMap
        val full = Merge.survivorship(
          Seq(c.toDF("pk", "f"), a.toDF("pk", "f"), b.toDF("pk", "f")),
          Seq("pk"), Seq("f"))
          .as[(Long, Option[Int])].collect().toMap
        assert(refreshed === full, s"a=$a b=$b c=$c")
      }
    }
  }
}
