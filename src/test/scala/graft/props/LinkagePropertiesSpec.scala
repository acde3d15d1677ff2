package graft.props

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec
import graft.operators.{Collocations, EntityLink, Sampling}

/** Property checks for the linkage/corpus operators: distributed results
  * vs naive driver-side references on random inputs (explicit seeds).
  */
class LinkagePropertiesSpec extends SparkSpec {
  import spark.implicits._
  import Props.samples

  test("EntityLink.link equals the naive blocked-and-scored reference") {
    // records: (id, blockKey, attr); score = 60·[attr equal] + 40·[|bal diff| ≤ 2]
    val recGen = Gen.listOf(Gen.zip(Gen.choose(0, 5), Gen.choose(0, 3), Gen.choose(0L, 10L)))
    for ((ls, rs) <- samples(Gen.zip(recGen, recGen), 6)) {
      val left = ls.zipWithIndex.map { case ((b, a, v), i) => (i.toLong, b, a, v) }
        .toDF("lid", "lb", "la", "lv")
      val right = rs.zipWithIndex.map { case ((b, a, v), i) => (1000L + i, b, a, v) }
        .toDF("rid", "rb", "ra", "rv")
      val score = when(col("la") === col("ra"), 60).otherwise(0) +
        when(abs(col("lv") - col("rv")) <= 2, 40).otherwise(0)
      val got = EntityLink.link(left, right, "lid", "rid",
        Seq((col("lb"), col("rb"))), score, 60)
        .as[(Long, Long, Int)].collect().toSet
      val want = (for {
        ((lb, la, lv), li) <- ls.zipWithIndex
        ((rb, ra, rv), ri) <- rs.zipWithIndex
        if lb == rb
        s = (if (la == ra) 60 else 0) + (if (math.abs(lv - rv) <= 2) 40 else 0)
        if s >= 60
      } yield (li.toLong, 1000L + ri, s)).toSet
      assert(got === want, s"ls=$ls rs=$rs")
    }
  }

  test("EntityLink.bestLinks picks the (score, leftId)-argmax per right id") {
    val recGen = Gen.listOf(Gen.zip(Gen.choose(0, 4), Gen.choose(0, 2)))
    for ((ls, rs) <- samples(Gen.zip(recGen, recGen), 6)) {
      val left = ls.zipWithIndex.map { case ((b, a), i) => (i.toLong, b, a) }
        .toDF("lid", "lb", "la")
      val right = rs.zipWithIndex.map { case ((b, a), i) => (1000L + i, b, a) }
        .toDF("rid", "rb", "ra")
      val score = when(col("la") === col("ra"), 70).otherwise(50)
      val got = EntityLink.bestLinks(left, right, "lid", "rid",
        Seq((col("lb"), col("rb"))), score, 50)
        .as[(Long, Long, Int)].collect().toSet
      val want = rs.zipWithIndex.flatMap { case ((rb, ra), ri) =>
        val cands = ls.zipWithIndex.collect {
          case ((lb, la), li) if lb == rb =>
            (li.toLong, if (la == ra) 70 else 50)
        }
        // max score, then max leftId — the documented deterministic pick
        cands.sortBy { case (li, s) => (s, li) }.lastOption
          .map { case (li, s) => (1000L + ri, li, s) }
      }.toSet
      assert(got === want, s"ls=$ls rs=$rs")
    }
  }

  test("pmiTopK equals the naive fixed-point PMI reference") {
    val docGen = Gen.listOf(Gen.listOf(Gen.choose('a', 'e').map(_.toString)))
    for (docs <- samples(docGen, 6) if docs.exists(_.size >= 2)) {
      val got = Collocations.pmiTopK(docs.toDF("ts"), col("ts"), minCount = 1, k = 1000)
        .as[(String, String, Long, Long)].collect().toSeq
      val uni = docs.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val big = docs.flatMap(d => d.zip(d.drop(1)))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = big.values.sum
      val want = big.toSeq.map { case ((x, y), c) =>
        (x, y, c, BigInt(c) * n * 1000000L / (BigInt(uni(x)) * uni(y))) }
        .map(t => (t._1, t._2, t._3, t._4.toLong))
        .sortBy(t => (-t._4, t._1, t._2))(
          Ordering.Tuple3(Ordering.Long, Ordering.String.reverse, Ordering.String.reverse))
      assert(got === want, s"docs=$docs")
    }
  }

  test("negativeSamples: never a positive, ranked 1..k, stable under repartitioning") {
    val interGen = Gen.listOf(Gen.zip(Gen.choose(0L, 10L), Gen.choose(0L, 19L)))
    for (inter <- samples(interGen, 6) if inter.nonEmpty) {
      val df = inter.toDF("u", "i")
      def run(d: org.apache.spark.sql.DataFrame) =
        Sampling.negativeSamples(d, "u", "i", nItems = 20, k = 3)
          .as[(Long, Long, Int)].collect().toSet
      val got = run(df)
      val pos = inter.toSet
      for ((u, i, r) <- got) {
        assert(!pos.contains((u, i)), s"sampled a positive ($u,$i): $inter")
        assert(r >= 1 && r <= 3)
      }
      // per-user ranks are contiguous from 1
      for ((u, rs) <- got.groupBy(_._1).view.mapValues(_.map(_._3).toSeq.sorted))
        assert(rs === (1 to rs.size), s"user $u ranks $rs")
      // engine-stable: identical under a different physical layout
      assert(run(df.repartition(7)) === got)
    }
  }

  test("ItemSim.topNeighbors equals the naive Jaccard-ranked reference") {
    val interGen = Gen.listOf(Gen.zip(Gen.choose(0L, 6L), Gen.choose(0L, 9L)))
    for (inter <- samples(interGen, 6) if inter.nonEmpty) {
      val got = graft.operators.ItemSim.topNeighbors(
        inter.toDF("u", "i"), "u", "i", maxUserItems = 100, minCo = 1, k = 3)
        .as[(Long, Int, Long, Long)].collect()
        .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
      val sets = inter.distinct.groupBy(_._2).view
        .mapValues(_.map(_._1).toSet).toMap
      val pairs = for {
        a <- sets.keys.toSeq; b <- sets.keys.toSeq if a < b
        c = sets(a).intersect(sets(b)).size.toLong if c >= 1
      } yield (a, b, c * 1000000L / (sets(a).size + sets(b).size - c))
      val want = (pairs.map(p => (p._1, p._2, p._3)) ++
        pairs.map(p => (p._2, p._1, p._3)))
        .groupBy(_._1).view.mapValues(
          _.map(t => (t._2, t._3)).sortBy(t => (-t._2, t._1)).take(3).zipWithIndex
            .map { case ((nb, s), i) => (i + 1) -> ((nb, s)) }.toMap)
        .toMap
      val wantFlat = want.flatMap { case (item, m) =>
        m.map { case (r, v) => (item, r) -> v } }
      assert(got === wantFlat, s"inter=$inter")
    }
  }

  test("dedupSafeSplit: NO pair ever crosses splits; group is the component min") {
    val pairGen = Gen.listOf(Gen.zip(Gen.choose(1L, 30L), Gen.choose(1L, 30L)))
    for (pairs0 <- samples(pairGen, 6)) {
      val pairs = pairs0.filter(p => p._1 != p._2)
      val ids = (1L to 30L).toDF("id")
      val got = Sampling.dedupSafeSplit(ids, "id",
        pairs.toDF("a", "b"), "a", "b",
        Seq("train" -> 80, "val" -> 10, "test" -> 10))
        .select(col("id"), col("group_id"), col("split"))
        .as[(Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got.size === 30)
      for ((a, b) <- pairs) {
        assert(got(a)._2 === got(b)._2, s"pair ($a,$b) crossed splits: $pairs")
        assert(got(a)._1 === got(b)._1)
      }
      // group_id = min id of the transitive component (naive union-find)
      val parent = scala.collection.mutable.Map((1L to 30L).map(i => i -> i): _*)
      def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      for ((a, b) <- pairs) { val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
      for (i <- 1L to 30L) assert(got(i)._1 === find(i), s"id $i comp: $pairs")
    }
  }
}
