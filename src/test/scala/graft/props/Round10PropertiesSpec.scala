package graft.props

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec
import graft.operators.{AsOf, Intervals, RangeJoin}

/** Null/overflow seam fuzz for the join/agg families: round 9 fixed four
  * silent-wrong-answer edges (asof null time, t-close null category,
  * ItemSim BIGINT overflow, feature_cross aliasing) found by INSPECTION —
  * these properties put generators on exactly those seams so the next
  * such edge is caught by CI, not by a reader. Every test compares the
  * distributed operator against a naive driver-side reference computed in
  * overflow-free arithmetic (BigInt / Option), on inputs that inject
  * nulls and values within an offset's reach of Long.MinValue/MaxValue.
  */
class Round10PropertiesSpec extends SparkSpec {
  import spark.implicits._
  import Props.samples

  // times: mostly small, sometimes null, sometimes at the Long extremes —
  // the three regimes where asof/interval algebra has historically broken
  private val timeGen: Gen[Option[Long]] = Gen.frequency(
    5 -> Gen.choose(0L, 50L).map(Some(_)),
    1 -> Gen.const(None),
    1 -> Gen.oneOf(Long.MinValue, Long.MinValue + 1, Long.MaxValue - 1,
      Long.MaxValue).map(Some(_): Option[Long]))

  test("asofJoin (backward): null times match nothing; extremes match exactly (vs naive)") {
    val rows = Gen.listOf(Gen.zip(Gen.choose(0, 3), timeGen))
    for ((ls, rs) <- samples(Gen.zip(rows, rows), 8)) {
      val left = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }.toDF("id", "k", "t")
      val right = rs.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }.toDF("rid", "k", "t")
      val got = AsOf.asofJoin(left, right, Seq("k"), "t", "t", Seq("rid"), Seq("rid"))
        .select("id", "rid").as[(Long, Option[Long])].collect().toMap
      val naive = ls.zipWithIndex.map { case ((k, t), i) =>
        i.toLong -> (t match {
          case None => None // null left time matches NOTHING
          case Some(lt) =>
            rs.zipWithIndex
              .collect { case ((rk, Some(rt)), ri) if rk == k && rt <= lt => (rt, ri) }
              .sorted.lastOption.map(_._2.toLong)
        })
      }.toMap
      assert(got === naive, s"ls=$ls rs=$rs")
    }
  }

  test("asofJoinForward: null times match nothing; extremes match exactly (vs naive)") {
    val rows = Gen.listOf(Gen.zip(Gen.choose(0, 3), timeGen))
    for ((ls, rs) <- samples(Gen.zip(rows, rows), 8, seed = 31L)) {
      val left = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }.toDF("id", "k", "t")
      val right = rs.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }.toDF("rid", "k", "t")
      val got = AsOf.asofJoinForward(left, right, Seq("k"), "t", "t", Seq("rid"), Seq("rid"))
        .select("id", "rid").as[(Long, Option[Long])].collect().toMap
      val naive = ls.zipWithIndex.map { case ((k, t), i) =>
        i.toLong -> (t match {
          case None => None
          case Some(lt) =>
            // smallest (rt, rid) among rt >= lt — forward scan's contract
            rs.zipWithIndex
              .collect { case ((rk, Some(rt)), ri) if rk == k && rt >= lt => (rt, ri) }
              .sorted.headOption.map(_._2.toLong)
        })
      }.toMap
      assert(got === naive, s"ls=$ls rs=$rs")
    }
  }

  // intervals: starts anywhere incl. extremes; end = start + small span,
  // saturated (keeps start <= end while still parking ends AT MaxValue)
  private val intervalGen: Gen[(Long, Long)] = for {
    s <- Gen.frequency(
      4 -> Gen.choose(0L, 60L),
      1 -> Gen.choose(Long.MaxValue - 40L, Long.MaxValue),
      1 -> Gen.choose(Long.MinValue, Long.MinValue + 40L))
    span <- Gen.choose(0L, 15L)
  } yield (s, if (s > Long.MaxValue - span) Long.MaxValue else s + span)

  test("Intervals.merge: minGap stitching is exact within minGap of Long.MaxValue (vs naive)") {
    val rows = Gen.listOf(Gen.zip(Gen.choose(0, 2), intervalGen))
    // the pinned wrap case first: prevMax = MaxValue−3 with gap 5 makes
    // `prevMax + gap` wrap in BIGINT — the unfixed operator split this
    // touching pair into two islands
    val pinned = (List(
      (0, (Long.MaxValue - 10L, Long.MaxValue - 3L)),
      (0, (Long.MaxValue - 2L, Long.MaxValue))), 5L)
    for ((ivs, gap) <- pinned +: samples(Gen.zip(rows, Gen.choose(0L, 10L)), 8)) {
      val df = ivs.map { case (k, (s, e)) => (k, s, e) }.toDF("k", "s", "e")
      val got = Intervals.merge(df, Seq("k"), "s", "e", minGap = gap)
        .select("k", "s", "e", "n_merged").as[(Int, Long, Long, Long)]
        .collect().toSet
      // naive: BigInt island sweep per key — `prevMax + gap` can never wrap
      val naive = ivs.groupBy(_._1).flatMap { case (k, g) =>
        val sorted = g.map(_._2).sorted
        val islands = sorted.foldLeft(List.empty[(Long, Long, Long)]) {
          case (acc, (s, e)) => acc match {
            case (is, ie, n) :: rest if BigInt(s) <= BigInt(ie) + gap =>
              (is, math.max(ie, e), n + 1) :: rest
            case _ => (s, e, 1L) :: acc
          }
        }
        islands.map { case (s, e, n) => (k, s, e, n) }
      }.toSet
      assert(got === naive, s"ivs=$ivs gap=$gap")
    }
  }

  test("Intervals.maxConcurrency: peak and instant exact at Long extremes (vs naive sweep)") {
    val rows = Gen.nonEmptyListOf(Gen.zip(Gen.choose(0, 2), intervalGen))
    for (ivs <- samples(rows, 8, seed = 17L)) {
      val df = ivs.map { case (k, (s, e)) => (k, s, e) }.toDF("k", "s", "e")
      val got = Intervals.maxConcurrency(df, Seq("k"), "s", "e")
        .as[(Int, Long, Long)].collect().toSet
      val naive = ivs.groupBy(_._1).map { case (k, g) =>
        val pts = g.flatMap { case (_, (s, e)) => Seq((s, 1L), (e, -1L)) }
          .sortBy(p => (p._1, p._2)) // -1 before +1 at equal t: half-open
        val sums = pts.scanLeft(0L)((acc, p) => acc + p._2).tail
        val peak = sums.max
        val at = pts.zip(sums).collectFirst { case ((t, _), c) if c == peak => t }.get
        (k, peak, at)
      }.toSet
      assert(got === naive, s"ivs=$ivs")
    }
  }

  test("RangeJoin.rangeJoin: no pair dropped within an offset of Long.MaxValue (vs naive)") {
    // integral band join on snowflake-scale ids: `t + offset` wraps in
    // BIGINT exactly where these generators park the values
    val idGen: Gen[Long] = Gen.frequency(
      3 -> Gen.choose(0L, 100L),
      1 -> Gen.choose(Long.MaxValue - 100L, Long.MaxValue),
      1 -> Gen.choose(Long.MinValue, Long.MinValue + 100L))
    val rows = Gen.listOf(Gen.zip(Gen.choose(0, 2), idGen))
    // pinned wrap case: left t = MaxValue−5 with upper +10 wraps `t+hi`
    // in BIGINT — the unfixed bucket explode mis-ranged and the residual
    // predicate mis-compared, dropping the (t, rt=MaxValue−2) match
    val pinned = ((List((0, Long.MaxValue - 5L), (1, Long.MinValue + 3L)),
      List((0, Long.MaxValue - 2L), (1, Long.MinValue))), (-10L, 10L))
    for (((ls, rs), (lo, hi)) <- pinned +: samples(
        Gen.zip(Gen.zip(rows, rows),
          Gen.zip(Gen.choose(-40L, 10L), Gen.choose(0L, 40L))), 8)) {
      val left = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }.toDF("id", "k", "t")
      val right = rs.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }.toDF("rid", "k", "rt")
      val got = RangeJoin.rangeJoin(left, right, Seq("k"), "t", "rt",
          lowerMicros = lo, upperMicros = hi)
        .select("id", "rid").as[(Long, Long)].collect().toSet
      val naive = (for {
        ((lk, lt), li) <- ls.zipWithIndex
        ((rk, rt), ri) <- rs.zipWithIndex
        if lk == rk &&
          BigInt(rt) >= BigInt(lt) + lo && BigInt(rt) <= BigInt(lt) + hi
      } yield (li.toLong, ri.toLong)).toSet
      assert(got === naive, s"ls=$ls rs=$rs lo=$lo hi=$hi")
    }
  }

  test("Intervals.gaps: complement of merge, exact vs naive at extremes") {
    val rows = Gen.listOf(Gen.zip(Gen.choose(0, 2), intervalGen))
    for ((ivs, gap) <- samples(Gen.zip(rows, Gen.choose(0L, 10L)), 6, seed = 43L)) {
      val df = ivs.map { case (k, (s, e)) => (k, s, e) }.toDF("k", "s", "e")
      val got = Intervals.gaps(df, Seq("k"), "s", "e", minGap = gap)
        .as[(Int, Long, Long)].collect().toSet
      val naive = ivs.groupBy(_._1).flatMap { case (k, g) =>
        val islands = g.map(_._2).sorted
          .foldLeft(List.empty[(Long, Long)]) {
            case ((is, ie) :: rest, (s, e)) if BigInt(s) <= BigInt(ie) + gap =>
              (is, math.max(ie, e)) :: rest
            case (acc, (s, e)) => (s, e) :: acc
          }.reverse
        islands.zip(islands.drop(1)).map { case ((_, e1), (s2, _)) => (k, e1, s2) }
      }.toSet
      assert(got === naive, s"ivs=$ivs gap=$gap")
    }
  }

  test("Packing.prefixSumBefore: exclusive prefix sum in a consistent total order, deterministic") {
    // invariant checked WITHOUT replaying the engine hash: sorting rows by
    // the output position must reproduce the running sum exactly —
    // out(k) == Σ values of rows before k — for ANY consistent order;
    // determinism is a second run being bit-identical
    val rows = Gen.nonEmptyListOf(Gen.choose(0L, 1000L))
    for ((vals, buckets) <- samples(Gen.zip(rows, Gen.oneOf(1, 4, 64)), 6)) {
      val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      def run() = graft.operators.Packing
        .prefixSumBefore(df, col("id"), col("v"), "before", buckets)
        .select("id", "v", "before").as[(Long, Long, Long)].collect()
      val got = run()
      val inOrder = got.sortBy(r => (r._3, r._1))
      val sums = inOrder.scanLeft(0L)((acc, r) => acc + r._2)
      inOrder.zip(sums).foreach { case ((id, _, before), want) =>
        assert(before === want, s"id=$id vals=$vals buckets=$buckets")
      }
      assert(run().sortBy(_._1).toSeq === got.sortBy(_._1).toSeq) // deterministic
    }
  }

  test("Packing.globalShuffle: positions are exactly 1..n") {
    for (n <- Seq(1, 7, 100, 1000)) {
      val df = (0 until n).map(i => (i.toLong, s"d$i")).toDF("id", "s")
      val pos = graft.operators.Packing.globalShuffle(df, col("id"), buckets = 64)
        .select("shuffle_pos").as[Long].collect().sorted
      assert(pos.toSeq === (1L to n.toLong))
    }
  }

  test("Packing.sequencePack: whole-doc packs, bounded overflow, definition-exact") {
    val rows = Gen.nonEmptyListOf(Gen.choose(1L, 300L))
    for ((toks, cap) <- samples(Gen.zip(rows, Gen.choose(200L, 800L)), 6, seed = 11L)) {
      val df = toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
      val packed = graft.operators.Packing
        .sequencePack(df, col("id"), col("t"), capacity = cap, buckets = 64)
        .select("id", "t", "pack_id").as[(Long, Long, Long)].collect()
      val before = graft.operators.Packing
        .prefixSumBefore(df, col("id"), col("t"), "b", buckets = 64)
        .select("id", "b").as[(Long, Long)].collect().toMap
      packed.foreach { case (id, _, p) =>
        assert(p === before(id) / cap, s"id=$id cap=$cap") // definition-exact
      }
      // a pack never exceeds capacity by the longest doc or more
      val maxDoc = toks.max
      packed.groupBy(_._3).values.foreach { g =>
        assert(g.map(_._2).sum < cap + maxDoc)
      }
    }
  }

  test("SetJoin.prefixJaccard: complete and exact vs naive all-pairs Jaccard") {
    val setGen = Gen.nonEmptyListOf(Gen.choose('a', 'j').map(_.toString))
    val rowsGen = Gen.nonEmptyListOf(setGen)
    for ((sets, (num, den)) <- samples(
        Gen.zip(rowsGen, Gen.oneOf((1, 2), (3, 5), (4, 5))), 6)) {
      val df = sets.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "toks")
      val got = graft.operators.SetJoin.prefixJaccard(df, col("id"), col("toks"), num, den)
        .select("id_a", "id_b", "inter", "uni").as[(Long, Long, Long, Long)]
        .collect().map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
      val naive = (for {
        (a, i) <- sets.zipWithIndex; (b, j) <- sets.zipWithIndex
        if i < j
        sa = a.toSet; sb = b.toSet
        inter = (sa & sb).size.toLong; uni = (sa | sb).size.toLong
        if inter * den >= num * uni
      } yield (i.toLong, j.toLong) -> ((inter, uni))).toMap
      assert(got === naive, s"sets=$sets t=$num/$den")
    }
  }

  test("Merge.applyChanges: random changesets (dup seqs, I-on-existing, D-on-absent) vs naive") {
    val baseGen = Gen.listOf(Gen.zip(Gen.choose(0L, 15L), Gen.choose(0, 99)))
    val chGen = Gen.listOf(Gen.zip(Gen.zip(Gen.choose(0L, 20L), Gen.choose(0, 99)),
      Gen.zip(Gen.oneOf("I", "U", "D"), Gen.choose(0L, 5L))))
    for ((b0, cs0) <- samples(Gen.zip(baseGen, chGen), 8)) {
      val base = b0.distinctBy(_._1)
      // contract: (key, seq) ties are only deterministic across DIFFERENT
      // ops (op descending breaks them) — same (key, seq, op) with
      // different values is documented as out-of-contract input
      val cs = cs0.distinctBy { case ((k, _), (op, seq)) => (k, seq, op) }
      val got = graft.operators.Merge.applyChanges(
          base.toDF("k", "v"),
          cs.map { case ((k, v), (op, seq)) => (k, v, op, seq) }
            .toDF("k", "v", "_op", "_seq"),
          Seq("k"))
        .as[(Long, Int)].collect().toMap
      // naive: per key, winner = max (seq, op) — the operator's documented
      // tie-break — then D deletes, I/U upserts, untouched keys pass
      val winners = cs.groupBy(_._1._1).map { case (k, g) =>
        k -> g.maxBy { case ((_, _), (op, seq)) => (seq, op) }
      }
      val naive = (base.map(_._1) ++ winners.keys).distinct.flatMap { k =>
        winners.get(k) match {
          case Some(((_, v), (op, _))) if op != "D" => Some(k -> v)
          case Some(_) => None // winning D removes the key
          case None => base.find(_._1 == k).map(r => k -> r._2)
        }
      }.toMap
      assert(got === naive, s"base=$base cs=$cs")
    }
  }

  test("Merge.snapshotDiff round-trips: applyChanges(old, diff) == new, and diff is minimal") {
    val snapGen = Gen.listOf(Gen.zip(Gen.choose(0L, 12L), Gen.choose(0, 3)))
    for ((o0, n0) <- samples(Gen.zip(snapGen, snapGen), 8, seed = 23L)) {
      val oldS = o0.distinctBy(_._1)
      val newS = n0.distinctBy(_._1)
      val diff = graft.operators.Merge.snapshotDiff(
        oldS.toDF("k", "v"), newS.toDF("k", "v"), Seq("k"))
      val rebuilt = graft.operators.Merge.applyChanges(
          oldS.toDF("k", "v"), diff.withColumn("_seq", lit(1L)), Seq("k"))
        .as[(Long, Int)].collect().toMap
      assert(rebuilt === newS.toMap, s"old=$oldS new=$newS")
      // minimality: unchanged keys are absent from the diff
      val om = oldS.toMap; val nm = newS.toMap
      val touched = diff.select("k").as[Long].collect().toSet
      val unchanged = om.keySet.intersect(nm.keySet).filter(k => om(k) == nm(k))
      assert(touched.intersect(unchanged).isEmpty, s"old=$oldS new=$newS")
    }
  }

  test("Merge.scd2History: validity intervals tile each key's timeline exactly") {
    val vGen = Gen.nonEmptyListOf(Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 50L)))
    for (vs0 <- samples(vGen, 8, seed = 37L)) {
      // unique (k, ts): the contract wants a tieBreak for duplicates
      val vs = vs0.distinctBy(v => (v._1, v._2))
      val got = graft.operators.Merge.scd2History(
          vs.toDF("k", "ts"), Seq("k"), "ts")
        .select("k", "valid_from", "valid_to", "is_current")
        .as[(Long, Long, Option[Long], Boolean)].collect()
      vs.groupBy(_._1).foreach { case (k, g) =>
        val times = g.map(_._2).sorted
        val rows = got.filter(_._1 == k).sortBy(_._2)
        assert(rows.map(_._2).toSeq === times) // every version present, in order
        // each valid_to is the NEXT version's valid_from; the last is open
        rows.sliding(2).foreach {
          case Array((_, _, to, cur), (_, from2, _, _)) =>
            assert(to === Some(from2)); assert(!cur)
          case _ =>
        }
        assert(rows.last._3.isEmpty && rows.last._4)
      }
    }
  }

  test("FuzzyJoin.selfJoin: deletion-neighborhood candidates are COMPLETE vs naive levenshtein") {
    // the FastSS completeness claim, fuzzed: every pair within maxDist
    // must surface (the verify filter already bounds over-production)
    val strGen = Gen.choose(0, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    for ((strs, maxDist) <- samples(
        Gen.zip(Gen.nonEmptyListOf(strGen), Gen.oneOf(1, 2)), 6)) {
      val df = strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
      val got = graft.operators.FuzzyJoin
        .selfJoin(df, col("id"), col("s"), maxDist = maxDist)
        .select("a", "b").as[(Long, Long)].collect().toSet
      val naive = (for {
        (a, i) <- strs.zipWithIndex; (b, j) <- strs.zipWithIndex
        if i < j && lev(a, b) <= maxDist
      } yield (i.toLong, j.toLong)).toSet
      assert(got === naive, s"strs=$strs maxDist=$maxDist")
    }
  }

  test("Spatial.chebyshevJoin: exact at Long extremes (stencil wrap + residual wrap) vs naive") {
    val coordGen: Gen[Long] = Gen.frequency(
      3 -> Gen.choose(-50L, 50L),
      1 -> Gen.choose(Long.MaxValue - 20L, Long.MaxValue),
      1 -> Gen.choose(Long.MinValue, Long.MinValue + 20L))
    val ptsGen = Gen.listOf(Gen.zip(coordGen, coordGen))
    for (((ls, rs), r) <- samples(
        Gen.zip(Gen.zip(ptsGen, ptsGen), Gen.oneOf(1L, 3L, 10L)), 8)) {
      val left = ls.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
        .toDF("lid", "lx", "ly")
      val right = rs.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
        .toDF("rid", "rx", "ry")
      val got = graft.operators.Spatial.chebyshevJoin(
          left, col("lx"), col("ly"), right, col("rx"), col("ry"), r)
        .select("lid", "rid", "cheb_dist").as[(Long, Long, Long)].collect().toSet
      val naive = (for {
        ((lx, ly), li) <- ls.zipWithIndex; ((rx, ry), ri) <- rs.zipWithIndex
        d = ((BigInt(lx) - rx).abs max (BigInt(ly) - ry).abs)
        if d <= r
      } yield (li.toLong, ri.toLong, d.toLong)).toSet
      assert(got === naive, s"ls=$ls rs=$rs r=$r")
    }
  }

  test("ZOrder.scaled: full-Long-range columns spread across buckets (span must not wrap)") {
    // hashed-id columns legitimately span (MinValue, MaxValue): the Long
    // span wraps negative and the unfixed code clamped EVERY row into one
    // bucket — Z-clustering silently degenerated
    val vals = Seq(Long.MinValue, Long.MinValue / 2, -1L, 0L, 1L,
      Long.MaxValue / 2, Long.MaxValue)
    val df = vals.toDF("v")
    val buckets = df.select(graft.sinks.ZOrder.scaled(
        col("v"), Long.MinValue, Long.MaxValue, bits = 8).as("b"))
      .as[Long].collect()
    assert(buckets.forall(b => b >= 0 && b <= 255))
    assert(buckets.distinct.length >= 5, s"degenerate bucketing: ${buckets.toSeq}")
    // and monotone in the input
    assert(buckets.toSeq === buckets.sorted.toSeq)
  }

  test("Cluster.connectedComponents: partition equals naive union-find on random graphs") {
    val edgeGen = Gen.listOf(Gen.zip(Gen.choose(0L, 30L), Gen.choose(0L, 30L)))
    for (es <- samples(edgeGen, 8, seed = 61L) if es.nonEmpty) {
      val got = graft.dedup.Cluster.connectedComponents(
          es.toDF("a", "b"), "a", "b")
        .select("id", "comp").as[(Long, Long)].collect().toMap
      // naive union-find (handles self-loops and duplicate edges)
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      es.foreach { case (a, b) => val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(ra max rb) = ra min rb }
      val nodes = es.flatMap { case (a, b) => Seq(a, b) }.distinct
      // same partition: two nodes share a graft component iff they share
      // a union-find root (component LABELS need not match the roots)
      val byGot = got.toSeq.groupBy(_._2).values.map(_.map(_._1).toSet).toSet
      val byNaive = nodes.groupBy(find).values.map(_.toSet).toSet
      assert(got.keySet === nodes.toSet, s"es=$es")
      assert(byGot === byNaive, s"es=$es")
    }
  }

  test("Sampling.dedupSafeSplit: connected documents NEVER straddle a split") {
    val docGen = Gen.nonEmptyListOf(Gen.choose(0L, 40L)).map(_.distinct)
    val pairGen = Gen.listOf(Gen.zip(Gen.choose(0L, 40L), Gen.choose(0L, 40L)))
    val w = Seq("train" -> 80, "val" -> 10, "test" -> 10)
    for ((ids, prs0) <- samples(Gen.zip(docGen, pairGen), 8, seed = 53L)) {
      // pairs reference existing docs only (the operator's contract)
      val idSet = ids.toSet
      val prs = prs0.filter(p => idSet(p._1) && idSet(p._2) && p._1 != p._2)
      val split = graft.operators.Sampling.dedupSafeSplit(
          ids.toDF("doc_id"), "doc_id", prs.toDF("a", "b"), "a", "b", w)
        .select("doc_id", "split").as[(Long, String)].collect().toMap
      assert(split.keySet === idSet) // every doc assigned exactly once
      assert(split.values.toSet.subsetOf(Set("train", "val", "test")))
      // the guarantee: no near-dup pair crosses split boundaries —
      // transitively (whole components stay together)
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      prs.foreach { case (a, b) => val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(ra) = rb }
      ids.groupBy(find).values.foreach { comp =>
        assert(comp.map(split).distinct.size === 1,
          s"component $comp straddles splits: ${comp.map(split)}")
      }
    }
  }

  test("ItemSim fixed-point score algebra: DECIMAL div equals BigInt at Long scale") {
    // the exact expression ItemSim.topNeighbors computes, on counts no
    // fixture can reach: c·10^6 div (na + nb − c) must match BigInt math
    // all the way to Long.MaxValue co-occurrence counts
    // c caps at Long.MaxValue/2 − slack so na + nb (≈ 2c + slack) stays a
    // legal BIGINT — the operator's real domain (na, nb are interaction
    // counts; their sum cannot exceed the row count). The old cliff sat
    // at c·10^6 > Long.MaxValue ≈ c > 9.2e12, far below this cap.
    val cGen = Gen.frequency(
      3 -> Gen.choose(1L, 1000L),
      2 -> Gen.choose(9200000000000L - 50L, 9200000000000L + 50L), // the old BIGINT cliff
      1 -> Gen.choose(Long.MaxValue / 4, Long.MaxValue / 2 - 2000L))
    for (triples0 <- samples(Gen.nonEmptyListOf(Gen.zip(cGen, Gen.choose(0L, 1000L),
        Gen.choose(0L, 1000L))), 6)) {
      // na, nb >= c by construction (an item's count bounds its co-count)
      val triples = triples0.zipWithIndex
        .map { case ((c, da, db), i) => (i.toLong, c, c + da, c + db) }
      val got = triples.toDF("i", "_c", "_na", "_nb")
        .withColumn("score_fp",
          expr("(cast(_c as decimal(38,0)) * 1000000) div (_na + _nb - _c)"))
        .select("i", "score_fp").as[(Long, Long)].collect().toMap
      val naive = triples.map { case (i, c, na, nb) =>
        i -> (BigInt(c) * 1000000 / (BigInt(na) + BigInt(nb) - c)).toLong
      }.toMap
      assert(got === naive, s"triples=$triples")
    }
  }
}
