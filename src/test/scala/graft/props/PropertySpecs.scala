package graft.props

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.functions.TextFunctions
import graft.operators.{AsOf, Joins}

/** Property-based checks over randomized inputs — invariants that single
  * fixtures can't pin down (the reference has no property tests at all).
  * Raw ScalaCheck generators with explicit seeds (no scalatest bridge in
  * the offline cache): deterministic, reproducible samples.
  */
object Props {
  def samples[A](g: Gen[A], n: Int, seed: Long = 7L): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default.withSize(30), Seed(seed + i)))
}

class JoinPropertiesSpec extends SparkSpec {
  import spark.implicits._
  import Props.samples

  private val txGen = Gen.listOf(Gen.zip(Gen.choose(0L, 1000L), Gen.choose(0, 20)))
  private val masterGen = Gen.listOf(Gen.zip(Gen.choose(0, 20), Gen.alphaStr.map(_.take(5))))

  test("masterJoin: found + missed partition the transactions exactly") {
    for ((txs, masters) <- samples(Gen.zip(txGen, masterGen), 5)) {
      val tx = txs.zipWithIndex.map { case ((id, k), i) => (id * 100 + i, k) }.toDF("txid", "k")
      val m = masters.toDF("k", "name")
      val ports = Joins.masterJoin(tx, m, Seq("k"), output = Seq(col("txid"), col("name")))
      val found = ports.found.select("txid").as[Long].collect().toSet
      val missed = ports.missed.select("txid").as[Long].collect().toSet
      assert(found.intersect(missed).isEmpty)
      assert(found.union(missed) === tx.select("txid").as[Long].collect().toSet)
      // found txids are exactly those whose key appears in masters
      val masterKeys = masters.map(_._1).toSet
      val txKeys = tx.select("txid", "k").as[(Long, Int)].collect().toMap
      assert(found === txKeys.filter { case (_, k) => masterKeys(k) }.keySet)
    }
  }

  test("cogroupN agrees with driver-side groupBy on random 3-input data") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val gen = Gen.listOf(Gen.zip(Gen.choose(0, 8), Gen.choose(0, 100)))
    for (((as, bs), cs) <- samples(Gen.zip(Gen.zip(gen, gen), gen), 5)) {
      val a = as.toDF("k", "v")
      val b = bs.toDF("k", "v")
      val c = cs.toDF("k", "v")
      val got = graft.operators.Groups.cogroupN(
        Seq(a, b, c), keys = Seq("k"), orders = Seq(Seq("v"), Seq("v"), Seq("v")),
        outSchema = StructType(Seq(
          StructField("k", IntegerType),
          StructField("sa", StringType), StructField("sb", StringType),
          StructField("sc", StringType)))) { (key, its) =>
        Iterator.single(Row(key.getInt(0),
          its(0).map(_.getInt(1)).mkString(","),
          its(1).map(_.getInt(1)).mkString(","),
          its(2).map(_.getInt(1)).mkString(",")))
      }.collect().map(r => r.getInt(0) -> ((r.getString(1), r.getString(2), r.getString(3)))).toMap
      def slice(xs: List[(Int, Int)], k: Int) = xs.filter(_._1 == k).map(_._2).sorted.mkString(",")
      val keys = (as ++ bs ++ cs).map(_._1).toSet
      val naive = keys.map(k => k -> ((slice(as, k), slice(bs, k), slice(cs, k)))).toMap
      assert(got === naive)
    }
  }

  test("asofJoin agrees with the naive quadratic definition") {
    val rows = Gen.listOf(Gen.zip(Gen.choose(0, 3), Gen.choose(0, 50)))
    for ((ls, rs) <- samples(Gen.zip(rows, rows), 5)) {
      val left = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }.toDF("id", "k", "t")
      val right = rs.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }.toDF("rid", "k", "t")
      val got = AsOf.asofJoin(left, right, Seq("k"), "t", "t", Seq("rid"), Seq("rid"))
        .select("id", "rid").as[(Long, Option[Long])].collect().toMap
      // naive: per left row, the right row with max (t, rid) among t <= left.t
      val naive = ls.zipWithIndex.map { case ((k, t), i) =>
        val cands = rs.zipWithIndex.filter { case ((rk, rt), _) => rk == k && rt <= t }
        i.toLong -> cands.sortBy { case ((_, rt), ri) => (rt, ri) }.lastOption.map(_._2.toLong)
      }.toMap
      assert(got === naive)
    }
  }

  test("asofJoinForward agrees with the naive quadratic definition") {
    val rows = Gen.listOf(Gen.zip(Gen.choose(0, 3), Gen.choose(0, 50)))
    for ((ls, rs) <- samples(Gen.zip(rows, rows), 5)) {
      val left = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }.toDF("id", "k", "t")
      val right = rs.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }.toDF("rid", "k", "t")
      val got = AsOf.asofJoinForward(left, right, Seq("k"), "t", "t", Seq("rid"), Seq("rid"))
        .select("id", "rid").as[(Long, Option[Long])].collect().toMap
      // naive: per left row, the right row with MIN (t, rid) among t >= left.t
      val naive = ls.zipWithIndex.map { case ((k, t), i) =>
        val cands = rs.zipWithIndex.filter { case ((rk, rt), _) => rk == k && rt >= t }
        i.toLong -> cands.sortBy { case ((_, rt), ri) => (rt, ri) }.headOption.map(_._2.toLong)
      }.toMap
      assert(got === naive, s"ls=$ls rs=$rs")
    }
  }

  test("asof joins: a null left time matches NOTHING in both directions") {
    // one key with right events at t=5 and t=50; left rows at t=10 (real
    // match both ways) and t=null (must match nothing — a plain desc sort
    // would park the null row after every right event and attach t=5)
    val left = Seq((1L, 1, Some(10)), (2L, 1, None))
      .toDF("id", "k", "t")
    val right = Seq((100L, 1, 5), (200L, 1, 50)).toDF("rid", "k", "t")
    val back = AsOf.asofJoin(left, right, Seq("k"), "t", "t", Seq("rid"), Seq("rid"))
      .select("id", "rid").as[(Long, Option[Long])].collect().toMap
    assert(back === Map(1L -> Some(100L), 2L -> None))
    val fwd = AsOf.asofJoinForward(left, right, Seq("k"), "t", "t", Seq("rid"), Seq("rid"))
      .select("id", "rid").as[(Long, Option[Long])].collect().toMap
    assert(fwd === Map(1L -> Some(200L), 2L -> None))
  }
}

class SketchPropertiesSpec extends SparkSpec {
  import spark.implicits._
  import Props.samples

  private val wordGen = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
  private val docGen = Gen.listOfN(40, wordGen).map(_.mkString(" "))

  test("minhash estimated Jaccard tracks true shingle Jaccard within 0.25") {
    for ((d1, d2) <- samples(Gen.zip(docGen, docGen), 5)) {
      def shingles(d: String) = d.split(" ").sliding(3).map(_.mkString(" ")).toSet
      val trueJ = {
        val (a, b) = (shingles(d1), shingles(d2))
        if (a.isEmpty && b.isEmpty) 1.0
        else a.intersect(b).size.toDouble / a.union(b).size
      }
      val df = Seq((0L, d1), (1L, d2)).toDF("doc_id", "text")
        .withColumn("_toks", TextFunctions.tokens(col("text")))
      val est = graft.dedup.Dedup.minhash(df, "doc_id",
        TextFunctions.shinglesOf(col("_toks"), 3), threshold = 0.0)
        .select("est_jaccard").as[Double].collect().headOption.getOrElse(0.0)
      // 128 hashes -> s.d. ~ sqrt(j(1-j)/128) <= 0.045; 0.25 is ~5 sigma,
      // and candidates below the LSH s-curve may legitimately return 0
      assert(est === 0.0 || math.abs(est - trueJ) < 0.25, s"est=$est true=$trueJ")
    }
  }

  test("winnow fingerprints are a subset of ngram hashes and order-stable") {
    for (d <- samples(docGen, 8)) {
      val df = Seq(d).toDF("t")
        .withColumn("_hs", TextFunctions.ngramHashes(col("t")))
        .withColumn("_fps", TextFunctions.winnowFromHashes(col("_hs")))
      val row = df.select("_hs", "_fps").as[(Seq[Long], Seq[Long])].collect().head
      assert(row._2.toSet.subsetOf(row._1.toSet))
      assert(row._2 === row._2.sorted)
      assert(row._2.distinct === row._2)
    }
  }
}

/** The one-pass text expressions must be bit-identical to the composable
  * built-in forms they replaced (the oracles verify the same equality in
  * SQL; this pins it across randomized inputs including unicode, repeated
  * spaces, and empty strings).
  */
class TextExpressionParitySpec extends SparkSpec {
  import spark.implicits._
  import Props.samples

  private val textGen = Gen.listOf(Gen.oneOf(
    "the", "und", "que", "DE", "la", "Zürich", "人", "a.b,c!", "", " ",
    "WORD", "mixedCase", "the.")).map(_.mkString(" "))

  test("StopwordCounts == size(filter(...)) forms; AsciiCharCount == regexp form") {
    for (t <- samples(textGen, 20) :+ "" :+ "   " :+ "the the THE") {
      val df = Seq(t).toDF("t")
      val words = TextFunctions.stopwords.flatMap(_._2).distinct
      val got = df.select(
        TextFunctions.tokenCount($"t"),
        TextFunctions.stopwordHits($"t", words),
        TextFunctions.punctCount($"t"),
        TextFunctions.upperCount($"t")).as[(Int, Int, Int, Int)].collect().head
      val want = df.select(
        size(filter(split($"t", " "), x => x =!= lit(""))),
        size(filter(filter(split(lower($"t"), " "), x => x =!= lit("")),
          x => x.isin(words.map(lit): _*))),
        length($"t") - length(regexp_replace($"t", "[.,!?;:]", "")),
        length($"t") - length(regexp_replace($"t", "[A-Z]", "")))
        .as[(Int, Int, Int, Int)].collect().head
      assert(got === want, s"text=<$t>")
    }
  }

  test("WordShingleHashes == Hash64.hashString over WordShingles") {
    for (t <- samples(textGen, 12)) {
      val df = Seq(t).toDF("t")
        .withColumn("_toks", TextFunctions.tokens($"t"))
      val (shs, hs) = df.select(
        TextFunctions.shinglesOf($"_toks", 3),
        TextFunctions.shingleHashesOf($"_toks", 3)).as[(Seq[String], Seq[Long])].collect().head
      assert(hs === shs.map(s =>
        graft.functions.Hash64.hashString(org.apache.spark.unsafe.types.UTF8String.fromString(s))))
    }
  }

  test("langId unchanged on tie-break and dominance cases") {
    val cases = Seq(
      "the and of to in" -> "en",        // en dominant
      "der die und den von" -> "de",     // de dominant
      "de la que el en" -> "es",         // es wins ties with fr on profile order
      "xyzzy plugh" -> "en")             // zero hits everywhere -> first profile wins the tie
    for ((t, want) <- cases)
      assert(Seq(t).toDF("t").select(TextFunctions.langId($"t"))
        .as[String].collect().head === want, s"text=<$t>")
  }
}

class RangeJoinPropertiesSpec extends SparkSpec {
  import spark.implicits._
  import Props.samples

  test("rangeJoin agrees with the naive quadratic band definition") {
    val rows = Gen.listOf(Gen.zip(Gen.choose(0, 3), Gen.choose(0L, 300L)))
    for (((ls, rs), (lo, span)) <- samples(
        Gen.zip(Gen.zip(rows, rows), Gen.zip(Gen.choose(-50L, 10L), Gen.choose(0L, 80L))), 5)) {
      val hi = lo + span
      val left = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }.toDF("id", "k", "t")
      val right = rs.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("rid", "rk", "rt")
      val got = graft.operators.RangeJoin.rangeJoin(
        left, right.withColumnRenamed("rk", "k"), Seq("k"), "t", "rt",
        lowerMicros = lo, upperMicros = hi)
        .select("id", "rid").as[(Long, Long)].collect().toSet
      val naive = (for {
        ((k, t), i) <- ls.zipWithIndex
        ((rk, rt), ri) <- rs.zipWithIndex
        if rk == k && rt >= t + lo && rt <= t + hi
      } yield (i.toLong, ri.toLong)).toSet
      assert(got === naive, s"window [$lo, $hi]")
    }
  }
}

class ClusterPropertiesSpec extends SparkSpec {
  import spark.implicits._
  import Props.samples

  test("connectedComponents agrees with a driver-side union-find") {
    val edgeGen = Gen.listOf(Gen.zip(Gen.choose(0L, 30L), Gen.choose(0L, 30L)))
    for (es <- samples(edgeGen, 5).filter(_.nonEmpty)) {
      val got = graft.dedup.Cluster.connectedComponents(es.toDF("a", "b"), "a", "b")
        .as[(Long, Long)].collect().toMap
      // naive union-find
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      for ((a, b) <- es) {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val naive = parent.keys.map(x => x -> find(x)).toMap
      assert(got === naive)
    }
  }
}
