package graft.operators

import graft.SparkSpec

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    // (id, city, age_band, diagnosis)
    (1L, "ny", "30s", "flu"),
    (2L, "ny", "30s", "cold"),
    (3L, "ny", "30s", "flu"),
    (4L, "sf", "40s", "flu"),   // singleton QI group
    (5L, "la", "20s", "flu"),
    (6L, "la", "20s", "flu"))   // size-2 group, homogeneous diagnosis

  private def df = rows.toDF("id", "city", "age", "dx")

  test("kAnonymize keeps only groups of size >= k, row payload intact") {
    val out = Privacy.kAnonymize(df, Seq("city", "age"), k = 2L)
      .as[(Long, String, String, String)].collect().toSet
    assert(out.map(_._1) === Set(1L, 2L, 3L, 5L, 6L))
    assert(out.contains((2L, "ny", "30s", "cold"))) // non-QI column survives
  }

  test("kAnonymize k=3 tightens the bar; k=1 releases everything") {
    assert(Privacy.kAnonymize(df, Seq("city", "age"), k = 3L)
      .as[(Long, String, String, String)].collect().map(_._1).toSet === Set(1L, 2L, 3L))
    assert(Privacy.kAnonymize(df, Seq("city", "age"), k = 1L).count() === 6L)
  }

  test("kAnonymize groups null quasi-identifiers null-safely") {
    val withNulls = Seq(
      (1L, Some("ny"), "a"), (2L, Some("ny"), "a"),
      (3L, None, "b"), (4L, None, "b"), (5L, None, "c"))
      .toDF("id", "city", "x")
    val out = Privacy.kAnonymize(withNulls, Seq("city"), k = 3L)
      .as[(Long, Option[String], String)].collect().map(_._1).toSet
    // the null-city group has 3 members and must meet the bar as a group
    assert(out === Set(3L, 4L, 5L))
  }

  test("lDiverse suppresses homogeneous groups k-anonymity would release") {
    // la/20s has 2 members but only 1 distinct diagnosis -> suppressed
    val out = Privacy.lDiverse(df, Seq("city", "age"), "dx", l = 2L)
      .as[(Long, String, String, String)].collect().map(_._1).toSet
    assert(out === Set(1L, 2L, 3L))
  }

  test("pseudonymize: stable tokens preserve joins, nulls stay null, raw keys vanish") {
    val left = Seq((Some(10L), "a"), (Some(20L), "b"), (None, "c"))
      .toDF("k", "payload")
    val right = Seq((Some(10L), 1), (Some(30L), 2)).toDF("k", "tag")
    val pl = Privacy.pseudonymize(left, Seq("k"), salt = 99L)
    val pr = Privacy.pseudonymize(right, Seq("k"), salt = 99L)
    // join structure preserved: raw key 10 still matches, 20/30 don't
    val joined = pl.join(pr, "k").select("payload", "tag")
      .as[(String, Int)].collect()
    assert(joined.toSeq === Seq(("a", 1)))
    // tokens differ from the raw keys and nulls pass through
    val toks = pl.select("k").as[Option[Long]].collect().toSet
    assert(!toks.contains(Some(10L)) && !toks.contains(Some(20L)))
    assert(toks.contains(None))
    // a different salt yields different tokens (unlinkable across releases)
    val other = Privacy.pseudonymize(left, Seq("k"), salt = 100L)
      .select("k").as[Option[Long]].collect().toSet
    assert((toks - None).intersect(other - None).isEmpty)
  }

  // hand-computed t-closeness fixture: global dist flu 2/3, cold 1/3;
  // TVD(a) = 1/12, TVD(b) = 5/12, TVD(c) = 1/3 (c misses cold entirely —
  // exercises the absent-value fold N_g*(T - sum_present T_s))
  private val tRows =
    Seq.fill(3)(("a", "flu")) ++ Seq(("a", "cold")) ++
      Seq(("b", "flu")) ++ Seq.fill(3)(("b", "cold")) ++
      Seq.fill(4)(("c", "flu"))
  private def tDf = tRows.zipWithIndex
    .map { case ((g, dx), i) => (i.toLong, g, dx) }.toDF("id", "g", "dx")

  test("tClose keeps exactly the groups within t, boundary inclusive") {
    def kept(n: Long, d: Long): Set[String] =
      Privacy.tClose(tDf, Seq("g"), "dx", n, d)
        .select("g").as[String].collect().toSet
    assert(kept(1L, 3L) === Set("a", "c")) // c sits EXACTLY at 1/3 -> kept
    assert(kept(1L, 12L) === Set("a"))     // a sits exactly at 1/12
    assert(kept(5L, 12L) === Set("a", "b", "c"))
    assert(kept(0L, 1L) === Set.empty)     // nobody matches global exactly
  }

  test("tClose releases full rows and never duplicates them") {
    val out = Privacy.tClose(tDf, Seq("g"), "dx", 1L, 3L)
      .as[(Long, String, String)].collect()
    assert(out.length === 8) // 4 rows of a + 4 rows of c, payload intact
    assert(out.map(_._1).distinct.length === 8)
  }

  test("invalid arguments fail fast") {
    intercept[IllegalArgumentException](Privacy.kAnonymize(df, Seq.empty, 2L))
    intercept[IllegalArgumentException](Privacy.kAnonymize(df, Seq("city"), 0L))
    intercept[IllegalArgumentException](Privacy.lDiverse(df, Seq("city"), "dx", 0L))
    intercept[IllegalArgumentException](Privacy.tClose(df, Seq.empty, "dx", 1L, 3L))
    intercept[IllegalArgumentException](Privacy.tClose(df, Seq("city"), "dx", 1L, 0L))
    // a string key would silently tokenize to null — must fail by name
    val e = intercept[IllegalArgumentException](
      Privacy.pseudonymize(df, Seq("city"), 7L))
    assert(e.getMessage.contains("city") && e.getMessage.contains("integral"))
  }
}
