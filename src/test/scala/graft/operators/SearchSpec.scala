package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SearchSpec extends SparkSpec {
  import spark.implicits._

  private def postings(docs: (Long, String)*) =
    Search.positionalPostings(
      docs.toSeq.toDF("id", "text"),
      col("id"), split(col("text"), " "))

  test("boolean: conjunction requires every term, exclusion removes") {
    val p = postings(
      1L -> "a b c",
      2L -> "a b x",
      3L -> "a c",
      4L -> "b c a a")
    assert(Search.boolean(p, Seq("a", "b")).as[Long].collect().toSet ===
      Set(1L, 2L, 4L))
    assert(Search.boolean(p, Seq("a", "b"), mustNot = Seq("x"))
      .as[Long].collect().toSet === Set(1L, 4L))
    assert(Search.boolean(p, Seq("z")).count() === 0L)
  }

  test("boolean: repeated occurrences of one term do not fake a conjunction") {
    val p = postings(1L -> "a a a", 2L -> "a b")
    assert(Search.boolean(p, Seq("a", "b")).as[Long].collect().toSet ===
      Set(2L))
  }

  test("boolean: a repeated query term collapses instead of making the query unmatchable") {
    val p = postings(1L -> "a b", 2L -> "b")
    assert(Search.boolean(p, Seq("a", "a")).as[Long].collect().toSet ===
      Set(1L))
    assert(Search.boolean(p, Seq("a", "a", "b")).as[Long].collect().toSet ===
      Set(1L))
  }

  test("phrase: adjacency, counts, overlaps and absence") {
    val p = postings(
      1L -> "x table hash y table hash",
      2L -> "table y hash",
      3L -> "hash table",
      4L -> "table table table")
    val m = Search.phrase(p, Seq("table", "hash"))
      .as[(Long, Long)].collect().toMap
    assert(m === Map(1L -> 2L))
    // overlapping self-phrase: "table table" matches at positions 1 and 2
    val m2 = Search.phrase(p, Seq("table", "table"))
      .as[(Long, Long)].collect().toMap
    assert(m2 === Map(4L -> 2L))
  }

  test("phrase: three-word phrase aligns all positions") {
    val p = postings(1L -> "a b c a b", 2L -> "a b x c", 3L -> "c a b c a")
    val m = Search.phrase(p, Seq("a", "b", "c"))
      .as[(Long, Long)].collect().toMap
    assert(m === Map(1L -> 1L, 3L -> 1L))
  }

  private def leg(rows: (String, Long, Int)*) =
    rows.toSeq.toDF("query", "doc_id", "rank")

  test("rrfFuse: hand-checked fixed-point sums, overlap, and id tie-break") {
    val leg1 = leg(("q", 10L, 1), ("q", 20L, 2), ("q", 30L, 3))
    val leg2 = leg(("q", 20L, 1), ("q", 40L, 2), ("r", 10L, 1))
    val leg3 = leg(("q", 50L, 3))
    val out = Search.rrfFuse(Seq(leg1, leg2, leg3), k = 10)
      .as[(String, Int, Long, Long)].collect().toSet
    // 1000000 div 61 = 16393, div 62 = 16129, div 63 = 15873
    assert(out === Set(
      ("q", 1, 20L, 32522L), // both legs: 16129 + 16393
      ("q", 2, 10L, 16393L),
      ("q", 3, 40L, 16129L),
      ("q", 4, 30L, 15873L), // ties 50 at 15873: lower id first
      ("q", 5, 50L, 15873L),
      ("r", 1, 10L, 16393L)))
  }

  test("Bm25.topDocsFor (frame terms) equals topDocs (literal terms)") {
    val docs = Seq(
      (1L, "spark join data spark"),
      (2L, "join data table row"),
      (3L, "spark table scan scan scan"),
      (4L, "data data data join spark"),
      (5L, "row row filter agg")).toDF("doc_id", "text")
    val terms = Seq("spark", "join", "data")
    val lit = graft.functions.Bm25.topDocs(docs, "doc_id", col("text"),
        terms, k = 4).as[(String, Int, Long)].collect().toSet
    val dyn = graft.functions.Bm25.topDocsFor(docs, "doc_id", col("text"),
        terms.toDF("term"), k = 4).as[(String, Int, Long)].collect().toSet
    assert(dyn === lit)
    assert(lit.nonEmpty)
  }

  test("rrfFuse: k truncates per query, single leg is rank-preserving") {
    val out = Search.rrfFuse(
      Seq(leg(("q", 7L, 1), ("q", 5L, 2), ("q", 9L, 3))), k = 2)
      .as[(String, Int, Long, Long)].collect().toSet
    assert(out.map(r => (r._2, r._3)) === Set((1, 7L), (2, 5L)))
  }
}
