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
}
