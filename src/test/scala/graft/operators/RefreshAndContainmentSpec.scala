package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RefreshAndContainmentSpec extends SparkSpec {
  import spark.implicits._

  private def shingles(toks: org.apache.spark.sql.Column) =
    graft.functions.TextFunctions.shingleHashesOf(toks, 3)

  test("containment: a short doc quoted inside a long one is caught; Jaccard misses it") {
    // doc 2 = doc 1 verbatim inside a much longer text
    val quote = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, quote),
      (2L, s"intro words here first $quote and then many closing words follow after that end"),
      (3L, "completely different content with no shared phrases at all whatsoever")
    ).toDF("doc_id", "text")
      .withColumn("_toks", graft.functions.TextFunctions.tokens(col("text")))
    val got = graft.dedup.Dedup.containment(docs, "doc_id",
      shingles(col("_toks")), threshold = 0.9)
      .select("contained", "container").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L)))
    // the same pair under symmetric Jaccard at the same bar: invisible
    val j = graft.dedup.Dedup.ngramJaccard(docs, "doc_id",
      shingles(col("_toks")), threshold = 0.9)
      .select("a", "b").as[(Long, Long)].collect()
    assert(j.isEmpty, "J = |∩|/|∪| must stay low for quote-in-container")
  }

  test("containment: equal-size ties name the GREATER id as contained") {
    val t = "one two three four five six seven"
    val docs = Seq((5L, t), (9L, t)).toDF("doc_id", "text")
      .withColumn("_toks", graft.functions.TextFunctions.tokens(col("text")))
    val got = graft.dedup.Dedup.containment(docs, "doc_id",
      shingles(col("_toks")), threshold = 0.9)
      .select("contained", "container", "containment")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got === Seq((9L, 5L, 1.0)))
  }

  test("refreshSurvivorship: delta overrides non-null, falls back on null, inserts new pks") {
    val golden = Seq((1L, "a", Some(10.0)), (2L, "b", None), (3L, "c", Some(30.0)))
      .toDF("pk", "name", "bal")
    val delta = Seq((2L, Some("B2"), Some(22.0)), (3L, None, Some(33.0)),
      (9L, Some("new"), None))
      .toDF("pk", "name", "bal")
    val got = Maintain.refreshSurvivorship(golden, delta,
      pk = Seq("pk"), fields = Seq("name", "bal"))
      .as[(Long, Option[String], Option[Double])].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, Some("a"), Some(10.0)),     // untouched passes through
      (2L, Some("B2"), Some(22.0)),    // delta overrides both fields
      (3L, Some("c"), Some(33.0)),     // delta name null -> stored survives
      (9L, Some("new"), None)))        // new pk inserted
  }

  test("refreshSurvivorship deltaWins=false: backfill only fills stored nulls") {
    val golden = Seq((1L, Option.empty[String]), (2L, Some("kept"))).toDF("pk", "name")
    val delta = Seq((1L, Some("filled")), (2L, Some("ignored"))).toDF("pk", "name")
    val got = Maintain.refreshSurvivorship(golden, delta,
      pk = Seq("pk"), fields = Seq("name"), deltaWins = false)
      .as[(Long, Option[String])].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, Some("filled")), (2L, Some("kept"))))
  }
}
