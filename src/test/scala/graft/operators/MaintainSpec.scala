package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.SparkSpec

class MaintainSpec extends SparkSpec {
  import spark.implicits._

  // base rows (g, v); maintained aggregate = sum(v), count per g
  private def base = Seq(("a", 1), ("a", 2), ("a", 3), ("b", 10), ("c", 5))
    .toDF("g", "v").withColumn("v", col("v").cast(DecimalType(10, 2)))

  private def aggOf(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("g").agg(sum(col("v")).as("s"), count(lit(1)).as("n"))

  private def resultMap(df: org.apache.spark.sql.DataFrame) =
    df.select(col("g"), col("s").cast("double"), col("n"))
      .as[(String, Double, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap

  test("refreshAdditive equals recompute: inserts, retractions, new and vanished groups") {
    val delta = Seq(
      ("a", 2, "D"),   // retract one 'a' row
      ("b", 10, "D"),  // 'b' vanishes entirely
      ("c", 7, "I"),   // grow 'c'
      ("d", 4, "I"), ("d", 6, "I")) // brand-new group
      .toDF("g", "v", "_op").withColumn("v", col("v").cast(DecimalType(10, 2)))
    val refreshed = Maintain.refreshAdditive(aggOf(base), delta, Seq("g"),
      sums = Seq("s" -> col("v")), countCol = "n")
    val expected = aggOf(Seq(("a", 1), ("a", 3), ("c", 5), ("c", 7), ("d", 4), ("d", 6))
      .toDF("g", "v").withColumn("v", col("v").cast(DecimalType(10, 2))))
    assert(resultMap(refreshed) === resultMap(expected))
  }

  test("refreshAdditive: empty delta is identity") {
    val delta = Seq.empty[(String, Int, String)].toDF("g", "v", "_op")
      .withColumn("v", col("v").cast(DecimalType(10, 2)))
    val refreshed = Maintain.refreshAdditive(aggOf(base), delta, Seq("g"),
      sums = Seq("s" -> col("v")), countCol = "n")
    assert(resultMap(refreshed) === resultMap(aggOf(base)))
  }

  test("refreshAdditive fails the job on an invalid op") {
    val delta = Seq(("a", 1, "X")).toDF("g", "v", "_op")
      .withColumn("v", col("v").cast(DecimalType(10, 2)))
    val e = intercept[Exception] {
      Maintain.refreshAdditive(aggOf(base), delta, Seq("g"),
        sums = Seq("s" -> col("v")), countCol = "n").collect()
    }
    assert(e.getMessage.contains("invalid _op") || e.getCause != null)
  }

  test("refreshAdditive fails the job when a count would go negative") {
    val delta = Seq(("b", 10, "D"), ("b", 10, "D")).toDF("g", "v", "_op")
      .withColumn("v", col("v").cast(DecimalType(10, 2)))
    val e = intercept[Exception] {
      Maintain.refreshAdditive(aggOf(base), delta, Seq("g"),
        sums = Seq("s" -> col("v")), countCol = "n").collect()
    }
    assert(e.getMessage.contains("count below zero") || e.getCause != null)
  }

  test("refreshGroups: touched groups recomputed, untouched keep stale rows, both match recompute") {
    def mm(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("g").agg(min(col("v")).as("lo"), max(col("v")).as("hi"),
        count(lit(1)).as("n"))
    val oldBase = Seq(("a", 1), ("a", 9), ("b", 5), ("c", 3)).toDF("g", "v")
    // change: drop (a,9), add (c,8) and new group (d,2)
    val newBase = Seq(("a", 1), ("b", 5), ("c", 3), ("c", 8), ("d", 2)).toDF("g", "v")
    val touched = Seq("a", "c", "d").toDF("g")
    val refreshed = Maintain.refreshGroups(newBase, mm(oldBase), touched, Seq("g"),
      aggs = Seq(min(col("v")).as("lo"), max(col("v")).as("hi"), count(lit(1)).as("n")))
    val got = refreshed.as[(String, Int, Int, Long)].collect().sortBy(_._1)
    val want = mm(newBase).as[(String, Int, Int, Long)].collect().sortBy(_._1)
    assert(got === want)
  }

  test("refreshMergeable: unioned sketch estimates equal a from-scratch build") {
    val oldBase = Seq(("a", 1L), ("a", 2L), ("b", 10L)).toDF("g", "v")
    val delta = Seq(("a", 2L), ("a", 3L), ("c", 99L)).toDF("g", "v") // overlap + new group
    val aggTable = oldBase.groupBy("g").agg(hll_sketch_agg(col("v")).as("sk"))
    val refreshed = Maintain.refreshMergeable(aggTable, delta, Seq("g"),
      sketches = Seq("sk" -> col("v")))
      .select(col("g"), hll_sketch_estimate(col("sk")).as("est"))
      .as[(String, Long)].collect().toMap
    // small cardinalities: HLL is exact here
    assert(refreshed === Map("a" -> 3L, "b" -> 1L, "c" -> 1L))
  }

  test("refreshGroups: a fully-deleted touched group disappears") {
    def mm(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("g").agg(max(col("v")).as("hi"), count(lit(1)).as("n"))
    val oldBase = Seq(("a", 1), ("b", 5)).toDF("g", "v")
    val newBase = Seq(("a", 1)).toDF("g", "v")
    val refreshed = Maintain.refreshGroups(newBase, mm(oldBase),
      Seq("b").toDF("g"), Seq("g"),
      aggs = Seq(max(col("v")).as("hi"), count(lit(1)).as("n")))
    assert(refreshed.select("g").as[String].collect().toSeq === Seq("a"))
  }

  // ---- refreshJoin: join-view maintenance ------------------------------

  // A (pk, fk, payload) joined to B (fk, attr)
  private def bSide = Seq((10, "x"), (20, "y"), (30, "z")).toDF("fk", "attr")

  private def joinedOf(a: org.apache.spark.sql.DataFrame) =
    a.join(bSide, "fk").select(col("pk"), col("fk"), col("p"), col("attr"))

  private def vRows(df: org.apache.spark.sql.DataFrame) =
    df.select("pk", "fk", "p", "attr").as[(Int, Int, String, String)]
      .collect().toSet

  test("refreshJoin equals recompute: replace, delete, insert in one changeset") {
    val a0 = Seq((1, 10, "p1"), (2, 20, "p2"), (3, 30, "p3")).toDF("pk", "fk", "p")
      .select(col("fk"), col("pk"), col("p"))
    val view = joinedOf(a0)
    val delta = Seq(
      (2, 10, "p2b", "U"),  // replace pk 2, moving it to fk 10
      (3, 30, "p3", "D"),   // delete pk 3
      (4, 20, "p4", "U"))   // brand-new pk
      .toDF("pk", "fk", "p", "_op")
    val refreshed = Maintain.refreshJoin(view, delta, Seq("pk"))(joinedOf)
    val aFinal = Seq((1, 10, "p1"), (2, 10, "p2b"), (4, 20, "p4"))
      .toDF("pk", "fk", "p")
    assert(vRows(refreshed) === vRows(joinedOf(aFinal)))
  }

  test("refreshJoin: delete of an absent pk is a no-op; empty changeset is identity") {
    val a0 = Seq((1, 10, "p1")).toDF("pk", "fk", "p")
    val view = joinedOf(a0)
    val ghost = Seq((99, 10, "?", "D")).toDF("pk", "fk", "p", "_op")
    assert(vRows(Maintain.refreshJoin(view, ghost, Seq("pk"))(joinedOf)) ===
      vRows(view))
    val empty = Seq.empty[(Int, Int, String, String)].toDF("pk", "fk", "p", "_op")
    assert(vRows(Maintain.refreshJoin(view, empty, Seq("pk"))(joinedOf)) ===
      vRows(view))
  }

  test("refreshJoin: an upsert whose fk has no B match drops the row (inner-join view)") {
    val a0 = Seq((1, 10, "p1")).toDF("pk", "fk", "p")
    val delta = Seq((1, 99, "p1b", "U")).toDF("pk", "fk", "p", "_op")
    val refreshed = Maintain.refreshJoin(joinedOf(a0), delta, Seq("pk"))(joinedOf)
    assert(refreshed.count() === 0L)
  }

  test("refreshJoin fails the job on a duplicate pk in the changeset") {
    val a0 = Seq((1, 10, "p1")).toDF("pk", "fk", "p")
    val delta = Seq((1, 10, "p1b", "U"), (1, 10, "p1c", "D"))
      .toDF("pk", "fk", "p", "_op")
    val e = intercept[Exception] {
      Maintain.refreshJoin(joinedOf(a0), delta, Seq("pk"))(joinedOf).collect()
    }
    assert(e.getMessage.contains("multiple changeset rows") || e.getCause != null)
  }

  test("refreshJoin fails the job on an invalid op") {
    val a0 = Seq((1, 10, "p1")).toDF("pk", "fk", "p")
    val delta = Seq((2, 10, "p2", "Z")).toDF("pk", "fk", "p", "_op")
    val e = intercept[Exception] {
      Maintain.refreshJoin(joinedOf(a0), delta, Seq("pk"))(joinedOf).collect()
    }
    assert(e.getMessage.contains("invalid _op") || e.getCause != null)
  }

  test("refreshTopK merge equals the full recompute; one-sided groups pass through") {
    import graft.functions.AggExpressions
    import org.apache.spark.sql.functions.{col, posexplode}
    def top(df: org.apache.spark.sql.DataFrame) = df.groupBy("g")
      .agg(AggExpressions.topkPairAgg(col("s"), col("i"), 2).as("t"))
    val base = Seq(("a", 5L, 1L), ("a", 9L, 2L), ("a", 7L, 3L), ("b", 1L, 4L))
      .toDF("g", "s", "i")
    // delta: displaces one of a's top-2, introduces a brand-new group c;
    // group b untouched
    val delta = Seq(("a", 8L, 5L), ("c", 3L, 6L)).toDF("g", "s", "i")
    val refreshed = Maintain.refreshTopK(top(base), delta, Seq("g"), "t",
        col("s"), col("i"), 2)
      .select(col("g"), posexplode(col("t")))
      .select(col("g"), col("col.score"), col("col.id"))
      .as[(String, Long, Long)].collect().toSet
    val recompute = top(base.unionByName(delta))
      .select(col("g"), posexplode(col("t")))
      .select(col("g"), col("col.score"), col("col.id"))
      .as[(String, Long, Long)].collect().toSet
    assert(refreshed === recompute)
    assert(refreshed === Set(("a", 9L, 2L), ("a", 8L, 5L), ("b", 1L, 4L),
      ("c", 3L, 6L)))
  }
}
