package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ChecksSpec extends SparkSpec {
  import spark.implicits._

  test("rowChecks: per-rule violation counts, null predicate counts as bad") {
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 2.0), (2L, -1.0), (3L, null), (4L, 0.5))
      .toDF("id", "v")
    val got = Checks.rowChecks(df, Seq(
      Checks.RowRule("v_positive", col("v") > 0),
      Checks.RowRule("v_nonnull", col("v").isNotNull)))
      .as[(String, Long, Boolean)].collect().toSet
    // v_positive: -1.0 bad, null bad -> 2; v_nonnull: 1 bad
    assert(got === Set(("v_positive", 2L, false), ("v_nonnull", 1L, false)))
  }

  test("uniqueCheck and referenceCheck with planted violations") {
    val parent = Seq((1L, "a"), (2L, "b"), (2L, "dup")).toDF("k", "x")
    val child = Seq((1L, 10), (2L, 20), (9L, 30), (9L, 31)).toDF("k", "v")
    val uniq = Checks.uniqueCheck(parent, Seq("k"), "parent_k_unique")
      .as[(String, Long, Boolean)].collect().head
    assert(uniq === (("parent_k_unique", 1L, false)))
    val fk = Checks.referenceCheck(child, Seq("k"), parent, Seq("k"), "child_fk")
      .as[(String, Long, Boolean)].collect().head
    assert(fk === (("child_fk", 2L, false))) // both k=9 rows counted
  }

  test("report: all-green gate on clean data") {
    val parent = Seq((1L, "a"), (2L, "b")).toDF("k", "x")
    val child = Seq((1L, 10), (2L, 20)).toDF("k", "v")
    val rep = Checks.report(
      Checks.rowChecks(child, Seq(Checks.RowRule("v_pos", col("v") > 0))),
      Checks.uniqueCheck(parent, Seq("k"), "k_unique"),
      Checks.referenceCheck(child, Seq("k"), parent, Seq("k"), "fk"))
    assert(rep.filter(!col("ok")).count() === 0L)
    assert(rep.count() === 3L)
  }

  test("fingerprint: order-independent, change-sensitive, null-hostile") {
    def fp(rows: Seq[(Long, Long)]) =
      Checks.fingerprint(rows.toDF("a", "b"), Seq("a", "b"))
        .as[(java.math.BigDecimal, Long)].collect().head
    val base = Seq((1L, 10L), (2L, 20L), (3L, 30L))
    assert(fp(base) === fp(base.reverse))             // order-independent
    assert(fp(base) !== fp(Seq((1L, 10L), (2L, 20L), (3L, 31L)))) // 1-value change
    assert(fp(base)._2 === 3L)
    val e = intercept[Exception] {
      Checks.fingerprint(
        Seq((Some(1L), 1L), (None, 2L)).toDF("a", "b"), Seq("a", "b")).collect()
    }
    assert(e.getMessage.contains("null in column") || e.getCause != null)
  }
}
