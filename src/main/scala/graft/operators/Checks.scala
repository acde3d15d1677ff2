package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints evaluated in ONE pass — the
  * pre-commit gate a 100 TB ingest runs alongside [[Profile]]'s stats:
  * every row-level predicate reduces to a partial-aggregated violation
  * count in a single aggregate job (nothing shuffles but per-constraint
  * partials), uniqueness adds one counts-only exchange on the checked
  * key, and referential integrity one anti-join against the referenced
  * key set. The report is one row per constraint — (check_name, n_bad,
  * ok) — so a batch gate is `report.filter(!ok).isEmpty` and the numbers
  * land in the run's audit trail, not a boolean black hole.
  */
object Checks {

  /** A named row-level constraint: `pred` must hold on every row. */
  final case class RowRule(name: String, pred: Column)

  /** Row-level rules in one aggregate pass: one output row per rule. */
  def rowChecks(df: DataFrame, rules: Seq[RowRule]): DataFrame = {
    require(rules.nonEmpty, "rowChecks: no rules")
    val aggs = rules.map(r =>
      sum(when(r.pred, 0L).otherwise(1L)).as(r.name))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val pairs = rules.map(r =>
      struct(lit(r.name).as("check_name"),
        coalesce(col(r.name), lit(0L)).as("n_bad")))
    one.select(explode(array(pairs: _*)).as("_c"))
      .select(col("_c.check_name"), col("_c.n_bad"),
        (col("_c.n_bad") === 0L).as("ok"))
  }

  /** Key uniqueness: counts keys occurring more than once (counts-only
    * exchange, partial-aggregated map-side — duplicate keys combine
    * before they travel).
    */
  def uniqueCheck(df: DataFrame, keys: Seq[String], name: String): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("_n"))
      .agg(sum(when(col("_n") > 1L, 1L).otherwise(0L)).as("_bad"))
      .select(lit(name).as("check_name"),
        coalesce(col("_bad"), lit(0L)).as("n_bad"),
        (coalesce(col("_bad"), lit(0L)) === 0L).as("ok"))

  /** Referential integrity: counts child rows whose key set is absent
    * from the parent — a left-anti join on the key (the parent side
    * reduces to its distinct keys first, so only keys travel).
    */
  def referenceCheck(child: DataFrame, childKeys: Seq[String],
      parent: DataFrame, parentKeys: Seq[String], name: String): DataFrame = {
    require(childKeys.size == parentKeys.size, "key arity mismatch")
    val pk = parent.select(parentKeys.map(col): _*).distinct()
      .toDF(childKeys: _*)
    child.select(childKeys.map(col): _*)
      .join(pk, childKeys, "left_anti")
      .agg(count(lit(1)).as("_bad"))
      .select(lit(name).as("check_name"), col("_bad").as("n_bad"),
        (col("_bad") === 0L).as("ok"))
  }

  /** Combine reports (each one row per constraint) into one frame. */
  def report(parts: DataFrame*): DataFrame =
    parts.reduce(_ unionByName _)
}
