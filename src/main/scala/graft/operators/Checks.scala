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

  /** Order-independent table checksum over integral columns: per row a
    * modular polynomial over `cols` (coefficients 1000003^i mod p,
    * p = 2^31 − 1) passed through a QUADRATIC mix (h → h² + h mod p)
    * before the order-independent sum, accumulated in DECIMAL(38,0) so
    * the total never overflows at any row count.
    *
    * The quadratic mix is what makes the sum detect REARRANGEMENT, not
    * just replacement: a purely linear row hash decomposes the total
    * into per-column value sums, so offsetting one row's value up and
    * another's down (or swapping values across rows within a column) —
    * the classic structured-corruption shapes — would collide with
    * probability 1. With the nonlinear per-row mix those rearrangements
    * shift the total; random corruption collides with probability
    * ~2⁻³¹. Engine-portable by construction: plain integer arithmetic
    * (h < 2³¹ so h² fits in 64 bits), so any SQL engine reproduces it
    * digit for digit — unlike built-in hash functions, which differ per
    * engine. Columns must be integral and non-null (nulls fail the job
    * by name rather than silently fingerprinting as zero).
    */
  def fingerprint(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "fingerprint: no columns")
    val p = 2147483647L // 2^31 - 1
    val rowHash = cols.zipWithIndex.map { case (c, i) =>
      val coef = Iterator.iterate(1L)(x => x * 1000003L % p).drop(i).next()
      val checked = when(col(c).isNull, raise_error(
        lit(s"fingerprint: null in column '$c'")).cast("long"))
        .otherwise(col(c).cast("long"))
      pmod(checked, lit(p)) * coef % p
    }.reduce((a, b) => (a + b) % p)
    val mixed = (rowHash * rowHash + rowHash) % p
    df.agg(
      sum(mixed.cast("decimal(38,0)")).as("fingerprint"),
      count(lit(1)).as("n"))
  }
}
