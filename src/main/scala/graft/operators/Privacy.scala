package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-preserving release primitives (Sweeney 2002, "k-anonymity: a
  * model for protecting privacy"; Machanavajjhala et al. 2007,
  * "l-diversity") — the suppression pass a curation pipeline runs before
  * a dataset leaves the trust boundary: any row whose quasi-identifier
  * combination is rare enough to re-identify its subject is withheld.
  *
  * Scale shape: both checks are one partial-aggregated counts-only
  * shuffle over the quasi-identifier tuple (map-side combined — the
  * exchange carries one row per DISTINCT combination, never one per
  * row), and the qualifying-combination set joins back as a semi-join
  * (AQE broadcasts it when small; co-partitioned shuffle otherwise).
  * Row payloads never travel for suppressed groups' sake, and no
  * per-group buffer exists anywhere.
  */
object Privacy {

  /** k-anonymity by suppression: keep exactly the rows whose
    * quasi-identifier combination occurs at least `k` times — every
    * released row is identical on `quasiIds` to ≥ k−1 others, so the
    * identifiers cannot single anyone out. Null QI values are grouped
    * null-safely (null combinations must meet the same bar, not leak).
    */
  def kAnonymize(df: DataFrame, quasiIds: Seq[String], k: Long): DataFrame = {
    require(quasiIds.nonEmpty, "kAnonymize: at least one quasi-identifier")
    require(k >= 1L, s"kAnonymize: k must be >= 1 (got $k)")
    val keep = df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("_qi_n"))
      .filter(col("_qi_n") >= k)
      .select(quasiIds.map(c => col(c).as(s"_qi_$c")): _*)
    val cond = quasiIds.map(c => col(c) <=> col(s"_qi_$c")).reduce(_ && _)
    df.join(keep, cond, "left_semi")
  }

  /** l-diversity by suppression: keep rows whose quasi-identifier group
    * contains at least `l` DISTINCT values of the `sensitive` column —
    * k-anonymity alone fails when a group is large but homogeneous (all
    * k subjects share the sensitive value, so membership reveals it).
    */
  def lDiverse(df: DataFrame, quasiIds: Seq[String], sensitive: String,
      l: Long): DataFrame = {
    require(quasiIds.nonEmpty, "lDiverse: at least one quasi-identifier")
    require(l >= 1L, s"lDiverse: l must be >= 1 (got $l)")
    val keep = df.groupBy(quasiIds.map(col): _*)
      .agg(countDistinct(col(sensitive)).as("_qi_l"))
      .filter(col("_qi_l") >= l)
      .select(quasiIds.map(c => col(c).as(s"_qi_$c")): _*)
    val cond = quasiIds.map(c => col(c) <=> col(s"_qi_$c")).reduce(_ && _)
    df.join(keep, cond, "left_semi")
  }
}
