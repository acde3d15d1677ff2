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

  /** Pseudonymization: replace each of `cols` (integral key columns) with
    * a stable salted token — the same (value, salt) always maps to the
    * same token, so joins and group-bys still line up across tables
    * pseudonymized with the same salt, while the raw identifier never
    * leaves the trust boundary. That join-consistency IS the contract
    * (the `pseudonymize_join` oracle replays it): referential structure
    * preserved, identity discarded.
    *
    * The token is the engine-stable multiplicative ring
    * ([[Sampling.hashBucket]] over a 2³⁰ space) — deliberately the same
    * exact-integer construction the deterministic samplers use, so any
    * engine replays tokens digit-for-digit. 2³⁰ tokens collide around
    * tens of thousands of distinct keys (birthday bound); collisions are
    * engine-identical and only COARSEN groups, but use a keyed
    * cryptographic MAC instead when tokens face an adversary rather than
    * an analytics pipeline. Null keys stay null.
    */
  def pseudonymize(df: DataFrame, cols: Seq[String], salt: Long): DataFrame = {
    require(cols.nonEmpty, "pseudonymize: at least one column")
    // fail fast on non-integral keys: the ring casts to long internally,
    // so a string key would silently tokenize every row to null — a
    // "pseudonymized" release that actually dropped its join keys
    for (c <- cols) {
      val t = df.schema(c).dataType
      val integral = t == org.apache.spark.sql.types.ByteType ||
        t == org.apache.spark.sql.types.ShortType ||
        t == org.apache.spark.sql.types.IntegerType ||
        t == org.apache.spark.sql.types.LongType
      require(integral,
        s"pseudonymize: column '$c' must be integral (got ${t.sql}); " +
          "hash string keys to a stable integer first")
    }
    cols.foldLeft(df) { (d, c) =>
      d.withColumn(c,
        when(col(c).isNull, lit(null))
          .otherwise(Sampling.hashBucket(col(c) + lit(salt), 1 << 30)))
    }
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
