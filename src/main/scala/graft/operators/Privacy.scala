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

  /** t-closeness (Li, Li & Venkatasubramanian, ICDE 2007, with the
    * total-variation instantiation of the distance): keep only rows whose
    * quasi-identifier group's sensitive-value DISTRIBUTION lies within
    * TVD `tNum/tDen` of the global one — the gate that catches what
    * l-diversity misses (a group can hold l distinct sensitive values
    * and still skew hard toward one of them).
    *
    * Exact integer algebra throughout: with n_gs the (group, value)
    * count, N_g the group size, T_s the global value count and T the
    * total,
    *   TVD·2·N_g·T = Σ_s |n_gs·T − N_g·T_s|
    * and values ABSENT from a group contribute N_g·T_s each, so the sum
    * folds into present rows plus N_g·(T − Σ_present T_s) — no join
    * against the absent combinations is ever materialized. The keep
    * test cross-multiplies (num·tDen ≤ den·tNum in DECIMAL(38,0) — row
    * counts up to 10¹² per side keep every product under 10²⁶, twelve
    * orders inside the cap), so no float boundary exists even for groups
    * sitting exactly at t.
    *
    * Scale shape: counts-only all the way — the exchanges carry one row
    * per distinct (QI, sensitive) pair, the global value table broadcasts
    * (distinct sensitive values are small by assumption of the model),
    * and qualifying QI tuples come back as a semi-join. Row payloads
    * never shuffle.
    */
  def tClose(df: DataFrame, quasiIds: Seq[String], sensitive: String,
      tNum: Long, tDen: Long): DataFrame = {
    require(quasiIds.nonEmpty, "tClose: at least one quasi-identifier")
    require(tNum >= 0L && tDen >= 1L, s"tClose: bad threshold $tNum/$tDen")
    val d38 = "decimal(38,0)"
    val qi = quasiIds.map(col)
    val gs = df.groupBy(qi :+ col(sensitive).as("_s"): _*)
      .agg(count(lit(1)).as("_n_gs"))
    val globalS = gs.groupBy(col("_s")).agg(sum(col("_n_gs")).as("_t_s"))
    val totals = gs.agg(sum(col("_n_gs")).as("_t"))
    val groupN = gs.groupBy(qi: _*).agg(sum(col("_n_gs")).as("_n_g"))
      .select(quasiIds.map(c => col(c).as(s"_qi_$c")) :+ col("_n_g"): _*)
    val backCond = quasiIds.map(c => col(c) <=> col(s"_qi_$c")).reduce(_ && _)
    // null-SAFE join on the sensitive value: null is a real category (one
    // group can legitimately skew toward "unknown"), consistent with
    // tvdDrift/lDiverse — a null-rejecting join would drop null rows from
    // _num_present/_ts_present yet keep them in N_g, inflating the TVD
    val evidence = gs
      .join(broadcast(globalS.withColumnRenamed("_s", "_s_g")),
        col("_s") <=> col("_s_g")).drop("_s_g")
      .join(groupN, backCond)
      .crossJoin(broadcast(totals))
      .groupBy(qi: _*)
      .agg(
        sum(abs(col("_n_gs").cast(d38) * col("_t") -
          col("_n_g").cast(d38) * col("_t_s"))).as("_num_present"),
        sum(col("_t_s").cast(d38)).as("_ts_present"),
        max(col("_n_g")).cast(d38).as("_n_g"),
        max(col("_t")).cast(d38).as("_t"))
      .select(qi :+
        (col("_num_present") +
          col("_n_g") * (col("_t") - col("_ts_present"))).as("_tvd_num") :+
        (col("_n_g") * col("_t") * 2).as("_tvd_den"): _*)
    val keep = evidence
      .filter(col("_tvd_num") * tDen <= col("_tvd_den") * tNum)
      .select(quasiIds.map(c => col(c).as(s"_qi_$c")): _*)
    df.join(keep, backCond, "left_semi")
  }
}
