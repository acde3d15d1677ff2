package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group z-score outlier flagging in EXACT integer algebra. The
  * float form ((x − μ)/σ > k) puts a float boundary in the middle of a
  * filter — two engines (or two partition orders of one engine) can
  * disagree about rows sitting on it. Multiplying through by n² removes
  * the divisions:
  *
  *   z² > k²  ⟺  (n·x − S)² · kDen² > kNum² · (n·SS − S²)
  *
  * with S = Σx, SS = Σx², k = kNum/kDen — every term integral, so the
  * flagged SET is a deterministic dataset property, reproducible
  * digit-for-digit by any engine (the quality-gate analogue of the
  * integer-evidence contracts across the curation family).
  *
  * Scale shape: one partial-aggregated counts-only exchange for the
  * per-group (n, S, SS) moments, then a co-partitioned join back — the
  * group-moments side carries one row per group. Intermediates run in
  * DECIMAL(38,0), and the envelope is n·max|x| ≤ ~10¹⁸ (a trillion rows
  * of million-scale values): the worst term (n·x − S)²·kDen² then stays
  * inside 38 digits — the same headroom DuckDB's HUGEINT gives the
  * oracle. Beyond the envelope the job FAILS, never silently unflags:
  * under Spark's default ANSI mode every decimal overflow throws, and
  * the deviation magnitude additionally carries a named guard so the
  * most likely breach reports the envelope instead of a generic
  * NUMERIC_OUT_OF_RANGE. (With ANSI off, overflow nulls out — the named
  * guard still covers the deviation path, but don't run exact-algebra
  * operators in that mode.)
  */
object Outliers {

  /** Flag rows whose value sits more than kNum/kDen standard deviations
    * from its group mean. `value` must be integral-valued (fails the job
    * otherwise — float measurements are not exactly comparable).
    * Output: input columns + `_n` (group size, BIGINT) + `is_outlier`.
    * Constant groups (σ = 0) flag nothing; null values flag nothing and
    * are excluded from the moments.
    */
  private def integralOrDie(value: Column, where: String): Column = {
    val d19 = "decimal(19,0)"
    when(value.isNotNull &&
        value.cast(d19).cast("double") =!= value.cast("double"),
      raise_error(lit(s"$where: non-integral value (exact outlier algebra " +
        "needs integral measurements; scale to fixed-point first)"))
        .cast(d19))
      .otherwise(value.cast(d19))
  }

  def zscore(df: DataFrame, keys: Seq[String], value: Column,
      kNum: Int, kDen: Int): DataFrame = {
    require(kNum > 0 && kDen > 0, "zscore: need kNum, kDen > 0")
    val d19 = "decimal(19,0)"
    val xi = integralOrDie(value, "zscore")
    val in = df.withColumn("_x", xi)
    // NULL-SAFE stats join (<=> below): a null group key (failed language
    // detection etc.) gets its own moments row, and its rows must come
    // BACK with is_outlier computed — a plain equi-join would silently
    // drop them (neither flagged nor returned), same hazard
    // Quantiles.filterAtLeast guards against
    val stats = in.filter(col("_x").isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).cast(d19).as("_gn"),
        sum(col("_x")).cast(d19).as("_gs"),
        sum(col("_x") * col("_x")).cast("decimal(38,0)").as("_gss"))
      .select(keys.zipWithIndex.map { case (k, i) => col(k).as(s"_gk$i") } ++
        Seq(col("_gn"), col("_gs"), col("_gss")): _*)
    val lhs0 = (col("_gn") * col("_x") - col("_gs"))
    // |n·x − S| < 10¹⁸ keeps lhs²·kDen² inside DECIMAL(38,0); overflow
    // would null the comparison and silently UNFLAG, so fail loudly
    val lhs = when(abs(lhs0) >= lit("1000000000000000000").cast("decimal(19,0)"),
      raise_error(lit("zscore: deviation magnitude exceeds the exact-" +
        "arithmetic envelope (n*max|x| must stay below ~1e18)"))
        .cast("decimal(38,0)"))
      .otherwise(lhs0.cast("decimal(38,0)"))
    val varN2 = (col("_gn") * col("_gss") -
      (col("_gs") * col("_gs")).cast("decimal(38,0)"))
    val flagged = lhs * lhs * lit(kDen.toLong * kDen) >
      lit(kNum.toLong * kNum).cast("decimal(19,0)") * varN2
    // left join: a group with ONLY null measurements has no stats row;
    // its rows still come back (is_outlier = false)
    in.join(stats,
        keys.zipWithIndex.map { case (k, i) => col(k) <=> col(s"_gk$i") }
          .reduce(_ && _), "left")
      .withColumn("_n", coalesce(col("_gn").cast("long"), lit(0L)))
      .withColumn("is_outlier",
        col("_x").isNotNull && coalesce(flagged, lit(false)))
      .drop(Seq("_x", "_gn", "_gs", "_gss") ++
        keys.indices.map(i => s"_gk$i"): _*)
  }

  /** Robust per-group outlier flags via median absolute deviation — the
    * resistant twin of [[zscore]] (one extreme value drags a mean and
    * explodes a variance; it barely moves a median). A row is flagged
    * when kDen·|x − med| > kNum·MAD, where med is the group's LOWER
    * median (smallest v with 2·|rows ≤ v| ≥ n — an exact rank property,
    * not an interpolated float) and MAD the lower median of |x − med|.
    * Every comparison is integer arithmetic, so the flagged set is
    * engine-exact. Note MAD = 0 (over half the group at one value) flags
    * every deviating row — the conventional degenerate-MAD behavior.
    *
    * Scale shape: both medians come from [[Quantiles.valueThresholds]] —
    * counts-only exchanges and windows over DISTINCT values, never rows —
    * and join back broadcast (one row per group). The corpus is scanned
    * twice (once per median pass) and shuffled zero times.
    */
  def mad(df: DataFrame, key: String, value: Column,
      kNum: Int, kDen: Int): DataFrame = {
    require(kNum > 0 && kDen > 0, "mad: need kNum, kDen > 0")
    val in = df.withColumn("_x", integralOrDie(value, "mad"))
    val med = Quantiles.valueThresholds(in.filter(col("_x").isNotNull),
        key, col("_x"), 1, 2)
      .select(col(key).as("_graft_mk"), col("_threshold").as("_med"))
    val withDev = in
      .join(broadcast(med), col(key) <=> col("_graft_mk"), "left")
      .withColumn("_dev", abs(col("_x") - col("_med")))
    val madThr = Quantiles.valueThresholds(withDev.filter(col("_dev").isNotNull),
        key, col("_dev"), 1, 2)
      .select(col(key).as("_graft_dk"), col("_threshold").as("_mad"))
    withDev
      .join(broadcast(madThr), col(key) <=> col("_graft_dk"), "left")
      .withColumn("is_outlier", col("_dev").isNotNull &&
        col("_dev").cast("decimal(38,0)") * lit(kDen.toLong) >
          col("_mad").cast("decimal(38,0)") * lit(kNum.toLong))
      .withColumn("med", col("_med").cast("long"))
      .withColumn("mad", col("_mad").cast("long"))
      .drop("_x", "_dev", "_med", "_mad", "_graft_mk", "_graft_dk")
  }

  /** ROLLING z-score anomaly flags over a trailing time window — the
    * per-event form of [[zscore]] (fraud/abuse/telemetry monitoring):
    * each event is judged against ONLY its key's events in
    * `(t − windowUs, t)` — strictly before it, so the flag is
    * leakage-free and identical in a replay. The same exact integer
    * algebra, with the moments from a RANGE frame instead of a group
    * aggregate:
    *
    *   anomaly ⟺ n ≥ minPrior ∧ (n·x − S)²·kDen² > kNum²·(n·SS − S²)
    *
    * Scale shape: ONE exchange keyed by `keys`; the RANGE frame slides
    * over each key's time-sorted partition holding only the window's
    * rows. Ties at the same timestamp are window PEERS — both excluded
    * by the frame's `-1` bound, in every engine the same way.
    *
    * Adds: n_prior, is_anomaly.
    */
  def rollingAnomaly(df: DataFrame, keys: Seq[String], timeUs: Column,
      value: Column, windowUs: Long, kNum: Int, kDen: Int,
      minPrior: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(timeUs)
      .rangeBetween(-windowUs, -1L)
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val x = value.cast("long")
    val out = df
      .withColumn("_x", x)
      .withColumn("_n", count(col("_x")).over(w))
      .withColumn("_s", sum(col("_x")).over(w))
      .withColumn("_ss", sum(col("_x") * col("_x")).over(w))
    val n = col("_n").cast(d38)
    val s = col("_s").cast(d38)
    val ss = col("_ss").cast(d38)
    val dev = n * col("_x").cast(d38) - s
    out
      .withColumn("n_prior", col("_n"))
      .withColumn("is_anomaly",
        col("_n") >= minPrior &&
          dev * dev * lit(kDen.toLong * kDen) >
            lit(kNum.toLong * kNum) * (n * ss - s * s))
      .drop("_x", "_n", "_s", "_ss")
  }
}
