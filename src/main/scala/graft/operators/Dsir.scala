package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** DSIR-style data selection via importance resampling (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling",
  * arXiv:2302.03169): given a small TARGET corpus (the distribution you
  * want more of — e.g. encyclopedic text) and the RAW corpus, fit
  * bag-of-n-gram count models over both, weight every raw document by the
  * smoothed log-likelihood ratio of its grams, and sample the training
  * set ∝ exp(weight) with the Gumbel-top-k trick — documents that look
  * like the target are kept with higher probability while the sampling
  * noise preserves diversity (the paper's advantage over hard top-k).
  *
  * Differences from the paper's single-machine implementation, chosen for
  * the distributed setting:
  * - grams are keyed by their 64-bit hash with the gram ORDER as part of
  *   the join key, not folded into a fixed 10k-bucket parameter vector:
  *   a join-keyed model has no hash-collision feature aliasing, and the
  *   model side of the scoring join is count-pruned rather than
  *   dimension-capped ([[fit]]'s `minCount`);
  * - the importance weight is the add-one-smoothed multinomial
  *   log-likelihood ratio Σ_g [log(t_g + 1) − log(T + V_t)] −
  *   [log(r_g + 1) − log(R + V_r)] (t_g/r_g per-gram counts, T/R total
  *   gram occurrences, V the model's distinct-gram count), computed from
  *   integer evidence sums so the count algebra is engine-exact and
  *   oracle-checkable even though the final float is not.
  *
  * Scale shape (the 100 TB contract): model fitting is one
  * partial-aggregated shuffle of (order, 8-byte hash) keys per corpus —
  * text never crosses an exchange. Scoring explodes each document's grams
  * once and joins the two models on the same 8-byte keys; the target
  * model (fit on a curated sliver) broadcasts, the raw model rides a
  * shuffled hash join. Resampling is a global top-k
  * (TakeOrderedAndProject — per-partition heads, driver merges k rows,
  * never a full sort).
  */
object Dsir {

  /** One struct row (`_n` gram order, `_g` 64-bit gram hash) per gram
    * OCCURRENCE of `toks`, orders concatenated. `_n` rides the join key so
    * unigram and bigram spaces cannot alias.
    */
  private def featArray(toks: Column, ns: Seq[Int]): Column =
    ns.map(n => transform(TextFunctions.shingleHashesOf(toks, n),
        g => struct(lit(n).as("_n"), g.as("_g"))))
      .reduce(concat(_, _))

  /** Fit a bag-of-n-grams count model: one row (`_n`, `_g`, `_cnt`) per
    * distinct gram with count ≥ `minCount`. `minCount` > 1 bounds the raw
    * model by cutting the hapax tail (absent grams score as count 0 under
    * add-one smoothing, so pruning only coarsens, never biases toward
    * selection).
    */
  def fit(corpus: DataFrame, toks: Column, ns: Seq[Int] = Seq(1, 2),
      minCount: Long = 1L): DataFrame = {
    require(ns.nonEmpty, "dsir: at least one gram order")
    val m = corpus.select(explode(featArray(toks, ns)).as("_f"))
      .groupBy(col("_f._n").as("_n"), col("_f._g").as("_g"))
      .agg(count(lit(1)).as("_cnt"))
    if (minCount > 1L) m.filter(col("_cnt") >= minCount) else m
  }

  /** Score every document against a fitted (target, raw) model pair: one
    * row per input doc with integer evidence — `n_feats` (gram
    * occurrences), `t_hits`/`r_hits` (occurrences whose gram is in the
    * target/raw model), `t_hit_sum`/`r_hit_sum` (summed model counts over
    * hits) — plus `log_w`, the smoothed log-likelihood-ratio importance
    * weight (null for gram-less docs). The integer columns are
    * engine-exact (what the DuckDB oracle verifies); `log_w` is the
    * ranking signal [[resample]] draws against. `ns` must match what the
    * models were [[fit]] with.
    */
  def score(docs: DataFrame, id: String, toks: Column, target: DataFrame,
      raw: DataFrame, ns: Seq[Int] = Seq(1, 2)): DataFrame = {
    val tTot = broadcast(
      target.agg(sum("_cnt").as("_T"), count(lit(1)).as("_Vt")))
    val rTot = broadcast(
      raw.agg(sum("_cnt").as("_R"), count(lit(1)).as("_Vr")))
    val grams = docs.select(col(id), explode(featArray(toks, ns)).as("_f"))
      .select(col(id), col("_f._n").as("_n"), col("_f._g").as("_g"))
    val scored = grams
      .join(broadcast(target.withColumnRenamed("_cnt", "_t")), Seq("_n", "_g"), "left")
      .join(raw.withColumnRenamed("_cnt", "_r"), Seq("_n", "_g"), "left")
      .groupBy(col(id))
      .agg(
        count(lit(1)).as("n_feats"),
        count(col("_t")).as("t_hits"),
        count(col("_r")).as("r_hits"),
        coalesce(sum(col("_t")), lit(0L)).as("t_hit_sum"),
        coalesce(sum(col("_r")), lit(0L)).as("r_hit_sum"),
        sum(log((coalesce(col("_t"), lit(0L)) + 1).cast("double")) -
          log((coalesce(col("_r"), lit(0L)) + 1).cast("double"))).as("_lr"))
    docs.select(col(id)).join(scored, Seq(id), "left")
      .crossJoin(tTot).crossJoin(rTot)
      .select(col(id),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("t_hits"), lit(0L)).as("t_hits"),
        coalesce(col("r_hits"), lit(0L)).as("r_hits"),
        coalesce(col("t_hit_sum"), lit(0L)).as("t_hit_sum"),
        coalesce(col("r_hit_sum"), lit(0L)).as("r_hit_sum"),
        (col("_lr") - col("n_feats").cast("double") *
          (log((col("_T") + col("_Vt")).cast("double")) -
            log((col("_R") + col("_Vr")).cast("double")))).as("log_w"))
  }

  /** Gumbel-top-k importance resample: `k` rows drawn WITHOUT replacement
    * ∝ exp(`weight` / `temperature`) — each row's key is
    * weight/temperature + Gumbel(0,1) noise and the global top-k by key
    * is exactly a Plackett-Luce sample (Gumbel-max trick). The noise is
    * derived from `id` through the engine-stable multiplicative ring
    * ([[Sampling.hashBucket]]), so the draw is deterministic for a given
    * (seed, temperature) and reproducible across runs and engines — a
    * dataset VERSION, not a dice roll. Null weights (gram-less docs)
    * sample last. Temperature → 0 approaches hard top-k; the paper's
    * sampled selection is temperature = 1.
    */
  def resample(scored: DataFrame, id: Column, k: Int, seed: Long,
      weight: Column = col("log_w"), temperature: Double = 1.0): DataFrame = {
    require(k > 0, "dsir: k must be positive")
    require(temperature > 0, "dsir: temperature must be positive")
    val u = (Sampling.hashBucket(id + lit(seed), 1 << 30).cast("double") + 0.5) /
      (1 << 30).toDouble
    val key = coalesce(weight, lit(Double.MinValue)) / temperature - log(-log(u))
    scored.withColumn("_gumbel_key", key)
      .orderBy(col("_gumbel_key").desc, id.asc)
      .limit(k)
      .drop("_gumbel_key")
  }
}
