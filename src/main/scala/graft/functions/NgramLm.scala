package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-based bigram language model over a token column — the
  * distributed shape of CCNet-style LM quality filtering (train a
  * smallish LM on a reference corpus, score every document by how well
  * the model predicts it; docs the model finds surprising are dropped or
  * down-weighted).
  *
  * Scale shape: training is two partial-aggregated shuffles of 8-byte
  * gram hashes (bigram counts, then context counts) plus one hash join
  * between them — token text never crosses an exchange. Scoring joins
  * each document's gram hashes against the model on the same 8-byte key;
  * with the standard min-count prune the model is orders of magnitude
  * smaller than the corpus, so Spark's size estimate broadcasts it when
  * it fits and falls back to a shuffled hash join when it doesn't — both
  * plans are one pass over the corpus.
  *
  * Grams are keyed by `xxhash64`; a 64-bit collision would merge two
  * gram contexts (birthday bound ~2^32 distinct grams — add a second
  * seed as in [[graft.dedup.Dedup.exactFingerprint]] if a vocabulary
  * that large is expected).
  */
object NgramLm {

  /** Adjacent token pairs of `toks` as (w1, w2) structs; empty array for
    * 0- and 1-token documents.
    */
  private def bigramPairs(toks: Column): Column = {
    val n = size(toks)
    arrays_zip(
      slice(toks, lit(1), greatest(n - 1, lit(0))).as("w1"),
      slice(toks, lit(2), greatest(n - 1, lit(0))).as("w2"))
  }

  private def gramHash(pair: Column): Column = xxhash64(pair("w1"), pair("w2"))
  private def ctxHash(pair: Column): Column = xxhash64(pair("w1"))

  /** Train a bigram count model: one row per surviving bigram with
    * `_g` (bigram hash), `_cnt` (bigram count), `_ctx` (count of the
    * leading token as a bigram context — the conditional's denominator).
    * `minCount` prunes hapax grams (the standard cut that keeps the model
    * bounded: the long tail of once-seen bigrams is most of the distinct
    * mass and carries no reusable signal).
    */
  def train(docs: DataFrame, toks: Column, minCount: Long = 2L): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1 (got $minCount)")
    val pairs = docs.select(explode(bigramPairs(toks)).as("_p"))
      .select(gramHash(col("_p")).as("_g"), ctxHash(col("_p")).as("_c"))
    val big = pairs.groupBy(col("_g"))
      // _g determines the leading token (modulo 64-bit collision), so any
      // _c in the group is THE context hash; min() keeps the aggregation
      // partial-aggregatable instead of carrying a first() through
      .agg(count(lit(1)).as("_cnt"), min(col("_c")).as("_c"))
      .filter(col("_cnt") >= minCount)
    val uni = pairs.groupBy(col("_c")).agg(count(lit(1)).as("_ctx"))
    big.join(uni, "_c").select(col("_g"), col("_cnt"), col("_ctx"))
  }

  /** Score every document against a trained model: one row per input doc
    * with integer evidence columns — `n_bigrams` (total bigrams in the
    * doc), `n_hits` (bigrams present in the model), `hit_cnt_sum` /
    * `hit_ctx_sum` (summed model counts over the hits) — plus
    * `avg_logp`, the average add-one-smoothed log p(w2|w1) over the
    * doc's bigrams (null for docs with none). The integer columns are
    * engine-exact (they are what the DuckDB oracle verifies); `avg_logp`
    * is the ranking signal a filter thresholds on.
    */
  def score(docs: DataFrame, model: DataFrame, id: String, toks: Column): DataFrame = {
    val grams = docs.select(col(id), explode(bigramPairs(toks)).as("_p"))
      .select(col(id), gramHash(col("_p")).as("_g"))
    val scored = grams.join(model, Seq("_g"), "left")
      .groupBy(col(id))
      .agg(
        count(lit(1)).as("n_bigrams"),
        count(col("_cnt")).as("n_hits"),
        coalesce(sum(col("_cnt")), lit(0L)).as("hit_cnt_sum"),
        coalesce(sum(col("_ctx")), lit(0L)).as("hit_ctx_sum"),
        avg(log((coalesce(col("_cnt"), lit(0L)) + 1).cast("double") /
          (coalesce(col("_ctx"), lit(0L)) + 2).cast("double"))).as("avg_logp"))
    docs.select(col(id)).join(scored, Seq(id), "left")
      .select(col(id),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        coalesce(col("hit_cnt_sum"), lit(0L)).as("hit_cnt_sum"),
        coalesce(col("hit_ctx_sum"), lit(0L)).as("hit_ctx_sum"),
        col("avg_logp"))
  }
}
