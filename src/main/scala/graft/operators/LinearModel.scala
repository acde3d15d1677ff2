package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sparse linear-model INFERENCE over tokenized text — the
  * quality-classifier scoring pass every large-scale curation pipeline
  * runs (fasttext / logistic-regression style: a trained weight per
  * term, document score = Σ tf(term)·w(term) + bias). Training happens
  * elsewhere; what the engine owns is scoring 100 TB of documents
  * against a weight table, and that is a broadcast join, not a model
  * runtime.
  *
  * Scale shape: tokens explode map-side and join the BROADCAST weight
  * table (a vocabulary is MBs — it never shuffles the corpus); the only
  * exchange carries (id, partial margin) pairs, partial-aggregated
  * map-side, one row per document per task. Documents with no in-vocab
  * token keep margin = 0 via the final left join on ids (id pairs only).
  * Weights are fixed-point integers so the margin is engine-exact —
  * a float dot product would drift with summation order across
  * partitionings.
  */
object LinearModel {

  /** Score each row's `tokens` against `weights` (`termCol` →
    * `weightCol`, fixed-point integer): adds `out` = Σ tf·w and
    * `out + "_keep"` = (margin ≥ `biasFp`).
    */
  def score(df: DataFrame, id: String, tokens: Column,
      weights: DataFrame, termCol: String = "term",
      weightCol: String = "weight_fp", biasFp: Long = 0L,
      out: String = "margin_fp"): DataFrame = {
    // a duplicated term would silently DOUBLE-count its weight in every
    // margin — fail by name instead (the survivorship guard pattern);
    // the check rides the broadcast-sized weight table, one cheap
    // aggregate, and the raise_error wraps the weight itself so column
    // pruning can never drop the guard while weights are in use
    val dupGuard = weights.groupBy(col(termCol))
      .agg(sum(col(weightCol)).cast("long").as("_w"), count(lit(1)).as("_n"))
      .select(col(termCol).as("_t"),
        when(col("_n") > 1, raise_error(concat(
          lit("LinearModel.score: term '"), col(termCol),
          lit("' appears more than once in the weight table — " +
            "aggregate weights per term first"))).cast("long"))
          .otherwise(col("_w")).as("_w"))
    val w = broadcast(dupGuard)
    // no (doc, term) tf pre-aggregation: each occurrence contributes its
    // weight directly, so the single exchange is the per-doc sum
    val margins = df.select(col(id), explode(tokens).as("_t"))
      .join(w, "_t")
      .groupBy(col(id)).agg(sum(col("_w")).as("_m"))
    df.join(margins, Seq(id), "left")
      .withColumn(out, coalesce(col("_m"), lit(0L)))
      .withColumn(out + "_keep", col(out) >= biasFp)
      .drop("_m")
  }
}
