package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Collocation mining: rank adjacent token pairs by pointwise mutual
  * information — the corpus-analysis pass behind phrase vocabularies
  * (word2vec phrase join, tokenizer merge candidates) and corpus-drift
  * dashboards. PMI = log p(x,y)/(p(x)p(y)); ranking only needs the
  * MONOTONE argument, so the score is the exact fixed-point rational
  *
  *   score_fp = ⌊ c(x,y) · N · 10⁶ / (c(x) · c(y)) ⌋
  *
  * in DECIMAL(38,0) — no log, no float, engine-exact (a float PMI would
  * tie-break differently across engines; the floor-divided rational
  * never does). N = total bigram count.
  *
  * Scale shape: unigram and bigram tallies are counts-only partial
  * aggregates (8-byte-hash-sized keys and longs cross the exchanges, the
  * corpus text never moves); the score join attaches two count frames by
  * token equality; N rides a broadcast 1-row crossJoin (the established
  * statistics-frame pattern); top-k is a TakeOrdered, never a global
  * sort.
  */
object Collocations {

  /** Top-`k` collocations among pairs with c(x,y) ≥ `minCount`:
    * (x, y, n_xy, score_fp), ordered by (score_fp, x, y) descending on
    * score — the deterministic total order.
    */
  def pmiTopK(df: DataFrame, tokens: Column, minCount: Long, k: Int): DataFrame = {
    val toks = df.select(tokens.as("_ts"))
    val uni = toks.select(explode(col("_ts")).as("x"))
      .groupBy("x").agg(count(lit(1)).as("_cx"))
    val bi = toks.select(explode(
        // adjacent pairs via a positional zip of the array with itself
        // shifted by one — array expressions, no second explode pass
        zip_with(slice(col("_ts"), lit(1), greatest(size(col("_ts")) - 1, lit(0))),
          slice(col("_ts"), lit(2), greatest(size(col("_ts")) - 1, lit(0))),
          (a, b) => struct(a.as("x"), b.as("y")))).as("_p"))
      .select(col("_p.x").as("x"), col("_p.y").as("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("n_xy"))
    val n = bi.agg(sum(col("n_xy")).cast("decimal(38,0)").as("_n"))
    bi.filter(col("n_xy") >= minCount)
      .join(uni, "x")
      .join(uni.select(col("x").as("y"), col("_cx").as("_cy")), "y")
      .crossJoin(broadcast(n))
      // `div` (IntegralDivide over decimals → BIGINT) not `/`: decimal
      // division rounds at its result scale BEFORE any floor(), which
      // can round x.9999995 up across the floor boundary — `div`
      // truncates exactly, as DuckDB's `//` does
      .select(col("x"), col("y"), col("n_xy"),
        (col("n_xy").cast("decimal(38,0)") * col("_n") * lit(1000000L))
          .as("_num"),
        (col("_cx").cast("decimal(38,0)") * col("_cy").cast("decimal(38,0)"))
          .as("_den"))
      .withColumn("score_fp", expr("_num div _den"))
      .select(col("x"), col("y"), col("n_xy"), col("score_fp"))
      .orderBy(col("score_fp").desc, col("x").desc, col("y").desc)
      .limit(k)
  }
}
