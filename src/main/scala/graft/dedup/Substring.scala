package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Exact duplicated-substring detection — the third axis of the dedup
  * family after document-level (exact/MinHash/SimHash/embedding) and
  * paragraph-level: find the SPANS of tokens that appear verbatim more
  * than once across the corpus, as popularized for LLM training data by
  * Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
  * Better", arXiv:2107.06499), which removes duplicated substrings of
  * ≥ 50 tokens via a corpus-wide suffix array.
  *
  * A suffix array is a single-machine construction; the Spark-native
  * shape is gram-run analysis: a token `L`-gram occurring ≥ 2 times in
  * the corpus is "duplicated", and a run of `r` consecutive duplicated
  * gram positions inside one document witnesses a substring of
  * `r + L - 1` tokens whose every `L`-window recurs elsewhere. For
  * span-removal purposes this over-approximates the suffix-array answer
  * only on composite runs (adjacent grams duplicated against *different*
  * partners chain into one reported span) — the conservative direction
  * for dedup.
  *
  * Scale design (the 100 TB contract):
  * - gram identity is a 64-bit hash ([[TextFunctions.shingleHashesOf]]):
  *   8-byte keys cross every exchange, text never leaves its scan;
  * - the duplicated-gram set is a COUNTS aggregate (map-side partial,
  *   `(hash, long)` pairs) — never a postings array, so a boilerplate
  *   gram occurring 10⁸ times costs one long per task in this pass
  *   (contrast [[Dedup.ngramJaccard]], which must build postings and
  *   df-cuts them count-first);
  * - marking duplicated positions splits by gram frequency, the
  *   [[Dedup.boundedBuckets]] counts-pattern: grams above `hotGramFreq`
  *   (at most |grams|/hotGramFreq keys, by construction) are marked via
  *   BROADCAST probe map-side, so the occurrence rows of pathologically
  *   ubiquitous grams NEVER shuffle; only moderate-frequency grams ride
  *   the semi-join exchange, where no reduce key exceeds `hotGramFreq`
  *   rows — the skew bound;
  * - the run/island window partitions by document, so its sort is
  *   bounded by document length, not corpus size.
  *
  * The reference engine has no text surface (SURVEY.md §0); this
  * operator belongs to the north-star LLM-pipeline family.
  */
object Substring {

  /** (`id`, `_pos`, `_g`): one row per token position with the 64-bit
    * hash of the `L`-gram starting there (0-based position).
    */
  private def grams(docs: DataFrame, id: String, toks: Column, L: Int): DataFrame =
    docs.select(col(id), posexplode(TextFunctions.shingleHashesOf(toks, L)))
      .toDF(id, "_pos", "_g")

  /** Duplicated-substring spans: (`id`, `span_start` 1-based,
    * `span_tokens`) for every maximal run of corpus-duplicated `L`-grams
    * covering ≥ `minSpanTokens` tokens. `minSpanTokens` must be ≥ `L`
    * (a single duplicated gram already witnesses `L` shared tokens).
    */
  def duplicatedSpans(docs: DataFrame, id: String, toks: Column, L: Int,
      minSpanTokens: Int, hotGramFreq: Int = 100000): DataFrame = {
    require(minSpanTokens >= L, s"minSpanTokens ($minSpanTokens) must be >= L ($L)")
    val dup = duplicatedPositions(docs, id, toks, L, hotGramFreq)
    val w = Window.partitionBy(col(id)).orderBy(col("_pos"))
    dup
      .withColumn("_run", col("_pos") - row_number().over(w))
      .groupBy(col(id), col("_run"))
      .agg((min(col("_pos")) + 1).cast("long").as("span_start"),
        (count(lit(1)) + lit(L - 1)).as("span_tokens"))
      .filter(col("span_tokens") >= minSpanTokens)
      .select(col(id), col("span_start"), col("span_tokens"))
  }

  /** Per-document duplication profile: (`id`, `n_grams`, `n_dup`) —
    * total gram positions and how many of them are corpus-duplicated.
    * Documents with no grams (shorter than `L` tokens) report (0, 0).
    * Integer signals by design: policy thresholds compare
    * `n_dup * k <=> n_grams * m` bit-exactly, no float round-trip.
    */
  def dupStats(docs: DataFrame, id: String, toks: Column, L: Int,
      hotGramFreq: Int = 100000): DataFrame = {
    val perDoc = duplicatedPositions(docs, id, toks, L, hotGramFreq)
      .groupBy(col(id)).agg(count(lit(1)).as("n_dup"))
    docs.select(col(id),
        coalesce(size(TextFunctions.shingleHashesOf(toks, L)), lit(0)).as("n_grams"))
      .join(perDoc, Seq(id), "left_outer")
      .select(col(id), col("n_grams").cast("long").as("n_grams"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"))
  }

  /** The surviving corpus under a duplication budget: documents whose
    * duplicated-gram fraction is at most `num/den` (compared in integer
    * arithmetic: keep iff `n_dup * den <= n_grams * num`). The Lee et al.
    * pipeline REWRITES documents by cutting spans; dropping over-budget
    * documents is the contract-checkable variant — rewriting changes
    * tokenization downstream and is a policy choice layered on
    * [[duplicatedSpans]].
    */
  def clean(docs: DataFrame, id: String, toks: Column, L: Int,
      num: Int, den: Int, hotGramFreq: Int = 100000): DataFrame = {
    val over = dupStats(docs, id, toks, L, hotGramFreq)
      .filter(col("n_dup") * den > col("n_grams") * num)
      .select(col(id))
    docs.join(over, Seq(id), "left_anti")
  }

  /** (`id`, `_pos`) of every gram position whose gram occurs ≥ 2 times
    * corpus-wide. One gram per position ⇒ the hot/rest branches are
    * disjoint by construction and the union never double-reports.
    */
  private def duplicatedPositions(docs: DataFrame, id: String, toks: Column,
      L: Int, hotGramFreq: Int): DataFrame = {
    // Persisted: the counts pass and both probe branches read one
    // materialization (8 + 8 + 4 bytes per token — the gram expansion is
    // narrow but not free, and three passes over a 100 TB scan would
    // pay the tokenizer thrice). The cache is also the optimizer leaf
    // that keeps the anti/semi probes from being pushed into any Union
    // inside `docs` (see Dedup.boundedBuckets).
    val g = graft.Caches.track(grams(docs, id, toks, L).persist())
    val counts = g.groupBy(col("_g")).agg(count(lit(1)).as("_n"))
    // hot grams: ≤ |grams|/hotGramFreq keys — broadcast-sized by
    // construction; their (id, pos) rows are marked map-side and never
    // cross an exchange, so a gram occurring 10⁸ times cannot skew the
    // semi-join below.
    val hot = counts.filter(col("_n") > hotGramFreq).select(col("_g"))
    val small = counts
      .filter(col("_n") >= 2 && col("_n") <= hotGramFreq).select(col("_g"))
    val hotHits = g.join(broadcast(hot), Seq("_g"), "left_semi")
    val restHits = g.join(broadcast(hot), Seq("_g"), "left_anti")
      .join(small, Seq("_g"), "left_semi")
    hotHits.unionByName(restHits).select(col(id), col("_pos"))
  }
}
