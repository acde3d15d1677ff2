package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Benchmark decontamination: remove (or flag) training documents that
  * share a word n-gram with an evaluation/benchmark corpus, the standard
  * leakage guard in LLM training-data pipelines (n-gram overlap
  * decontamination, as published for GPT-3 [Brown et al. 2020, appendix C],
  * Gopher [Rae et al. 2021] and PaLM — typically with n between 8 and 13).
  *
  * Scale design (100 TB corpus, MB-to-GB benchmark suite):
  * - gram identity is a 64-bit hash ([[TextFunctions.shingleHashesOf]]),
  *   so the benchmark side reduces to a distinct set of 8-byte keys and
  *   document text never leaves its scan projection;
  * - the benchmark gram set is broadcast (eval suites are tiny next to the
  *   corpus), making contamination detection a map-side semi-join — the
  *   only shuffle in [[flag]] is the final partial-aggregated per-doc
  *   count, and the only rows that cross it are actual hits;
  * - per-document grams are `array_distinct`-ed BEFORE the explode, so a
  *   document that repeats one boilerplate gram a thousand times
  *   contributes one probe row, not a thousand.
  *
  * Set `broadcastBench = false` for a pathologically large benchmark set:
  * the probe becomes a shuffled equi-join on the same 8-byte keys.
  *
  * 64-bit hashing makes membership probabilistic in principle: a false
  * hit needs two distinct grams colliding in 2^64 space with one side in
  * the benchmark (negligible at any realistic gram count; a collision
  * over-flags, never under-flags within a doc's distinct grams).
  *
  * The reference has no text-function surface at all (SURVEY.md §0); this
  * operator is part of the north-star LLM-pipeline surface.
  */
object Decontaminate {

  /** Benchmark gram set: one row (`_g`, 8 bytes) per distinct word
    * `n`-gram hash in `benchToks`. This is what a pipeline persists next
    * to the benchmark suite — rebuild is a single narrow pass.
    */
  def benchGrams(bench: DataFrame, benchToks: Column, n: Int): DataFrame =
    bench.select(explode(TextFunctions.shingleHashesOf(benchToks, n)).as("_g"))
      .distinct()

  /** Per-document contamination: (`id`, `n_hits`) for every document with
    * at least one distinct word n-gram appearing in the benchmark set —
    * `n_hits` counts the document's distinct contaminated grams. Clean
    * documents do not appear (flag is a report, not a row multiplier).
    */
  def flag(docs: DataFrame, id: String, toks: Column, bench: DataFrame,
      benchToks: Column, n: Int, broadcastBench: Boolean = true): DataFrame = {
    val bg0 = benchGrams(bench, benchToks, n)
    val bg = if (broadcastBench) broadcast(bg0) else bg0
    docs
      .select(col(id), explode(array_distinct(TextFunctions.shingleHashesOf(toks, n))).as("_g"))
      .join(bg, Seq("_g"))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** The surviving corpus: `docs` rows whose text shares NO word n-gram
    * with the benchmark. Anti-join against [[flag]]'s id set — document
    * rows never shuffle (the contaminated-id side, already tiny, builds
    * the broadcast hash table when it fits).
    */
  def clean(docs: DataFrame, id: String, toks: Column, bench: DataFrame,
      benchToks: Column, n: Int, broadcastBench: Boolean = true): DataFrame =
    docs.join(flag(docs, id, toks, bench, benchToks, n, broadcastBench).select(col(id)),
      Seq(id), "left_anti")

  /** [[clean]] against a PREBUILT gram index (a [[benchGrams]] result,
    * typically read back from its persisted parquet home — the production
    * shape: the benchmark suite is hashed once, and every ingestion batch
    * probes the 8-byte gram set without re-tokenizing the benchmark).
    * `grams` must have been built with the same `n` and tokenization.
    */
  def cleanIndexed(docs: DataFrame, id: String, toks: Column, grams: DataFrame,
      n: Int, broadcastBench: Boolean = true): DataFrame = {
    val bg0 = grams.select(col("_g"))
    val bg = if (broadcastBench) broadcast(bg0) else bg0
    val contaminated = docs
      .select(col(id), explode(array_distinct(TextFunctions.shingleHashesOf(toks, n))).as("_g"))
      .join(bg, Seq("_g"))
      .select(col(id)).distinct()
    docs.join(contaminated, Seq(id), "left_anti")
  }

  /** SEMANTIC decontamination — the embedding-space twin of the n-gram
    * guard: drop corpus rows whose embedding is within cosine
    * `threshold` of ANY benchmark embedding. N-gram overlap misses
    * paraphrased leakage (a reworded benchmark question shares no
    * 8-gram); the embedding check catches it. Benchmark suites are tiny,
    * so the benchmark side broadcasts and the corpus is scanned once
    * with the cosine check fused per partition — no corpus shuffle, no
    * candidate generation needed (|bench| probes per row, not |corpus|²).
    * `docs` rows with a null vector pass through (nothing to compare).
    */
  def cleanSemantic(docs: DataFrame, id: String, vec: Column,
      bench: DataFrame, benchVec: Column, threshold: Double): DataFrame = {
    val bv = broadcast(
      bench.select(benchVec.cast("array<double>").as("_bv"))
        .filter(col("_bv").isNotNull))
    val contaminated = docs
      .select(col(id), vec.cast("array<double>").as("_dv"))
      .filter(col("_dv").isNotNull)
      .crossJoin(bv)
      .filter(graft.functions.VectorFunctions.cosineFused(col("_dv"), col("_bv"))
        >= threshold)
      .select(col(id)).distinct()
    docs.join(contaminated, Seq(id), "left_anti")
  }
}
