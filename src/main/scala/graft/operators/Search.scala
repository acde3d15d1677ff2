package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Inverted-index search over a tokenized corpus — the read-side
  * counterpart of the BM25 ranking and vocab/postings statistics
  * queries: boolean retrieval (conjunction + exclusion) and exact
  * phrase matching over positional postings.
  *
  * Scale shape: everything is an equi-join on (token) or
  * (doc, position) keys. Boolean conjunction is ONE grouped count over
  * the must-term postings (a doc matches iff it holds all |must|
  * distinct terms — no |must|-way self-join), exclusion is one
  * anti-join; phrase matching chains |phrase|−1 co-partitioned
  * (doc, pos) joins, each narrowing the candidate set, with positions as
  * 8-byte integers — document text never crosses an exchange.
  */
object Search {

  /** Positional postings: one row per token occurrence —
    * (doc_id `id`, `token`, 1-based `pos`).
    */
  def positionalPostings(docs: DataFrame, id: Column, tokens: Column): DataFrame =
    docs.select(id.as("doc_id"), posexplode(tokens).as(Seq("_p0", "token")))
      .select(col("doc_id"), col("token"), (col("_p0") + 1).as("pos"))

  /** Documents containing ALL of `must` and NONE of `mustNot`.
    * Output: matching doc_ids.
    */
  def boolean(postings: DataFrame, must: Seq[String],
      mustNot: Seq[String] = Seq.empty): DataFrame = {
    require(must.nonEmpty, "search: at least one must-term")
    // distinct the query terms: a repeated must-term (verbatim user
    // queries) must not raise the per-doc distinct-count bar above what
    // any document can reach
    val mustD = must.distinct
    val hits = postings
      .filter(col("token").isin(mustD: _*))
      .select(col("doc_id"), col("token")).distinct()
      .groupBy(col("doc_id")).agg(count(lit(1)).as("_nt"))
      .filter(col("_nt") === mustD.size)
      .select(col("doc_id"))
    if (mustNot.isEmpty) hits
    else hits.join(
      postings.filter(col("token").isin(mustNot: _*)).select(col("doc_id")),
      Seq("doc_id"), "left_anti")
  }

  /** Exact phrase occurrences: documents containing `phrase` as adjacent
    * tokens, with the match count per document. Output:
    * (doc_id, n_occurrences).
    */
  def phrase(postings: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.size >= 2, "phrase: at least two tokens")
    val first = postings.filter(col("token") === phrase.head)
      .select(col("doc_id"), col("pos"))
    // chain: survivors after step i are phrase-prefix matches of length
    // i+1, keyed by (doc, start position) — each join aligns the next
    // word's position back to the start
    val matches = phrase.tail.zipWithIndex.foldLeft(first) {
      case (acc, (w, i)) =>
        val next = postings.filter(col("token") === w)
          .select(col("doc_id").as("_d"), (col("pos") - (i + 1)).as("_p"))
        acc.join(next, acc("doc_id") === col("_d") && acc("pos") === col("_p"))
          .select(acc("doc_id"), acc("pos"))
    }
    matches.groupBy(col("doc_id")).agg(count(lit(1)).as("n_occurrences"))
  }

  /** Reciprocal-rank fusion (Cormack et al., SIGIR'09) — the standard
    * hybrid-retrieval combiner: fuse per-query rankings from independent
    * legs (lexical BM25, dense ANN, …) into one ranking by
    * `rrf_fp(d) = Σ_legs ⌊10⁶ / (rrfK + rank_leg(d))⌋`. The fusion reads
    * RANKS only, so it is integer-exact regardless of each leg's float
    * scoring, and a document absent from a leg simply contributes
    * nothing — no score normalization, no floats, oracle-replayable.
    *
    * Legs are (query, doc_id, rank) frames (rank 1-based within query).
    * Output: (query, doc_id, rrf_fp, rank) — the top `k` fused documents
    * per query under (rrf_fp DESC, doc_id ASC).
    *
    * Scale shape: each leg is already a bounded per-query top-K, so the
    * union carries ≤ legs·K rows per query; the fusion is one grouped
    * integer sum on (query, doc_id) with map-side partials plus a
    * per-query window over those bounded rows — no corpus-sized exchange
    * anywhere, independent of corpus size.
    */
  def rrfFuse(legs: Seq[DataFrame], k: Int, rrfK: Int = 60): DataFrame = {
    require(legs.nonEmpty, "rrfFuse: at least one leg")
    require(k > 0 && rrfK >= 0, s"rrfFuse: bad k=$k / rrfK=$rrfK")
    val tagged = legs
      .map(_.select(col("query"), col("doc_id"), col("rank")))
      .reduce(_ unionByName _)
    val fused = tagged
      .groupBy(col("query"), col("doc_id"))
      .agg(sum(expr(s"1000000L div (${rrfK}L + rank)")).as("rrf_fp"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query"))
      .orderBy(col("rrf_fp").desc, col("doc_id").asc)
    fused.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query"), col("rank"), col("doc_id"), col("rrf_fp"))
  }
}
