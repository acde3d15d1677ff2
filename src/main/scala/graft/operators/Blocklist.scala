package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Domain-blocklist filtering — the crawl-curation gate that runs right
  * after URL canonicalization in a training-data pipeline (UT1-style
  * blocklists in RefinedWeb/FineWeb): an entry `b.c` blocks the host
  * `b.c` AND every subdomain `*.b.c`, so membership is a match on any
  * registrable SUFFIX of the host's label chain, not a string equality.
  * (North-star op beyond the reference's surface; the hierarchical-key
  * semi-join shape is the same one a path-prefix ACL check uses.)
  *
  * Scale shape (100-TB lens): the document payload NEVER amplifies —
  * the suffix explosion (≤ label-count rows, hosts have ~2-6 labels)
  * carries (id, suffix) only; the blocklist is dimension-sized and AQE
  * broadcast-promotes the membership join; what comes back is a
  * DISTINCT id-only frame (8 B/row) that anti-joins the documents —
  * blocked ids are a small fraction of the corpus, so AQE broadcasts
  * that side too, and the documents themselves cross no exchange. The
  * per-row alternative (`arrays_overlap` against one collected-array
  * row) re-scans the whole blocklist per document — the exact shape the
  * round-13 StripLinesByHash fix removed.
  */
object Blocklist {

  /** All dot-suffixes of `host` that start at a label boundary:
    * `a.b.co` → [`a.b.co`, `b.co`, `co`].
    */
  def hostSuffixes(host: Column): Column = {
    val labels = split(host, "\\.")
    transform(sequence(lit(1), size(labels)),
      i => array_join(slice(labels, i, size(labels)), "."))
  }

  /** Rows of `docs` whose `host` matches no blocklist entry (exact host
    * or any parent domain). `blocklist` must expose a `pattern` column
    * of lowercase registrable domains; `id` must be unique in `docs`
    * (it keys the anti-join back onto the untouched payload).
    */
  def filterBlocked(docs: DataFrame, id: String, host: Column,
      blocklist: DataFrame): DataFrame = {
    val blockedIds = docs
      .select(col(id).as("_bl_id"), explode(hostSuffixes(host)).as("_sfx"))
      .join(blocklist.select(col("pattern").as("_sfx")).distinct(), "_sfx")
      .select(col("_bl_id")).distinct()
    docs.join(blockedIds, col(id) === col("_bl_id"), "left_anti")
  }

  /** Driver-side row bound for a broadcast blocklist: real blocklists
    * are dimension-sized (UT1's adult list is ~4M domains = 64 MB of
    * hash pairs at this bound), and the membership index is 16 B per
    * entry — same size class and fail-fast contract as
    * [[graft.dedup.Dedup.DefaultMaxIndexEntries]].
    */
  val DefaultMaxPatterns: Int = 4000000

  /** Zero-shuffle variant of [[filterBlocked]] for STREAMS and map-side
    * pre-filters: the blocklist is collected under a fail-fast row bound
    * (count probe BEFORE any driver materialization), hashed to a sorted
    * [[graft.functions.SortedHashPairs]] index (16 B per pattern),
    * broadcast once, and each row's host suffixes are probed by one
    * codegen'd binary-search expression — no explode, no join, no
    * exchange of any kind on the document side, the only shape that
    * holds when the stream never ends. Membership is by the two-seed
    * 128-bit hash (a false block needs a 128-bit collision). Semantics
    * identical to [[filterBlocked]] (fuzz-pinned in Round13Spec); an
    * above-bound blocklist must use the distributed join path.
    */
  def filterBlockedBroadcast(docs: DataFrame, host: Column,
      blocklist: DataFrame, maxPatterns: Int = DefaultMaxPatterns): DataFrame = {
    val cached = blocklist.select(col("pattern")).distinct().persist()
    val sorted =
      try {
        val n = cached.count()
        if (n > maxPatterns) throw new IllegalArgumentException(
          s"filterBlockedBroadcast: blocklist has $n patterns, exceeding " +
            s"maxPatterns=$maxPatterns — the list is driver-collected and " +
            "broadcast; use filterBlocked (distributed join) for larger " +
            "lists, or raise maxPatterns")
        graft.functions.SortedHashPairs.ofStrings(
          cached.collect().map(_.getString(0)))
      } finally { cached.unpersist(false); () }
    val bc = docs.sparkSession.sparkContext.broadcast(sorted)
    import org.apache.spark.sql.graftbridge.Bridge
    // coalesce(probe, false): a NULL host probes to null, and filter(!null)
    // would silently DROP the row — while the join path keeps it (explode
    // of a null suffix array yields no blocked id). Null hosts are kept on
    // both paths (null-host case fuzz-pinned in Round13Spec).
    docs.filter(!coalesce(Bridge.column(graft.functions.AnyHashInIndex(
      Bridge.expression(hostSuffixes(host)), bc)), lit(false)))
  }
}
