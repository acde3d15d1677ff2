package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training and application — the
  * vocabulary-building step of an LLM data pipeline.
  *
  * Scale shape (the shape every production BPE trainer uses): the corpus
  * is reduced to a WORD-COUNT table in one partial-aggregated shuffle
  * (counts, never text, cross the exchange); the merge loop then runs
  * over the bounded top-`maxWords` slice of that table — vocabulary
  * training is a sample-bounded computation by construction (the count
  * table's head covers almost all token mass; HuggingFace/SentencePiece
  * trainers bound it the same way), so the loop state is
  * O(maxWords · avgWordLen), independent of corpus size, and fetched via
  * TakeOrdered like the IVF centroid sample (similarity/Ivf.scala). The
  * learned merges broadcast back (≤ nMerges small string pairs) and
  * application is an embarrassingly-parallel per-partition pass with a
  * per-word memo — no shuffle at all.
  */
object Bpe {

  /** Learned merge table: rank-ordered symbol pairs. */
  final case class Merge(rank: Int, left: String, right: String)

  /** Per-word symbol split under a merge list, memoized per partition.
    * The memo is bounded (an access-ordered LRU of 64k words): corpora
    * follow Zipf, so the hot words hit while a pathological partition of
    * all-distinct words cannot grow the map without bound.
    */
  private final class Encoder(merges: Seq[Merge]) extends Serializable {
    private val rank: Map[(String, String), Int] =
      merges.map(m => (m.left, m.right) -> m.rank).toMap
    @transient private lazy val memo =
      new java.util.LinkedHashMap[String, Array[String]](1024, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, Array[String]]): Boolean = size() > 65536
      }

    def encode(word: String): Array[String] = {
      val hit = memo.get(word)
      if (hit != null) return hit
      var syms = word.map(_.toString).toArray
      var done = false
      while (!done && syms.length > 1) {
        // lowest-rank adjacent pair present in the merge table
        var best = Int.MaxValue
        var at = -1
        var i = 0
        while (i < syms.length - 1) {
          val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
          if (r < best) { best = r; at = i }
          i += 1
        }
        if (at < 0) done = true
        else {
          val merged = new Array[String](syms.length - 1)
          System.arraycopy(syms, 0, merged, 0, at)
          merged(at) = syms(at) + syms(at + 1)
          System.arraycopy(syms, at + 2, merged, at + 1, syms.length - at - 2)
          syms = merged
        }
      }
      memo.put(word, syms)
      syms
    }
  }

  /** Train `nMerges` BPE merges from a token column. The corpus collapses
    * to word counts distributedly; the merge loop runs on the driver over
    * the top `maxWords` words by count (ties broken by word for
    * determinism) — bounded state, as production trainers do.
    */
  def train(docs: DataFrame, toks: Column, nMerges: Int,
      maxWords: Int = 100000): Seq[Merge] = {
    require(nMerges >= 0, s"nMerges must be >= 0 (got $nMerges)")
    require(maxWords > 0, s"maxWords must be > 0 (got $maxWords)")
    val sp = docs.sparkSession
    import sp.implicits._
    val wordCounts: Array[(String, Long)] = docs
      .select(explode(toks).as("_w"))
      .groupBy(col("_w")).agg(count(lit(1)).as("_n"))
      .select(col("_w").as[String], col("_n").as[Long])
      .rdd
      // bounded fetch: top-maxWords by (count desc, word asc) via
      // TakeOrdered — never an unbounded collect
      .takeOrdered(maxWords)(Ordering.by { case (w, n) => (-n, w) })
    // driver merge loop over the bounded word table: O(maxWords·len) per
    // round, symbol sequences shrink monotonically
    val words = wordCounts.map { case (w, n) => (w.map(_.toString).toArray, n) }
    val merges = Seq.newBuilder[Merge]
    var syms = words
    var r = 0
    var exhausted = false
    val pairOrd = Ordering.Tuple2[String, String]
    while (r < nMerges && !exhausted) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      syms.foreach { case (ss, n) =>
        var i = 0
        while (i < ss.length - 1) {
          val k = (ss(i), ss(i + 1))
          pairCounts.update(k, pairCounts.getOrElse(k, 0L) + n)
          i += 1
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        // argmax by (count desc, pair asc) — deterministic across runs
        var best: ((String, String), Long) = null
        pairCounts.foreach { case (k, v) =>
          if (best == null || v > best._2 || (v == best._2 && pairOrd.lt(k, best._1)))
            best = (k, v)
        }
        val (l, rgt) = best._1
        merges += Merge(r, l, rgt)
        syms = syms.map { case (ss, n) =>
          if (ss.length < 2) (ss, n)
          else {
            val out = Array.newBuilder[String]
            var i = 0
            while (i < ss.length) {
              if (i < ss.length - 1 && ss(i) == l && ss(i + 1) == rgt) {
                out += ss(i) + ss(i + 1); i += 2
              } else { out += ss(i); i += 1 }
            }
            (out.result(), n)
          }
        }
        r += 1
      }
    }
    merges.result()
  }

  /** Apply learned merges to every document: (id, n_words, n_chars,
    * n_pieces) — `n_pieces` is the post-merge piece count;
    * `n_chars - n_pieces` is exactly the number of merge applications
    * (each merge joins two pieces), so `n_words <= n_pieces <= n_chars`
    * always. No shuffle: the merges broadcast inside the closure and the
    * pass is per-partition with a per-word memo.
    */
  def tokenStats(docs: DataFrame, id: String, toks: Column,
      merges: Seq[Merge]): DataFrame = {
    val sp = docs.sparkSession
    import sp.implicits._
    val enc = new Encoder(merges)
    docs.select(col(id).cast("long"), toks.cast("array<string>"))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        it.map { case (docId, words) =>
          var chars = 0L
          var pieces = 0L
          words.foreach { w =>
            chars += w.length
            pieces += enc.encode(w).length
          }
          (docId, words.size.toLong, chars, pieces)
        }
      }
      .toDF(id, "n_words", "n_chars", "n_pieces")
  }

  /** Full tokenization: one row per document with its BPE piece array
    * (pieces of word i precede pieces of word i+1 — the flat sequence a
    * packing step consumes).
    */
  def tokenize(docs: DataFrame, id: String, toks: Column,
      merges: Seq[Merge]): DataFrame = {
    val sp = docs.sparkSession
    import sp.implicits._
    val enc = new Encoder(merges)
    docs.select(col(id).cast("long"), toks.cast("array<string>"))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        it.map { case (docId, words) =>
          (docId, words.flatMap(w => enc.encode(w)))
        }
      }
      .toDF(id, "pieces")
  }
}
