package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** k-nearest-neighbor SELF-join over a document corpus: for EVERY
  * document, its top-k most-similar neighbors by exact n-gram Jaccard —
  * the batch "related documents" / cluster-seeding primitive, where
  * [[Ann]] answers point queries against a corpus.
  *
  * Never all-pairs: candidates come from [[graft.dedup.Dedup
  * .ngramJaccard]]'s postings join (pairs share ≥1 surviving shingle,
  * bounded by the df-cut), so the similarity graph materializes only
  * edges above `minSim` and the top-k window runs over those edges —
  * at 100 TB the work scales with edges kept, not documents².
  */
object KnnJoin {

  /** Output: (doc, neighbor, jaccard, rank), rank 1..k per doc with
    * deterministic ties (jaccard desc, neighbor id asc). Documents with
    * no neighbor at `minSim` are absent — a LEFT join back to the corpus
    * reattaches them if the pipeline needs explicit "no match" rows.
    */
  def knnJoin(df: DataFrame, id: String, shingles: Column, k: Int,
      minSim: Double, maxShingleFreq: Int = 1000): DataFrame = {
    require(k >= 1, "k must be >= 1")
    // persisted: the symmetric-edge union below references this frame
    // twice, and everything upstream (postings pair emission + the
    // O(candidate-pairs) co-occurrence aggregation) would re-execute per
    // reference. The cache holds only surviving edges (jaccard ≥ minSim).
    val pairs = graft.Caches.track(
      graft.dedup.Dedup.ngramJaccard(df, id, shingles, minSim, maxShingleFreq).persist())
    // each surviving pair is an undirected edge: emit both directions and
    // rank within each doc's adjacency — the union doubles edge rows, not
    // candidate generation work
    val sym = pairs.select(col("a").as("doc"), col("b").as("neighbor"), col("jaccard"))
      .unionAll(pairs.select(col("b").as("doc"), col("a").as("neighbor"), col("jaccard")))
    val w = Window.partitionBy(col("doc"))
      .orderBy(col("jaccard").desc, col("neighbor").asc)
    sym.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("doc", "neighbor", "jaccard", "rank")
  }
}
