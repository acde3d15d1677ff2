package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.VectorFunctions

/** Semantic deduplication over an embedding column — the SemDeDup recipe
  * (Abbas et al. 2023, arXiv:2303.09540): k-means-cluster the embedding
  * space, then compare ONLY within clusters, so near-duplicate *meaning*
  * (paraphrases, templated rewrites — invisible to token-level MinHash/
  * SimHash) is pruned without an all-pairs pass.
  *
  * Relation to [[graft.dedup.Dedup.embeddingCosine]]: that operator
  * buckets by random-hyperplane LSH (high-threshold near-identical
  * vectors); SemDeDup's learned k-means cells keep recall at the LOWER
  * thresholds semantic dedup runs at (0.7-0.95), where LSH sign-agreement
  * probability collapses.
  *
  * Scale shape: centroids come from a bounded deterministic sample
  * ([[Ivf.trainCentroids]] — TakeOrdered, never a full collect; the
  * centroid matrix is a few k×d doubles riding inside the assignment
  * expression). Assignment is one narrow pass; candidate generation is a
  * cluster-key equi-join guarded by the shared counts-based `maxCluster`
  * bound (drops reported via observe metrics, rows of over-bound clusters
  * never cross the exchange). Choose k ≈ corpus/1e4 at scale so clusters
  * stay join-sized; the within-cluster cost is Σ|cluster|², never n².
  */
object SemDedup {

  /** k-means cluster id for every vector: (`id`, `cluster`). Assignment
    * is deterministic for a given (k, iters, sampleN, seed, sampleMod) —
    * identical vectors always land in the same cluster.
    */
  def assign(vecs: DataFrame, id: String, vec: String, k: Int, iters: Int = 10,
      sampleN: Int = 10000, seed: Long = 11L, sampleMod: Int = 1): DataFrame = {
    val cs = Ivf.trainCentroids(vecs, id, vec, k, iters, sampleN, seed, sampleMod)
    Ivf.index(vecs, id, vec, cs)
      .select(col("neighbor_id").as(id), col("_cell").as("cluster"))
  }

  /** Semantic near-dup pairs (`a` < `b`, cosine ≥ threshold) found within
    * shared k-means clusters. Pairs straddling a cluster boundary are not
    * candidates — that's the SemDeDup trade: for dedup purposes a pair
    * that near-coincides sits by the same centroid with overwhelming
    * probability, and the cost stays linear in cluster volume.
    */
  def pairs(vecs: DataFrame, id: String, vec: String, k: Int, threshold: Double,
      iters: Int = 10, sampleN: Int = 10000, seed: Long = 11L,
      sampleMod: Int = 1, maxCluster: Int = 10000): DataFrame = {
    val cs = Ivf.trainCentroids(vecs, id, vec, k, iters, sampleN, seed, sampleMod)
    val clustered = Dedup.boundedBuckets(
      Ivf.index(vecs, id, vec, cs).withColumnRenamed("_cell", "_bucket"),
      Seq("_bucket"), maxCluster, "semdedup_clusters")
    val a = clustered.select(col("_bucket"), col("neighbor_id").as("a"), col("_cv").as("_va"))
    val b = clustered.select(col("_bucket"), col("neighbor_id").as("b"), col("_cv").as("_vb"))
    // one cluster per vector → each (a, b) arises from exactly one join
    // key; no cross-band dedup pass needed (unlike the LSH operators)
    a.hint("merge").join(b, "_bucket").filter(col("a") < col("b"))
      .withColumn("cosine", VectorFunctions.cosineFused(col("_va"), col("_vb")))
      .filter(col("cosine") >= threshold)
      .select("a", "b", "cosine")
  }

  /** Prototype-based data pruning (Sorscher et al. 2022, "Beyond neural
    * scaling laws", arXiv:2206.14486): within each k-means cluster, rank
    * vectors by cosine to their OWN centroid (prototypicality) and drop
    * the most prototypical `dropNum/dropDen` fraction —
    * `floor(|cluster| · dropNum / dropDen)` rows per cluster — keeping
    * the hard, informative examples a data-constrained trainer wants.
    *
    * Ranking uses the [[graft.functions.DoubleSortKey]] of the cosine
    * (exact double order, id tie-break), and the per-cluster quota is
    * integer algebra (`rank > (n·num) div den` keeps), so given the
    * assignment the prune is fully deterministic. Scale shape: the
    * centroid table is k rows broadcast onto the cell-partitioned index;
    * the rank window partitions by cell — the same exchange the
    * assignment already created; nothing corpus-sized moves twice.
    *
    * Output: kept rows only — (`id`, cluster, proto_rank (1 = most
    * prototypical), cluster_size).
    */
  def prune(vecs: DataFrame, id: String, vec: String, k: Int,
      dropNum: Int, dropDen: Int, iters: Int = 10, sampleN: Int = 10000,
      seed: Long = 11L, sampleMod: Int = 1): DataFrame = {
    require(dropDen > 0 && dropNum >= 0 && dropNum <= dropDen,
      s"prune: drop fraction must be in [0, 1] (got $dropNum/$dropDen)")
    val spark = vecs.sparkSession
    import spark.implicits._
    val cs = Ivf.trainCentroids(vecs, id, vec, k, iters, sampleN, seed, sampleMod)
    val cdf = broadcast(cs.toSeq.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toDF("_cell", "_centroid"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("_cell"))
    val ranked = Ivf.index(vecs, id, vec, cs)
      .join(cdf, "_cell")
      .withColumn("_key", graft.functions.VectorExprFunctions.double_sort_key(
        VectorFunctions.cosineFused(col("_cv"), col("_centroid").cast("array<double>"))))
      .withColumn("proto_rank", row_number().over(
        w.orderBy(col("_key").desc, col("neighbor_id").asc)))
      .withColumn("cluster_size", count(lit(1)).over(w))
    ranked
      .filter(col("proto_rank") >
        expr(s"(cluster_size * $dropNum) div $dropDen"))
      .select(col("neighbor_id").as(id), col("_cell").as("cluster"),
        col("proto_rank").cast("long").as("proto_rank"),
        col("cluster_size").cast("long").as("cluster_size"))
  }

  /** Surviving vectors after semantic dedup: the larger `id` of every
    * [[pairs]] hit is dropped (keep-smallest-id, the same deterministic
    * convention as [[graft.dedup.Dedup.exact]]). Vector rows never
    * shuffle — the dropped-id side of the anti-join is the small one.
    */
  def dedup(vecs: DataFrame, id: String, vec: String, k: Int, threshold: Double,
      iters: Int = 10, sampleN: Int = 10000, seed: Long = 11L,
      sampleMod: Int = 1, maxCluster: Int = 10000): DataFrame =
    vecs.join(
      pairs(vecs, id, vec, k, threshold, iters, sampleN, seed, sampleMod, maxCluster)
        .select(col("b").as(id)).distinct(),
      Seq(id), "left_anti")
}
