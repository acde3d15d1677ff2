package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Bitext mining — the margin-based mutual-nearest-neighbor pairing of
  * the CCMatrix/LASER pipelines: a source-language batch is matched
  * against a target-language corpus in a shared embedding space, and a
  * pair is mined only when (1) the target is the source's top-1 by
  * cosine, (2) the source wins the REVERSE direction too (mutual top-1 —
  * kills hubs that are "closest" to everything), and (3) the top-1
  * clears a RATIO margin over the runner-up (`marginNum/marginDen`,
  * default 21/20 = 1.05 — a translation is much closer than the next
  * candidate; a topically-similar non-translation is not).
  *
  * Scale shape (100-TB lens): the source batch is the bounded side (the
  * realistic shape — mining runs per ingest batch against the big
  * corpus) and rides a broadcast, so the corpus crosses no exchange
  * during scoring; the per-source rank exchange carries (ids, cos) only;
  * the reverse direction re-ranks ONLY the margin survivors against the
  * broadcast batch.
  *
  * Both arms share the legs below — the exact arm scores every
  * (src, tgt) pair, the IVF arm scores only probed-cell candidates; the
  * margin/mutuality algebra is ONE implementation, so the documented
  * pair-for-pair equality at nProbe = nCells cannot drift.
  */
object Bitext {

  /** Fail-fast row bound for the broadcast source batch: 1M 64-dim double
    * vectors ≈ 512 MB of broadcast payload — the practical ceiling for a
    * batch that every corpus partition must hold resident. Same count-probe
    * contract as [[graft.operators.Blocklist.DefaultMaxPatterns]] /
    * [[graft.dedup.Dedup.DefaultMaxIndexEntries]]: an oversized batch must
    * fail by name, not OOM the broadcast.
    */
  val DefaultMaxSrcRows: Long = 1000000L

  /** Project + persist the batch, count-probe it BEFORE any broadcast
    * materializes, and unpersist on the failure path (the contract the
    * sibling broadcast-materializing ops follow).
    */
  private def boundedBatch(src: DataFrame, sId: String, sVec: String,
      maxSrcRows: Long, arm: String): DataFrame = {
    val s = graft.Caches.track(src.select(col(sId).as("src_id"),
      col(sVec).cast("array<double>").as("_sv")).persist())
    val n = s.count()
    if (n > maxSrcRows) {
      s.unpersist(false)
      throw new IllegalArgumentException(
        s"Bitext.$arm: source batch has $n rows, exceeding maxSrcRows=" +
          s"$maxSrcRows — the batch is broadcast to every corpus partition; " +
          "mine in smaller batches (or raise maxSrcRows if the vectors are " +
          "small enough to hold resident)")
    }
    s
  }

  /** Forward leg over a scored (src_id, tgt_id, _cos) frame: per-source
    * top-1 with the ratio margin over the runner-up, positive-cosine
    * only, deterministic ties on tgt_id.
    */
  private def forwardMargin(scored: DataFrame,
      marginNum: Int, marginDen: Int): DataFrame = {
    val wS = Window.partitionBy(col("src_id"))
      .orderBy(col("_cos").desc, col("tgt_id").asc)
    val top2 = scored.withColumn("_r", row_number().over(wS)).filter(col("_r") <= 2)
    val best = top2.filter(col("_r") === 1)
      .select(col("src_id"), col("tgt_id"), col("_cos").as("_c1"))
    val second = top2.filter(col("_r") === 2)
      .select(col("src_id"), col("_cos").as("_c2"))
    best.join(second, Seq("src_id"), "left")
      .filter(col("_c1") > 0 &&
        (col("_c2").isNull || col("_c1") * marginDen >= col("_c2") * marginNum))
      .select(col("src_id"), col("tgt_id"))
  }

  /** Reverse leg, EXACT in both arms: the margin survivors' targets (a
    * bounded set, semi-join first) re-score against the WHOLE broadcast
    * batch, and a pair survives only if its target's true best source is
    * this pair's source — mutual top-1, deterministic ties on src_id.
    */
  private def mutualExact(margined: DataFrame, tgt: DataFrame, tId: String,
      tVec: String, sPlain: DataFrame): DataFrame = {
    val matchedTgt = tgt.select(col(tId).as("tgt_id"),
        col(tVec).cast("array<double>").as("_tv"))
      .join(margined.select(col("tgt_id")).distinct(), Seq("tgt_id"), "left_semi")
    val back = matchedTgt.crossJoin(broadcast(sPlain))
      .select(col("tgt_id"), col("src_id"),
        cosineFused(col("_sv"), col("_tv")).as("_cos"))
    val wT = Window.partitionBy(col("tgt_id"))
      .orderBy(col("_cos").desc, col("src_id").asc)
    val bestSrc = back.withColumn("_r", row_number().over(wT)).filter(col("_r") === 1)
      .select(col("tgt_id"), col("src_id").as("_back"))
    margined.join(bestSrc, Seq("tgt_id"))
      .filter(col("src_id") === col("_back"))
      .select(col("src_id"), col("tgt_id"))
  }

  /** Mined (src_id, tgt_id) pairs, EXACT: every (src, tgt) pair scored.
    * Deterministic ties on neighbor id (same convention as [[Ann]]).
    */
  def mine(src: DataFrame, tgt: DataFrame, sId: String, sVec: String,
      tId: String, tVec: String,
      marginNum: Int = 21, marginDen: Int = 20,
      maxSrcRows: Long = DefaultMaxSrcRows): DataFrame = {
    require(marginNum >= marginDen && marginDen > 0,
      s"bitext margin must be >= 1 (got $marginNum/$marginDen)")
    val sPlain = boundedBatch(src, sId, sVec, maxSrcRows, "mine")
    val t = tgt.select(col(tId).as("tgt_id"),
      col(tVec).cast("array<double>").as("_tv"))
    val scored = t.crossJoin(broadcast(sPlain))
      .select(col("src_id"), col("tgt_id"),
        cosineFused(col("_sv"), col("_tv")).as("_cos"))
    mutualExact(forwardMargin(scored, marginNum, marginDen),
      tgt, tId, tVec, sPlain)
  }

  /** IVF-pruned arm of [[mine]] for 100-TB corpora: instead of scoring
    * every (src, tgt) pair, forward candidates come from the [[Ivf]]
    * index — each source vector scores only the targets in its `nProbe`
    * nearest cells (cost |corpus|·nProbe/nCells per source instead of
    * |corpus|). The margin and forward top-2 are computed over the
    * candidate set (exact re-rank of candidates); the REVERSE direction
    * is the same exact leg as [[mine]]. Approximation enters through
    * forward candidate RECALL, and it cuts both ways: a missing top-1
    * drops a pair the exact arm mines, and a missing RUNNER-UP weakens
    * the margin filter (`_c2` null or smaller than the true second-best),
    * so at nProbe < nCells this arm can also EMIT pairs the exact arm's
    * margin would reject — bounded by the exact mutual-top-1 reverse
    * leg, which any emitted pair must still survive. With
    * `nProbe = nCells` the candidate set is the full corpus and this arm
    * equals [[mine]] pair-for-pair (fuzz-pinned in Round14Spec), and a
    * planted translation twin (scaled copy ⇒ identical direction ⇒ same
    * nearest cell) is always a candidate of its source at any
    * nProbe ≥ 1.
    *
    * Scale shape: the corpus is scanned once for cell assignment and
    * shuffled once on cell id; the probe join carries candidate
    * (ids, cos) only; the reverse pass scores ONLY the margin survivors
    * against the broadcast batch. Same fail-fast batch bound as [[mine]].
    */
  def mineIvf(src: DataFrame, tgt: DataFrame, sId: String, sVec: String,
      tId: String, tVec: String,
      marginNum: Int = 21, marginDen: Int = 20,
      nCells: Int = 16, nProbe: Int = 4, seed: Long = 11L,
      sampleN: Int = 10000, sampleMod: Int = 1,
      maxSrcRows: Long = DefaultMaxSrcRows,
      centroids: Array[Array[Double]] = null): DataFrame = {
    require(marginNum >= marginDen && marginDen > 0,
      s"bitext margin must be >= 1 (got $marginNum/$marginDen)")
    // production mining trains centroids once per corpus version and
    // reuses them across ingest batches (pass `centroids`); training here
    // is the convenience path for one-shot calls
    val cs =
      if (centroids != null) centroids
      else Ivf.trainCentroids(tgt, tId, tVec, nCells, seed = seed,
        sampleN = sampleN, sampleMod = sampleMod)
    mineIndexed(src, Ivf.index(tgt, tId, tVec, cs), cs, sId, sVec,
      marginNum, marginDen, nProbe, maxSrcRows, arm = "mineIvf")
  }

  /** Mine a source batch against a PREBUILT cell index — the INCREMENTAL
    * entry (the [[Ivf.search]] shape applied to mining): `indexed` is
    * [[Ivf.index]] output `(neighbor_id, _cv, _cell)` — in production
    * parquet-persisted once per corpus version — and `centroids` the
    * matrix it was assigned with. Per ingest batch there is NO training
    * and NO corpus re-scan or re-shuffle: forward candidates come from
    * each source's `nProbe` probed cells of the stored index (one
    * cell-id equi-join against index rows as they sit on disk), and the
    * exact reverse leg re-ranks the margin survivors' targets — vectors
    * semi-joined back from the same index — against the broadcast batch.
    * Given the same index and `nProbe`, equals [[mineIvf]] pair-for-pair
    * (hence, at `nProbe` = number of cells, equals [[mine]]); same
    * recall/margin caveats as [[mineIvf]], same fail-fast batch bound.
    */
  def mineIndexed(src: DataFrame, indexed: DataFrame,
      centroids: Array[Array[Double]], sId: String, sVec: String,
      marginNum: Int = 21, marginDen: Int = 20, nProbe: Int = 4,
      maxSrcRows: Long = DefaultMaxSrcRows,
      arm: String = "mineIndexed"): DataFrame = {
    require(marginNum >= marginDen && marginDen > 0,
      s"bitext margin must be >= 1 (got $marginNum/$marginDen)")
    val sPlain = boundedBatch(src, sId, sVec, maxSrcRows, arm)
    // each target lives in exactly ONE cell, so distinct probed cells
    // yield distinct (src, tgt) candidates — no post-join dedup needed
    val q = sPlain.select(col("src_id"), col("_sv"),
      explode(Ivf.nearestCells(col("_sv"), centroids, nProbe)).as("_cell"))
    val cands = indexed.join(q, "_cell")
      .select(col("src_id"), col("neighbor_id").as("tgt_id"),
        cosineFused(col("_sv"), col("_cv")).as("_cos"))
    mutualExact(forwardMargin(cands, marginNum, marginDen),
      indexed, "neighbor_id", "_cv", sPlain)
  }
}
