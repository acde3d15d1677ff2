package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein, SIGIR
  * 1998): greedily pick k results per query maximizing
  * λ·rel(q, c) − (1−λ)·max_{s∈selected} sim(c, s) — the diversity-aware
  * top-k a retrieval pipeline runs between ANN candidates and the final
  * context window, so near-duplicate passages don't crowd out coverage.
  *
  * This implementation fixes λ = 1/2 and works on INTEGRAL vectors, so
  * 2·mmr = rel − maxsim stays an exact integer and the selected set is
  * an engine-replayable dataset fact (the oracle unrolls the greedy
  * rounds in SQL) rather than a float-order artifact. Ties break on
  * (higher rel, lower candidate id), deterministically.
  *
  * Scale shape: the query set broadcasts over the candidate corpus (the
  * `hard_negatives` pattern — candidates never shuffle for scoring), and
  * each greedy round joins candidates against the ≤ |Q|·(round−1)-row
  * SELECTED frame (broadcast) + one max_by argmax per query — candidates
  * never pairwise-join EACH OTHER, so a round is O(|C|·round), not
  * O(|C|²).
  */
object Mmr {

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), _ + _)

  /** Top-k diversified picks per query: (qId, step, cId, score2x) with
    * score2x = rel − max-sim-to-already-selected (step 1: rel itself).
    * `queries`: (qId, qVec array<long>), small (broadcast). `cands`:
    * (cId, cVec array<long>), arbitrarily large. Vectors must share the
    * dimension; ids must be non-negative and unique per side.
    */
  def rerank(queries: DataFrame, qId: String, qVec: String,
      cands: DataFrame, cId: String, cVec: String, k: Int): DataFrame = {
    require(k >= 1, s"rerank: k must be >= 1 (got $k)")
    val scored = graft.Caches.track(cands
      .crossJoin(broadcast(queries))
      .select(col(qId), col(cId), col(cVec).as("_cvec"),
        dot(col(qVec), col(cVec)).as("_rel"))
      .persist())
    scored.count() // fill once; every greedy round re-reads it
    // round 1: pure relevance argmax (no selected set yet)
    val pick1 = scored.groupBy(col(qId))
      .agg(max_by(
        struct(col(cId), col("_cvec"), col("_rel"), col("_rel").as("_score2")),
        struct(col("_rel"), -col(cId))).as("_p"))
      .select(col(qId), lit(1L).as("step"), col("_p.*"))
    var selected = pick1
    for (round <- 2 to k) {
      val sel = broadcast(selected
        .select(col(qId), col(cId).as("_sid"), col("_cvec").as("_svec")))
      val next = scored
        .join(sel, Seq(qId))
        .groupBy(col(qId), col(cId))
        .agg(max(dot(col("_cvec"), col("_svec"))).as("_maxsim"),
          first(col("_cvec")).as("_cvec"), first(col("_rel")).as("_rel"),
          max(when(col(cId) === col("_sid"), 1L).otherwise(0L)).as("_taken"))
        .where(col("_taken") === 0L)
        .withColumn("_score2", col("_rel") - col("_maxsim"))
        .groupBy(col(qId))
        .agg(max_by(
          struct(col(cId), col("_cvec"), col("_rel"), col("_score2")),
          struct(col("_score2"), col("_rel"), -col(cId))).as("_p"))
        .select(col(qId), lit(round.toLong).as("step"), col("_p.*"))
      selected = selected.unionByName(next)
    }
    selected.select(col(qId), col("step"), col(cId), col("_rel").as("rel"),
      col("_score2").as("score2x"))
  }
}
