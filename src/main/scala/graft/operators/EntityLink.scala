package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked multi-field record linkage (entity resolution): match records
  * across two tables that share no key, by comparing FIELDS — the
  * classic master-data problem (the reference's MasterJoin family
  * assumes a shared key; this is the operator for when there isn't one),
  * and the de-duplication step every large-scale user/vendor/document
  * registry needs. The Fellegi & Sunter (1969) shape with deterministic
  * integer agreement weights: candidate pairs come from BLOCKING passes
  * (never all-pairs), each pair gets an additive per-field score, pairs
  * at or above `threshold` are links.
  *
  * Scale shape, at 100 TB:
  * - Each blocking pass is a key-equality shuffle join on the blocking
  *   key; only `(blockKey, id)` pairs cross those exchanges — payloads
  *   stay put until scoring.
  * - Hot blocks (a null-ish prefix, a default date) would quadratically
  *   explode the pass; every pass runs under the counts-first
  *   [[graft.dedup.Dedup.boundedBuckets]] guard, which drops oversize
  *   blocks and REPORTS the dropped row count via an observe metric
  *   (silent truncation reads as "covered everything").
  * - Candidates from all passes union and de-duplicate as 8/16-byte id
  *   pairs; payloads join back by id ONLY for surviving candidates, so
  *   the expensive field comparisons run once per distinct candidate.
  * - Scoring is a codegen'd row-local expression — no UDF, no state.
  *
  * `left`/`right` must have disjoint column names (rename on the way
  * in); `score` may reference any column of either side.
  */
object EntityLink {

  /** All candidate links scoring at or above `threshold`:
    * one row per (leftId, rightId) candidate with `link_score`.
    *
    * @param blockKeys one (leftKey, rightKey) expression pair per
    *   blocking pass; a truth pair is a candidate iff AT LEAST ONE pass
    *   agrees (multi-pass blocking covers single-field corruption)
    * @param score integer agreement score over the joined row
    * @param maxBlock per-pass block-size bound for the skew guard
    */
  def link(left: DataFrame, right: DataFrame,
      leftId: String, rightId: String,
      blockKeys: Seq[(Column, Column)],
      score: Column, threshold: Int,
      maxBlock: Int = 100000): DataFrame = {
    require(blockKeys.nonEmpty, "EntityLink.link: need at least one blocking pass")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"EntityLink.link: left/right column names must be disjoint, both have: ${overlap.mkString(", ")}")
    // id-only candidate generation: per pass, (key, id) projections under
    // the skew guard, equi-joined, ids kept. distinct() across passes is
    // an exchange of id PAIRS only.
    val candidates = blockKeys.zipWithIndex.map { case ((lk, rk), i) =>
      val lkeys = graft.dedup.Dedup.boundedBuckets(
        left.select(lk.as("_bk"), col(leftId).as("_lid"))
          .filter(col("_bk").isNotNull),
        Seq("_bk"), maxBlock, s"entitylink_l_$i", cache = false)
      val rkeys = graft.dedup.Dedup.boundedBuckets(
        right.select(rk.as("_bk"), col(rightId).as("_rid"))
          .filter(col("_bk").isNotNull),
        Seq("_bk"), maxBlock, s"entitylink_r_$i", cache = false)
      lkeys.join(rkeys, "_bk").select(col("_lid"), col("_rid"))
    }.reduce(_ unionAll _).distinct()
    // payload join for surviving candidates only, then row-local scoring
    candidates
      .join(left, candidates("_lid") === left(leftId))
      .join(right, candidates("_rid") === right(rightId))
      .withColumn("link_score", score.cast("int"))
      .filter(col("link_score") >= threshold)
      .select(col(leftId), col(rightId), col("link_score"))
  }

  /** Best link per RIGHT record: among [[link]]'s candidates, the
    * (score, leftId)-maximal left match — deterministic under ties by
    * construction (max score first, then greatest leftId), with no
    * window: `max(struct)` partial-aggregates map-side, so the exchange
    * carries one row per right id per task.
    */
  def bestLinks(left: DataFrame, right: DataFrame,
      leftId: String, rightId: String,
      blockKeys: Seq[(Column, Column)],
      score: Column, threshold: Int,
      maxBlock: Int = 100000): DataFrame =
    link(left, right, leftId, rightId, blockKeys, score, threshold, maxBlock)
      .groupBy(col(rightId))
      .agg(max(struct(col("link_score"), col(leftId))).as("_best"))
      .select(col(rightId), col("_best")(leftId).as(leftId),
        col("_best")("link_score").as("link_score"))
}
