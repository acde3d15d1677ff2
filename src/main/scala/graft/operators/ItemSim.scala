package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Item-item collaborative-filtering similarity ("users who took this
  * also took"): for every item pair co-occurring in some user's
  * interaction set, exact fixed-point Jaccard over their user sets, then
  * the top-k neighbors per item — the classic item2item recommender
  * backbone (Linden et al. 2003, Amazon item-to-item CF).
  *
  * Scale shape: the pair generator is a per-user self-join, quadratic in
  * a USER's distinct items — so it runs under the counts-first
  * [[graft.dedup.Dedup.boundedBuckets]] guard (a crawler account with
  * 10⁶ items would emit 10¹² pairs; dropped users are REPORTED via the
  * observe metric, never silent). Everything that crosses an exchange is
  * (item, item, count) / (item, count) tallies; the per-item top-k is
  * the k-bounded pair aggregate — map-side k rows per item per task, no
  * global window. Jaccard is the floor-divided rational
  * c·10⁶ div (n_a + n_b − c): engine-exact, no float boundary.
  */
object ItemSim {

  /** Top-`k` neighbors per item among pairs with co-count ≥ `minCo`:
    * (item, neighbor, rank, score_fp, n_co) — rank by (score_fp DESC,
    * neighbor ASC), fully deterministic.
    */
  def topNeighbors(interactions: DataFrame, user: String, item: String,
      maxUserItems: Int, minCo: Long, k: Int): DataFrame = {
    val inter = interactions
      .select(col(user).as("_u"), col(item).as("_i")).distinct()
    val guarded = graft.dedup.Dedup.boundedBuckets(
      inter, Seq("_u"), maxUserItems, "itemsim_users")
    val ni = guarded.groupBy(col("_i")).agg(count(lit(1)).as("_n"))
    val a = guarded.select(col("_u"), col("_i").as("a"))
    val b = guarded.select(col("_u"), col("_i").as("b"))
    val co = a.join(b, "_u").filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("_c"))
      .filter(col("_c") >= minCo)
      .join(ni.select(col("_i").as("a"), col("_n").as("_na")), "a")
      .join(ni.select(col("_i").as("b"), col("_n").as("_nb")), "b")
      // DECIMAL(38,0) before the scale-up: a BIGINT multiply would
      // silently overflow past ~9.2e12 co-occurrences (ANSI off) — same
      // discipline as Collocations/Stats; div lands back in BIGINT
      .withColumn("score_fp",
        expr("(cast(_c as decimal(38,0)) * 1000000) div (_na + _nb - _c)"))
    // symmetric: each pair names both items, then k-bounded top per item
    val sym = co.select(col("a").as("_item"), col("b").as("_nb2"),
        col("score_fp"), col("_c"))
      .unionByName(co.select(col("b").as("_item"), col("a").as("_nb2"),
        col("score_fp"), col("_c")))
    // topkPairAgg's (score DESC, id ASC) order IS the deterministic
    // (similarity, neighbor) ranking
    sym.groupBy(col("_item"))
      .agg(graft.functions.AggExpressions.topkPairAgg(
        col("score_fp"), col("_nb2"), k).as("_top"))
      .select(col("_item"), posexplode(col("_top")))
      .select(col("_item").as(item), (col("pos") + 1).as("rank"),
        col("col.id").as("neighbor_id"), col("col.score").as("score_fp"))
  }
}
