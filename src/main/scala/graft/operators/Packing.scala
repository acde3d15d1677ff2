package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-ordering operators for training-data pipelines: a deterministic
  * global shuffle (every record gets its position in a pseudo-random
  * permutation) and sequence packing (assign documents to fixed
  * token-capacity training sequences).
  *
  * Both are global running totals over a deterministic order, which the
  * naive formulation — a window over `ORDER BY` with no partition — computes
  * on a SINGLE partition: the whole 100 TB corpus would funnel through one
  * task. Instead [[prefixSumBefore]] does the classic two-level distributed
  * prefix sum:
  *
  *   1. records are bucketed by the leading bits of the order key, so
  *      within-bucket running sums are an ordinary partitioned window
  *      (parallel across `buckets` tasks, one shuffle);
  *   2. bucket subtotals — at most `buckets` rows, driver-size by
  *      construction — get exclusive offsets via a window over the tiny
  *      aggregate, broadcast back as an equi-join.
  *
  * Total cost: one shuffle of the data on the order key + one broadcast of
  * a `buckets`-row table, independent of corpus size. The result is
  * bit-identical to the single-window formulation because the bucket id is
  * a monotone function of the order key (ordering by (bucket, ord, tie)
  * equals ordering by (ord, tie)).
  *
  * The order key is [[Sampling.hashBucket]]'s engine-stable multiplicative
  * hash, so the permutation is reproducible across engines and re-runs —
  * the same property the split/sampling operators guarantee.
  */
object Packing {

  private val OrdRing: Int = 1 << 30

  /** `out` = sum of `value` over all records strictly BEFORE this one in
    * the deterministic shuffle order (hash(id), id). `value` must be a
    * non-negative integral column; `id` must be a unique, NON-NULL,
    * INTEGRAL column — [[Sampling.hashBucket]] casts to long, so a string
    * id would silently become null, collapsing every record into one null
    * bucket processed by a single task (exactly the funnel this operator
    * exists to avoid). The integral requirement is checked at plan time;
    * nulls are checked per-row during execution (a null id violates the
    * unique-id contract and would silently pool records into one bucket).
    * Hash string ids to long first (e.g. `xxhash64(col)`).
    */
  def prefixSumBefore(df: DataFrame, id: Column, value: Column, out: String,
      buckets: Int = 1024): DataFrame = {
    require(buckets > 0 && OrdRing % buckets == 0,
      s"buckets must divide 2^30, got $buckets")
    val idType = df.select(id).schema.head.dataType
    require(Seq("byte", "short", "integer", "long").contains(idType.typeName),
      s"prefixSumBefore id column must be integral, got ${idType.typeName}: " +
        "a non-integral id casts to null and degenerates the distributed " +
        "prefix sum to one single-task bucket; hash string ids to long " +
        "first, e.g. xxhash64(col)")
    val width = OrdRing / buckets
    val d = df
      // inline null guard: zero extra jobs, fails the task naming the
      // contract instead of silently funneling rows into a null bucket
      .withColumn("_graft_ord",
        when(id.isNull, raise_error(lit(
          "prefixSumBefore: null id violates the unique-id contract " +
            "(null ids would silently collapse into one bucket)")))
          .otherwise(Sampling.hashBucket(id, OrdRing)))
      .withColumn("_graft_bkt", (col("_graft_ord") / width).cast("long"))
      .withColumn("_graft_val",
        when(value.isNull, raise_error(lit(
          "prefixSumBefore: null value violates the integral-value contract " +
            "(a null would silently drop the row from its pack/position)")))
          .otherwise(value.cast("long")))
      // ONE materialization feeding both levels: the windowed side and the
      // bucket-offset side must see the SAME row set — re-executing a
      // nondeterministic upstream (sample, limit) for each level would
      // make offsets disagree with within-bucket sums, silently corrupting
      // positions. Tracked: Caches.clear releases it between batches.
      .persist()
    val dT = graft.Caches.track(d)
    // level 1: running sum within each bucket (parallel, one shuffle)
    val w = Window.partitionBy("_graft_bkt").orderBy(col("_graft_ord"), id)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = dT.withColumn("_graft_in", sum(col("_graft_val")).over(w) - col("_graft_val"))
    // level 2: exclusive bucket offsets over the <= `buckets`-row aggregate
    // (the unpartitioned window is single-task by design — it sees only
    // bucket subtotals, never records)
    val offsets = dT.groupBy("_graft_bkt").agg(sum("_graft_val").as("_graft_tot"))
      .withColumn("_graft_off", coalesce(
        sum("_graft_tot").over(Window.orderBy("_graft_bkt")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("_graft_bkt", "_graft_off")
    within.join(broadcast(offsets), "_graft_bkt")
      .withColumn(out, col("_graft_off") + col("_graft_in"))
      .drop("_graft_ord", "_graft_bkt", "_graft_val", "_graft_in", "_graft_off")
  }

  /** Deterministic global shuffle: `out` = this record's 1-based position
    * in the pseudo-random permutation of the whole dataset. The standard
    * pre-training step "shuffle the corpus" as a reproducible column
    * instead of an RNG pass.
    */
  def globalShuffle(df: DataFrame, id: Column, out: String = "shuffle_pos",
      buckets: Int = 1024): DataFrame =
    prefixSumBefore(df, id, lit(1L), out, buckets)
      .withColumn(out, col(out) + 1L)

  /** Sequence packing: walk the corpus in shuffle order accumulating
    * `tokens`; a record's pack is `floor(tokens_before / capacity)` — the
    * streaming-cumsum packing used to batch documents into fixed-size
    * training sequences without a sequential pass.
    *
    * A document always lands entirely in one pack, so a pack can overflow
    * `capacity` by at most (longest document - 1) tokens; truncate
    * oversized documents upstream if strict capacity matters.
    */
  def sequencePack(df: DataFrame, id: Column, tokens: Column, capacity: Long,
      out: String = "pack_id", buckets: Int = 1024): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    prefixSumBefore(df, id, tokens, "_graft_before", buckets)
      .withColumn(out, floor(col("_graft_before") / capacity))
      .drop("_graft_before")
  }
}
