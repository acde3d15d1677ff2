package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval algebra over [start, end) spans: per-key coalescing of
  * overlapping-or-touching intervals ("islands"), the complementary gap
  * extraction, and sweep-line peak concurrency. The classic warehouse
  * uses are validity-interval compaction (SCD histories whose
  * consecutive versions carry the same payload), device/session uptime
  * stitching, coverage analysis (which time ranges have NO data — the
  * gaps), and capacity questions (how many spans were open at once).
  *
  * Scale shape: ONE shuffle on the key columns, then a per-key ordered
  * scan (two window passes sharing the same partitioning + sort, so the
  * exchange and the sort each happen once). No self-join, no collect; a
  * key's cost is linear in its own interval count, so the operator
  * survives 100 TB exactly as well as the underlying hash partitioning
  * does. The island detection is the standard cumulative-max trick: an
  * interval starts a new island iff its start lies strictly after the
  * running max end of every earlier interval of the same key (ties and
  * duplicates are safe — the flag depends only on the monotone running
  * max, not on the order among equal (start, end) rows).
  */
object Intervals {

  /** Coalesce overlapping-or-touching intervals per key.
    *
    * Input: one row per interval with integral `start`/`end` columns
    * (microseconds, days — any total order; [start, end) half-open, so
    * end == next.start merges). Output: one row per merged island with
    * the same `start`/`end` names (min start, max end) plus `n_merged`,
    * the source-interval count — or, when `weight` names a column, the
    * SUM of weights (so re-merging pre-merged islands keeps their
    * original member counts: the incremental-maintenance path feeds
    * stored islands back in with weight = their n_merged). Intervals
    * separated by a gap of at most `minGap` also merge
    * (sessionization-style stitching); the default 0 merges only
    * overlap/touch.
    */
  def merge(df: DataFrame, keys: Seq[String], start: String, end: String,
      minGap: Long = 0L, weight: Option[String] = None): DataFrame = {
    val k = keys.map(col)
    val ord = Window.partitionBy(k: _*).orderBy(col(start), col(end))
    val prevMax = max(col(end))
      .over(ord.rowsBetween(Window.unboundedPreceding, -1))
    // the island test `start > prevMax + minGap` wraps in BIGINT when
    // prevMax sits within minGap of the Long range end (snowflake-scale
    // ids / far-future sentinels), silently splitting an island that
    // overlaps. minGap is a Scala constant, so the overflow sliver is a
    // compile-time range check and the verdict on it is forced: an
    // overflowed true sum exceeds Long.MaxValue ≥ every representable
    // start (island continues); an underflowed one is below Long.MinValue
    // ≤ every start (island opens). Every row stays on the codegen'd
    // long comparison — the all-decimal form took the whole scan off the
    // long fast path (the same trade Spatial.floorDivSql measured at 4x).
    val islandOpen =
      if (minGap >= 0L)
        when(prevMax.isNull, 1L)
          .when(prevMax <= lit(Long.MaxValue - minGap),
            when(col(start) > prevMax + lit(minGap), 1L).otherwise(0L))
          .otherwise(0L)
      else
        when(prevMax.isNull, 1L)
          .when(prevMax >= lit(Long.MinValue - minGap),
            when(col(start) > prevMax + lit(minGap), 1L).otherwise(0L))
          .otherwise(1L)
    val grouped = df
      .withColumn("_island_open", islandOpen)
      .withColumn("_island",
        sum(col("_island_open"))
          .over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    grouped
      .groupBy(k :+ col("_island"): _*)
      .agg(min(col(start)).as(start), max(col(end)).as(end),
        weight.map(w => sum(col(w))).getOrElse(count(lit(1))).as("n_merged"))
      .drop("_island")
  }

  /** Sweep-line peak concurrency: per key, the maximum number of
    * simultaneously open [start, end) intervals and the earliest instant
    * it is reached — the ops staple (peak concurrent sessions, max
    * in-flight requests, seat licensing). Each interval contributes two
    * 16-byte sweep points (+1 at start, −1 at end); the running sum over
    * one key-partitioned sort is the concurrency timeline. Half-open
    * semantics: an interval ending at t does NOT overlap one starting at
    * t (the −1 sorts before the +1 at equal instants). Ties among equal
    * (t, delta) rows permute only the transient prefix values inside the
    * tie group — the group's max and its instant are order-free, so the
    * output is deterministic.
    */
  def maxConcurrency(df: DataFrame, keys: Seq[String], start: String,
      end: String): DataFrame = {
    val k = keys.map(col)
    val pts = df.select(k :+ col(start).as("_t") :+ lit(1L).as("_d"): _*)
      .unionByName(
        df.select(k :+ col(end).as("_t") :+ lit(-1L).as("_d"): _*))
    val ord = Window.partitionBy(k: _*).orderBy(col("_t"), col("_d"))
    val conc = pts.withColumn("_conc",
      sum(col("_d")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // the per-key peak rides the SAME exchange as the running sum: an
    // unbounded window max needs only clustering on the keys, which the
    // sorted window output already satisfies — no groupBy + join-back
    // (that shape cost a second shuffle), and the final groupBy reuses
    // the same hash partitioning too, so the whole operator is ONE
    // exchange end to end.
    conc
      .withColumn("_peak", max(col("_conc")).over(Window.partitionBy(k: _*)))
      .where(col("_conc") === col("_peak"))
      .groupBy(k: _*)
      .agg(max(col("_peak")).as("peak"), min(col("_t")).as("peak_at"))
  }

  /** The complement of [[merge]]: the maximal uncovered spans BETWEEN a
    * key's merged islands, as (gap_start, gap_end) rows. Leading/trailing
    * open-ended gaps are not emitted (no domain bounds are assumed);
    * merged islands are pairwise disjoint with positive separation, so
    * every emitted gap has gap_end > gap_start by construction.
    */
  def gaps(df: DataFrame, keys: Seq[String], start: String, end: String,
      minGap: Long = 0L): DataFrame = {
    val k = keys.map(col)
    val ord = Window.partitionBy(k: _*).orderBy(col(start))
    merge(df, keys, start, end, minGap)
      .select(k :+ col(end).as("gap_start") :+
        lead(col(start), 1).over(ord).as("gap_end"): _*)
      .where(col("gap_end").isNotNull)
  }
}
