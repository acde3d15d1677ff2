package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental maintenance of materialized aggregates — the batch answer
  * to "the corpus stats table must follow the corpus without rescanning
  * it". A maintained aggregate over 100 TB of base data is refreshed
  * from a changeset whose size tracks the day's churn, not the corpus:
  * invertible aggregates (sum / count) apply signed deltas directly;
  * non-invertible ones (min / max / distinct counts) re-aggregate only
  * the groups the changeset touched. Extends the CDC family in
  * [[Merge]] (reference expresses recomputation as a full Summarize
  * vertex rerun — `runtime/src/main/scala/com/asakusafw/spark/runtime/driver/AggregateDriver.scala:41-74`;
  * the delta formulation is the standard incremental-view-maintenance
  * result, e.g. Gupta & Mumick, "Maintenance of Materialized Views:
  * Problems, Techniques, and Applications", IEEE DE Bulletin 1995).
  */
object Maintain {

  /** A null group key fails by name: the refresh joins treat null keys
    * as unequal to everything, so a null group's delta would never merge
    * into its stored row (duplicate/stale rows instead of maintenance).
    */
  private def guardKeys(df: DataFrame, keys: Seq[String], where: String): DataFrame =
    keys.foldLeft(df)((d, k) =>
      d.withColumn(k, when(col(k).isNull, raise_error(lit(
        s"$where: null in group column '$k' (null keys cannot join; " +
          "filter or canonicalize them first)"))).otherwise(col(k))))

  /** Refresh a sum/count aggregate with a signed changeset, touching only
    * affected groups. `delta` carries the base-row schema plus `op`:
    * 'I' rows add into their group, 'D' rows retract previously-inserted
    * values (any other op fails the job naming the offender). Per group,
    * each `(name, value)` in `sums` maintains `name = name + Σ(±value)`
    * and `countCol = countCol + Σ(±1)`; a group whose refreshed count
    * reaches 0 is dropped, and a count below 0 fails the job — that
    * changeset retracts rows the aggregate never absorbed.
    *
    * Value expressions must be exact types (integral / decimal):
    * floating-point sums are not incrementally maintainable — `(a + d) -
    * d ≠ a` in floats, so a float aggregate drifts from its recompute a
    * little more on every refresh.
    *
    * Scale shape: ONE shuffle of the changeset (map-side combined signed
    * sums — the exchange carries one row per TOUCHED group, not per
    * change) and one co-partitioned full-outer join against the
    * aggregate; an aggregate table stored bucketed by `groups` joins
    * with no shuffle of its own. Nothing scans the base table at all.
    * Refreshed sums widen by one decimal digit per the usual Add
    * promotion — cast the output back to the stored schema when writing
    * (e.g. through [[graft.sinks.Upsert]], whose changeset is exactly
    * [[Merge.snapshotDiff]] of this result against the stored rows).
    */
  def refreshAdditive(agg: DataFrame, delta: DataFrame, groups: Seq[String],
      sums: Seq[(String, Column)], countCol: String,
      op: String = "_op"): DataFrame = {
    // the count column is mandatory: the zero-count drop and the
    // negative-count retraction guard both depend on it
    require(countCol.nonEmpty, "refreshAdditive: countCol is required")
    val aggG = guardKeys(agg, groups, "refreshAdditive")
    val deltaG = guardKeys(delta, groups, "refreshAdditive")
    val badOp = raise_error(concat(
      lit(s"refreshAdditive: invalid $op value '"), col(op),
      lit("' (expected I or D)")))
    val sign = when(col(op) === "I", lit(1L))
      .when(col(op) === "D", lit(-1L)).otherwise(badOp.cast("long"))
    val dAgg = deltaG
      .groupBy(groups.map(col): _*)
      .agg(sum(sign).as("_d_cnt"),
        sums.map { case (n, v) =>
          sum(when(col(op) === "I", v).otherwise(-v)).as(s"_d_$n")
        }: _*)
    // type-preserving merge without a typed zero literal: absent side
    // passes the other through (full outer ⇒ at least one side present)
    def add(a: Column, d: Column): Column =
      when(a.isNull, d).when(d.isNull, a).otherwise(a + d)
    val newCnt = add(col(countCol), col("_d_cnt"))
    val guardedCnt = when(newCnt < 0, raise_error(concat(
      lit("refreshAdditive: count below zero for group ("),
      concat_ws(",", groups.map(g => col(g).cast("string")): _*),
      lit(") — changeset retracts rows the aggregate never absorbed")))
      .cast("long")).otherwise(newCnt)
    aggG.join(dAgg, groups, "full_outer")
      .select(groups.map(col) ++
        sums.map { case (n, _) => add(col(n), col(s"_d_$n")).as(n) } :+
        guardedCnt.as(countCol): _*)
      .filter(col(countCol) > 0)
  }

  /** Refresh a non-invertible aggregate (min / max / count-distinct /
    * anything) by re-aggregating ONLY the groups a changeset touched.
    * `base` is the already-updated base table, `agg` the stale aggregate
    * (exact over the pre-change base), `touched` any frame whose `groups`
    * columns cover every changed row's group (the changeset itself
    * works). Untouched groups keep their stale rows — sound because no
    * row of theirs changed; touched groups are recomputed from `base`
    * with `aggs`, whose aliases must match the stale aggregate's columns
    * (unionByName enforces it). Groups that vanished lose their row;
    * brand-new groups appear — same contract as a full recompute.
    *
    * Scale shape: the touched-key set (one row per changed group) is
    * broadcast; `base` is scanned once with a map-side semi-join probe,
    * so only changed-group rows reach the re-aggregation exchange, and
    * the stale aggregate is scanned once with the same broadcast as an
    * anti-join probe — no shuffle of either big side. With
    * `broadcastTouched = false` both joins plan as shuffled semi/anti
    * joins instead — for the rare changeset touching millions of groups.
    */
  def refreshGroups(base: DataFrame, agg: DataFrame, touched: DataFrame,
      groups: Seq[String], aggs: Seq[Column],
      broadcastTouched: Boolean = true): DataFrame = {
    require(aggs.nonEmpty, "refreshGroups: no aggregates to maintain")
    val baseG = guardKeys(base, groups, "refreshGroups")
    val aggG = guardKeys(agg, groups, "refreshGroups")
    val touchedG = guardKeys(touched, groups, "refreshGroups")
    val keys0 = touchedG.select(groups.map(col): _*).distinct()
    val keys = if (broadcastTouched) broadcast(keys0) else keys0
    val recomputed = baseG.join(keys, groups, "left_semi")
      .groupBy(groups.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    aggG.join(keys, groups, "left_anti").unionByName(recomputed)
  }

  /** Refresh MERGEABLE sketch aggregates (HLL distinct counts) with an
    * append-only changeset: the third maintenance class — distinct
    * counts cannot be retracted like sums ([[refreshAdditive]]) and
    * need no base rescan like min/max ([[refreshGroups]]), because HLL
    * sketches UNION. Each `(name, value)` in `sketches` maintains a
    * stored `hll_sketch_agg` binary column: the changeset is sketched
    * per group (map-side merged — one sketch per touched group crosses
    * the exchange) and unioned into the stored sketch. Append-only by
    * nature: a sketch never forgets, so deletions require a
    * [[refreshGroups]]-style rebuild of the touched groups instead.
    * Read estimates with `hll_sketch_estimate`; sketches from different
    * lgConfigK do not union — keep the build parameters stable.
    */
  def refreshMergeable(agg: DataFrame, delta: DataFrame, groups: Seq[String],
      sketches: Seq[(String, Column)]): DataFrame = {
    require(sketches.nonEmpty, "refreshMergeable: no sketch columns")
    val aggG = guardKeys(agg, groups, "refreshMergeable")
    val deltaG = guardKeys(delta, groups, "refreshMergeable")
    val dAgg = deltaG.groupBy(groups.map(col): _*)
      .agg(hll_sketch_agg(sketches.head._2).as(s"_d_${sketches.head._1}"),
        sketches.tail.map { case (n, v) => hll_sketch_agg(v).as(s"_d_$n") }: _*)
    aggG.join(dAgg, groups, "full_outer")
      .select(groups.map(col) ++ sketches.map { case (n, _) =>
        val a = col(n); val d = col(s"_d_$n")
        when(a.isNull, d).when(d.isNull, a).otherwise(hll_union(a, d)).as(n)
      }: _*)
  }

  /** Refresh a per-group top-k view from an INSERT-only delta — the
    * bounded-aggregate member of the mergeable class ([[refreshMergeable]]
    * is the sketch member): a stored `bounded_topk_pair` array merges
    * with the delta's array by re-aggregating their union, k+k rows per
    * touched group — the base table is never rescanned. Insert-only by
    * construction (like sketches, a top-k cannot retract: a deleted row
    * inside the stored top-k would need base data the view no longer
    * holds — use [[refreshGroups]] for that). `topkCol` is the stored
    * array column; `score`/`id` name the struct fields.
    *
    * Scale shape: the delta partial-aggregates to k pairs per group
    * map-side; the merge explodes (≤ 2k rows per touched group) and
    * re-aggregates — group-count-sized frames on every exchange,
    * untouched groups pass through via the full-outer merge.
    */
  def refreshTopK(agg: DataFrame, delta: DataFrame, groups: Seq[String],
      topkCol: String, score: Column, id: Column, k: Int): DataFrame = {
    val aggG = guardKeys(agg, groups, "refreshTopK")
    val deltaG = guardKeys(delta, groups, "refreshTopK")
    val dAgg = deltaG.groupBy(groups.map(col): _*)
      .agg(graft.functions.AggExpressions.topkPairAgg(score, id, k)
        .as("_d_topk"))
    val merged = aggG.join(dAgg, groups, "full_outer")
    // untouched groups keep their array; touched groups re-aggregate the
    // union of the two k-bounded arrays. Groups where BOTH arrays are
    // empty (all-null scores) must pass through, not re-aggregate: the
    // explode of an empty concat yields zero rows and would silently
    // drop the group, where a full recompute keeps it with [].
    val reagg = col(topkCol).isNotNull && col("_d_topk").isNotNull &&
      (size(col(topkCol)) + size(col("_d_topk"))) > 0
    val both = merged.filter(reagg)
      .select(groups.map(col) :+
        explode(concat(col(topkCol), col("_d_topk"))).as("_p"): _*)
      .groupBy(groups.map(col): _*)
      .agg(graft.functions.AggExpressions.topkPairAgg(
        col("_p.score"), col("_p.id"), k).as(topkCol))
    val oneSided = merged.filter(!reagg)
      .select(groups.map(col) :+
        coalesce(col(topkCol), col("_d_topk")).as(topkCol): _*)
    both.unionByName(oneSided)
  }

  /** Refresh a materialized JOIN view `V = A ⋈ B` from a changeset on A
    * — the join-view branch of incremental view maintenance
    * (ΔV = old rows of changed A-keys retracted, upserted A-rows
    * re-joined; Gupta & Mumick 1995). `deltaLeft` carries A's row schema
    * plus `op`: 'U' upserts (insert or replace the A-row identified by
    * `leftPk`), 'D' deletes; any other op fails the job naming the
    * offender. `joined` must reproduce V's plan given an A-side frame —
    * the same function that built the stored view builds the delta's
    * patch rows, so the two cannot drift.
    *
    * `leftPk` must be A's primary key: V rows are retracted per pk, so a
    * pk with multiple live A-rows would over-retract. V must carry the
    * pk columns (the retraction anti-joins on them).
    *
    * Scale shape: the changed-pk set (one row per changed A-row, pk
    * columns only) is broadcast; the stored view is scanned once with a
    * map-side anti-join probe — no shuffle of V. The patch side joins
    * only the upserted A-rows against B: churn-sized work, plus whatever
    * `joined` itself shuffles (broadcast-able B makes the whole refresh
    * shuffle-free). Nothing rescans A.
    */
  def refreshJoin(view: DataFrame, deltaLeft: DataFrame, leftPk: Seq[String],
      op: String = "_op")(joined: DataFrame => DataFrame): DataFrame = {
    require(leftPk.nonEmpty, "refreshJoin: leftPk is required")
    val deltaG = guardKeys(deltaLeft, leftPk, "refreshJoin")
    val badOp = raise_error(concat(
      lit(s"refreshJoin: invalid $op value '"), col(op),
      lit("' (expected U or D)")))
    val checked0 = deltaG.withColumn(op,
      when(col(op).isin("U", "D"), col(op)).otherwise(badOp.cast("string")))
    // one op per pk, or the changeset is ambiguous (a U+D pair for the
    // same key has no defined order here — sequence-ordered streams
    // belong in [[Merge.applyChanges]] first)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(leftPk.map(col): _*)
    val checked = checked0.withColumn("_npk", count(lit(1)).over(w))
      .withColumn(op, when(col("_npk") > 1, raise_error(concat(
        lit("refreshJoin: multiple changeset rows for pk ("),
        concat_ws(",", leftPk.map(k => col(k).cast("string")): _*),
        lit(") — collapse the changeset (e.g. Merge.applyChanges) first")))
        .cast("string")).otherwise(col(op)))
      .drop("_npk")
    val changedPks = broadcast(checked.select(leftPk.map(col): _*).distinct())
    val upserts = checked.filter(col(op) === "U").drop(op)
    view.join(changedPks, leftPk, "left_anti")
      .unionByName(joined(upserts))
  }

  /** Incremental golden-record (survivorship) refresh: fold a delta feed
    * into a stored golden table touching ONLY the delta's keys — the MDM
    * maintenance step after the initial [[Merge.survivorship]] build.
    * `deltaWins` places the feed at the TOP of the priority order (a
    * correction feed overrides stored fields where non-null) or the
    * BOTTOM (a backfill feed only fills stored nulls). Both extremes
    * equal the full recompute with the feed added at that priority —
    * the stored golden field being null means every original source was
    * null there, so coalesce against the golden IS coalesce against all
    * of them. A mid-priority feed needs per-field provenance the golden
    * doesn't carry; that is a rebuild, not a refresh.
    *
    * Scale shape: the delta's keys semi/anti-join the golden (pk-only
    * exchanges, broadcast under AQE for batch-sized deltas); untouched
    * rows pass through untouched; the survivorship aggregate runs over
    * touched keys only. Inherits [[Merge.survivorship]]'s
    * duplicate-pk-within-source fail-by-name guard.
    */
  def refreshSurvivorship(golden: DataFrame, delta: DataFrame,
      pk: Seq[String], fields: Seq[String],
      deltaWins: Boolean = true): DataFrame = {
    val keys = delta.select(pk.map(col): _*).distinct()
    val touched = golden.join(keys, pk, "left_semi")
    val untouched = golden.join(keys, pk, "left_anti")
    val order =
      if (deltaWins) Seq(delta, touched) else Seq(touched, delta)
    untouched.unionByName(Merge.survivorship(order, pk, fields))
  }
}
