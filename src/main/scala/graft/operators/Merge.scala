package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC / changeset application and history building — the generalization
  * of the master-update batch pattern (reference
  * `runtime/src/main/scala/com/asakusafw/spark/runtime/fragment/user/join/MasterJoinUpdateOperatorFragment.scala`
  * updates transactions from a master; here the CHANGES update the
  * master) to the three-verb upsert stream every warehouse ingests:
  * insert / update / delete keyed by primary key, latest change wins.
  */
object Merge {

  /** Replace each key column with a null-checked copy that raises by
    * name — the keyed join algebra below treats null keys as unequal to
    * everything, which silently corrupts merge semantics.
    */
  private def guardKeys(df: DataFrame, keys: Seq[String], where: String): DataFrame =
    keys.foldLeft(df)((d, k) =>
      d.withColumn(k, when(col(k).isNull, raise_error(lit(
        s"$where: null in key column '$k' (null keys cannot join; " +
          "filter or canonicalize them first)"))).otherwise(col(k))))

  /** Apply a keyed changeset to a base snapshot: per primary key the
    * change with the highest `seq` wins (ties broken by `op` descending —
    * deterministic, but give changes unique seqs per key); a winning
    * 'D' removes the key, a winning 'I'/'U' replaces the full row
    * (upsert — 'I' on an existing key behaves as 'U', 'D' on an absent
    * key is a no-op). Keys without changes pass through.
    *
    * `changes` must carry every `base` column plus `op` ('I'|'U'|'D') and
    * `seq` (any ordered type); any other op value fails the job naming
    * the offender rather than silently passing the row through.
    *
    * Scale shape: ONE shuffle of the changes (groupBy pk — map-side
    * combined by max_by, no rank-window second pass) and one
    * co-partitioned FULL OUTER sort-merge join against base; no window
    * over the full base, no driver-side state. Full outer keeps it a
    * single pass over both sides (a broadcast path doesn't exist for
    * full outer — the alternative, left-join + anti-join union, scans
    * base twice); a base stored bucketed by pk joins with no base
    * shuffle at all.
    */
  def applyChanges(base: DataFrame, changes: DataFrame, pk: Seq[String],
      op: String = "_op", seq: String = "_seq"): DataFrame = {
    // null pk fails by name: null never equals null in the merge join, so
    // a null-keyed change would DUPLICATE the base's null-keyed row
    // instead of updating it, and a 'D' would delete nothing — silently
    val baseG = guardKeys(base, pk, "applyChanges")
    val changesG = guardKeys(changes, pk, "applyChanges")
    val valueCols = base.columns.filterNot(pk.contains).toSeq
    val opChecked = when(col(op).isin("I", "U", "D"), col(op))
      .otherwise(raise_error(concat(
        lit(s"applyChanges: invalid $op value '"), col(op),
        lit("' (expected I, U or D)"))))
    // latest change per key, one aggregate: max_by over (seq, op) keeps
    // the whole winning row without a rank-window second pass
    val winner = changesG
      .groupBy(pk.map(col): _*)
      .agg(max_by(struct(opChecked.as(op) +: valueCols.map(col): _*),
        struct(col(seq), col(op))).as("_w"))
      .select(pk.map(col) ++ valueCols.map(c => col(s"_w.$c").as(s"_w_$c")) :+
        col(s"_w.$op").as("_w_op"): _*)
    baseG.join(winner, pk, "full_outer")
      .filter(col("_w_op").isNull || col("_w_op") =!= "D")
      .select(pk.map(col) ++ valueCols.map(c =>
        when(col("_w_op").isNotNull, col(s"_w_$c")).otherwise(col(c)).as(c)): _*)
  }

  /** Inverse of [[applyChanges]]: the minimal keyed changeset that turns
    * `oldDf` into `newDf` — 'I' for keys only in `newDf`, 'D' for keys
    * only in `oldDf`, 'U' for keys present in both whose value columns
    * differ (null-safe compare); unchanged keys are absent. Output is the
    * snapshot schema plus `op` ('D' rows carry the old values, 'I'/'U'
    * the new ones); `applyChanges(oldDf, diff.withColumn(seq, lit(1)),
    * pk)` reproduces `newDf` exactly — the round-trip the spec pins.
    *
    * This is how a pipeline without an upstream CDC feed manufactures
    * one: diff today's snapshot against yesterday's and ship the delta.
    * Scale shape: one full-outer pk join (both sides shuffle once, or
    * zero shuffles off pk-bucketed storage); the per-column compare is a
    * codegen'd projection, no window, no driver state.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, pk: Seq[String],
      op: String = "_op"): DataFrame = {
    // same null-pk rule as applyChanges: an unjoinable null key would
    // emit a spurious I+D pair for an unchanged row
    val oldG = guardKeys(oldDf, pk, "snapshotDiff")
    val newG = guardKeys(newDf, pk, "snapshotDiff")
    val valueCols = oldDf.columns.filterNot(pk.contains).toSeq
    val o = oldG.select(pk.map(col) ++ valueCols.map(c => col(c).as(s"_o_$c")) :+
      lit(true).as("_in_old"): _*)
    val n = newG.select(pk.map(col) ++ valueCols.map(c => col(c).as(s"_n_$c")) :+
      lit(true).as("_in_new"): _*)
    val changed = valueCols.map(c => !(col(s"_o_$c") <=> col(s"_n_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    o.join(n, pk, "full_outer")
      .withColumn(op,
        when(col("_in_old").isNull, "I")
          .when(col("_in_new").isNull, "D")
          .when(changed, "U"))
      .filter(col(op).isNotNull)
      .select(pk.map(col) ++ valueCols.map(c =>
        when(col(op) === "D", col(s"_o_$c")).otherwise(col(s"_n_$c")).as(c)) :+
        col(op): _*)
  }

  /** Build an SCD-2 validity history from versioned records: each row
    * becomes a version valid from its own `ts` until the key's next
    * version (`valid_to` null = current). `tieBreak` columns disambiguate
    * equal timestamps — pass enough of them that (ts, tieBreak) is unique
    * per key, or the interval endpoints are nondeterministic.
    *
    * One shuffle (window over pk); at scale this is the same partitioning
    * a pk-bucketed history table already has.
    */
  def scd2History(versions: DataFrame, pk: Seq[String], ts: String,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(pk.map(col): _*)
      .orderBy((col(ts) +: tieBreak.map(col)).map(_.asc): _*)
    versions
      .withColumn("valid_from", col(ts))
      .withColumn("valid_to", lead(col(ts), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Golden-record survivorship: merge the same entity from several
    * sources into one row per key, FIELD BY FIELD — each field takes its
    * value from the highest-priority source where it is non-null (the
    * master-data-management "most trusted source wins, fall back on
    * gaps" rule). `sources` is priority-ordered, most trusted first;
    * every frame must carry `pk` and all of `fields`. A key absent from
    * the leading sources still yields a row (fields from wherever it
    * exists); a field null in EVERY source stays null.
    *
    * Scale shape: one union (no join chain — k sources would otherwise
    * cost k−1 outer joins) and ONE partial-aggregated shuffle keyed by
    * pk: each field is `min_by(field, rank-where-non-null)`, and min_by
    * skips rows whose ordering key is null, which encodes "first
    * non-null by priority" as a plain aggregate. The exchange carries
    * one combiner row per (pk, source-subset), never the full source
    * rows of hot keys.
    */
  def survivorship(sources: Seq[DataFrame], pk: Seq[String],
      fields: Seq[String]): DataFrame = {
    require(sources.nonEmpty, "survivorship: at least one source")
    require(fields.nonEmpty, "survivorship: at least one field")
    val ranked = sources.zipWithIndex.map { case (src, rank) =>
      guardKeys(src, pk, "survivorship")
        .select((pk.map(col) ++ fields.map(col) :+ lit(rank).as("_rank")): _*)
    }.reduce(_ unionByName _)
    val merged = ranked.groupBy(pk.map(col): _*)
      .agg(
        min_by(col(fields.head),
          when(col(fields.head).isNotNull, col("_rank"))).as(fields.head),
        fields.tail.map(f =>
          min_by(col(f), when(col(f).isNotNull, col("_rank"))).as(f)) ++
          // duplicate detection rides the same aggregate: a pk with more
          // rows than distinct source ranks appears twice in one source,
          // which would make every min_by tie arbitrary — fail by name
          Seq(count(lit(1)).as("_nr"),
            count_distinct(col("_rank")).as("_nd")): _*)
    val dupGuard = when(col("_nr") > col("_nd"), raise_error(concat(
      lit("survivorship: key ("),
      concat_ws(",", pk.map(k => col(k).cast("string")): _*),
      lit(") appears more than once within a single source — " +
        "dedupe each source (e.g. Merge.applyChanges) first"))))
    // the guard rides EVERY field, not just the first: a caller
    // projection keeping any one field keeps its guard — wrapping only
    // one would let column pruning drop the raise_error (and the _nr/_nd
    // aggregates feeding it) the moment that field is unused
    merged
      .select(pk.map(col) ++ fields.map(f =>
        coalesce(dupGuard.cast(merged.schema(f).dataType), col(f)).as(f)): _*)
  }
}
