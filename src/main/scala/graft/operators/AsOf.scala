package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for each left record, the single right record
  * with the greatest `rightTime <= leftTime` for the same key — the
  * point-in-time lookup every event pipeline needs (Spark has no built-in;
  * the naive range join is O(|L|·|R|) per key).
  *
  * Implementation: union both sides tagged, one shuffle on the key, sort
  * by (time, side) within partitions, and carry the last seen right
  * payload forward with `last(ignoreNulls)` — O((|L|+|R|) log) total,
  * no join explosion, AQE-friendly. Right rows sort before left rows at
  * equal timestamps, so an exact-tie right row matches (>= semantics,
  * same as SQL ASOF JOIN).
  */
object AsOf {

  /** `rightPayload` columns are appended to every left row (null when no
    * prior right row exists). Right rows at identical (key, time) are
    * disambiguated by `rightTieBreak` — names of right-side columns (the
    * row with the greatest tie-break values wins); pass a unique column
    * for deterministic output. Right rows with a null `rightTime` are
    * excluded (SQL ASOF semantics: a null time never matches).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, rightPayload: Seq[String],
      rightTieBreak: Seq[String] = Nil): DataFrame =
    asofImpl(left, right, keys, leftTime, rightTime, rightPayload,
      rightTieBreak, backward = true)

  /** FORWARD as-of: for each left record, the single right record with
    * the SMALLEST `rightTime >= leftTime` for the same key — next-event
    * attribution (time-to-conversion, time-to-failure, the "what
    * happened next" lookup). Exact ties match, mirroring [[asofJoin]];
    * among right rows sharing the minimal (key, time), the SMALLEST
    * `rightTieBreak` wins (the forward scan's first row — pass a unique
    * column for deterministic output). Same single-shuffle shape: the
    * scan just runs time-descending.
    */
  def asofJoinForward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, rightPayload: Seq[String],
      rightTieBreak: Seq[String] = Nil): DataFrame =
    asofImpl(left, right, keys, leftTime, rightTime, rightPayload,
      rightTieBreak, backward = false)

  private def asofImpl(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, rightPayload: Seq[String],
      rightTieBreak: Seq[String], backward: Boolean): DataFrame = {
    import org.apache.spark.sql.types.StructType
    val leftCols = left.columns.toSeq
    val lType = StructType(leftCols.map(left.schema(_)))
    val rType = StructType(rightPayload.map(right.schema(_)))
    val l = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).as("_t"),
        lit(1).as("_side"),
        struct(leftCols.map(col): _*).as("_lrow"),
        lit(null).cast(rType).as("_rrow")): _*)
    val r = right.filter(col(rightTime).isNotNull).select(
      keys.map(col) ++ Seq(
        col(rightTime).as("_t"),
        lit(0).as("_side"),
        lit(null).cast(lType).as("_lrow"),
        struct(rightPayload.map(col): _*).as("_rrow")): _*)
    // backward: time-ascending scan, greatest-tiebreak right wins a tie
    // group (its last row). forward: time-DESCENDING scan — the last
    // right seen before a left row is the minimal time >= leftTime; tie
    // groups order tieBreak-descending so their last row is the SMALLEST
    // tie-break. Right rows sort before left at equal times either way
    // (ties match). Null left times must match NOTHING in both modes:
    // asc already sorts nulls first; desc defaults to nulls LAST, which
    // would park null-time left rows after every right row and attach the
    // key's earliest event — so the forward scan pins nulls first too.
    val timeOrd = if (backward) col("_t").asc else col("_t").desc_nulls_first
    val tieBreak = rightTieBreak.map(c =>
      if (backward) col(s"_rrow.$c").asc else col(s"_rrow.$c").desc)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((Seq(timeOrd, col("_side").asc) ++ tieBreak): _*)
    val filled = l.unionByName(r)
      .withColumn("_match", last(col("_rrow"), ignoreNulls = true)
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
    // key columns come from the TOP-LEVEL attributes (identical to the
    // struct copies for left rows) so the window's hash partitioning on
    // them stays visible to Catalyst — a downstream groupBy/join on the
    // keys reuses this exchange instead of re-shuffling
    filled.filter(col("_side") === 1)
      .select(leftCols.map(c =>
        (if (keys.contains(c)) col(c) else col(s"_lrow.$c")).as(c)) ++
        rightPayload.map(c => col(s"_match.$c").as(c)): _*)
  }
}
