package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The master-join operator family: MasterJoin / MasterCheck /
  * MasterJoinUpdate / MasterBranch, each in shuffled and broadcast form
  * (reference: the fragment/user/join classes, ShuffledMaster*OperatorCompiler /
  * BroadcastMaster*OperatorCompiler).
  *
  * Semantics: per join key, ONE master record is selected for each
  * transaction record — by default the first master in the masters' group
  * order (reference DefaultMasterSelection.scala:24-27), optionally by a
  * user `@MasterSelection` hook. Matched transactions flow to the mapped /
  * updated / found port, unmatched to `missed`.
  *
  * Two physical paths, chosen like the reference's planner chooses
  * Broadcast* vs Shuffled* compilers (BroadcastInfo size estimation):
  *  - fast path (default first-match selection): dedup masters to one row
  *    per key, then a single equi-join; Catalyst plans broadcast-hash,
  *    shuffled-hash or sort-merge — `broadcastMaster` forces the hint the
  *    reference exposes explicitly.
  *  - general path (user selection hook): typed cogroup; the hook sees the
  *    full master list per key, per transaction — arbitrary code, so no
  *    join pushdown is possible (same restriction as the reference).
  *
  * Scale notes: the fast path is one shuffle on the join key (or zero with
  * broadcast); master dedup folds into the same shuffle via partial
  * aggregation. Null join keys: SQL equi-joins drop nulls while the
  * reference groups null==null (byte-equal serialized keys, ShuffleKey
  * .scala:31-41); pass `nullSafeKeys = true` to reproduce that with `<=>`.
  */
object Joins {

  /** found/missed port pair shared by the whole family. */
  final case class JoinPorts(found: DataFrame, missed: DataFrame)

  private val MatchTag = "_graft_master_matched"

  /** First-match master selection: keep one master row per key. With an
    * explicit order this is deterministic (row_number over the order); with
    * none it mirrors the reference's "first in group encounter order"
    * (arbitrary but single) via dropDuplicates, which plans as a partial +
    * final aggregate (no extra shuffle beyond the join's own).
    */
  def selectMaster(master: DataFrame, keys: Seq[String], order: Seq[Column],
      uniqueMaster: Boolean = false): DataFrame =
    if (uniqueMaster) master // caller guarantees one row per key: no dedup shuffle
    else if (order.isEmpty) master.dropDuplicates(keys)
    else {
      val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      master.withColumn("_graft_rn", row_number().over(w))
        .filter(col("_graft_rn") === 1).drop("_graft_rn")
    }

  private def joined(tx: DataFrame, master: DataFrame, keys: Seq[String],
      masterOrder: Seq[Column], broadcastMaster: Boolean, nullSafeKeys: Boolean,
      uniqueMaster: Boolean): DataFrame = {
    val m0 = selectMaster(master, keys, masterOrder, uniqueMaster)
      // disambiguate master's key columns so tx columns survive the join
      .withColumns(keys.map(k => s"_graft_mk_$k" -> col(k)).toMap)
      .drop(keys: _*)
      .withColumn(MatchTag, lit(true))
    val m = if (broadcastMaster) broadcast(m0) else m0
    val cond = keys.map { k =>
      if (nullSafeKeys) tx(k) <=> m(s"_graft_mk_$k") else tx(k) === m(s"_graft_mk_$k")
    }.reduce(_ && _)
    tx.join(m, cond, "left_outer").drop(keys.map(k => s"_graft_mk_$k"): _*)
  }

  /** MasterJoin: matched tx → `output` projection over (master ++ tx)
    * columns; unmatched tx → missed port with the tx schema
    * (reference: join/MasterJoin.scala:22-41,
    * ShuffledJoinOperatorFragment.scala:22-47).
    */
  def masterJoin(tx: DataFrame, master: DataFrame, keys: Seq[String], output: Seq[Column],
      masterOrder: Seq[Column] = Nil, broadcastMaster: Boolean = false,
      nullSafeKeys: Boolean = false, uniqueMaster: Boolean = false): JoinPorts = {
    val j = joined(tx, master, keys, masterOrder, broadcastMaster, nullSafeKeys, uniqueMaster)
    JoinPorts(
      found = j.filter(col(MatchTag)).select(output: _*),
      missed = j.filter(col(MatchTag).isNull).select(tx.columns.map(col).toSeq: _*))
  }

  /** MasterCheck: route tx to found/missed, no column mapping
    * (reference: join/MasterCheck.scala:22-31). Planned as semi + anti
    * joins — both pushdown-friendly and broadcast-able.
    */
  def masterCheck(tx: DataFrame, master: DataFrame, keys: Seq[String],
      broadcastMaster: Boolean = false): JoinPorts = {
    val m0 = master.select(keys.map(col): _*)
    val m = if (broadcastMaster) broadcast(m0) else m0
    JoinPorts(
      found = tx.join(m, keys, "left_semi"),
      missed = tx.join(m, keys, "left_anti"))
  }

  /** MasterJoinUpdate: matched tx records are updated with master columns
    * in scope; missed port passes unmatched tx unchanged
    * (reference: join/MasterJoinUpdate.scala:22-38).
    */
  def masterJoinUpdate(tx: DataFrame, master: DataFrame, keys: Seq[String],
      updates: Seq[(String, Column)], masterOrder: Seq[Column] = Nil,
      broadcastMaster: Boolean = false, nullSafeKeys: Boolean = false,
      uniqueMaster: Boolean = false): JoinPorts = {
    val j = joined(tx, master, keys, masterOrder, broadcastMaster, nullSafeKeys, uniqueMaster)
    val txCols = tx.columns.toSeq
    val updated = j.filter(col(MatchTag)).withColumns(updates.toMap)
      .select(txCols.map(col): _*)
    JoinPorts(updated, j.filter(col(MatchTag).isNull).select(txCols.map(col): _*))
  }

  /** MasterBranch: a user expression over (master ++ tx) columns routes
    * each tx to an enum port; the master side may be null for unmatched tx
    * (reference: join/MasterBranch.scala:22-31). Returns the same
    * multi-port value as the record-level Branch.
    */
  def masterBranch(tx: DataFrame, master: DataFrame, keys: Seq[String], tag: Column,
      masterOrder: Seq[Column] = Nil, broadcastMaster: Boolean = false,
      nullSafeKeys: Boolean = false, tagCol: String = "_branch",
      uniqueMaster: Boolean = false): BranchPorts = {
    val j = joined(tx, master, keys, masterOrder, broadcastMaster, nullSafeKeys, uniqueMaster)
    new BranchPorts(j.withColumn(tagCol, tag).drop(MatchTag), tagCol)
  }

  /** Declarative master-selection: when the `@MasterSelection` hook is
    * expressible as "keep masters where `predicate(master, tx)` holds, pick
    * the first by `preference` order", the selection plans as relational
    * operators instead of a typed cogroup — equi-join on the group key,
    * predicate filter, then a `min_by` aggregate per transaction row. This
    * is the SparkStrategy alternative SURVEY.md §4 anticipates, realized as
    * plain Catalyst operators: the whole pipeline stays in whole-stage
    * codegen with partial (map-side) aggregation, where the typed-cogroup
    * hook pays object serde per record and blocks codegen.
    *
    * Unlike the first-match fast path ([[selectMaster]] pre-join dedup),
    * `predicate` may reference BOTH sides — per-transaction master
    * eligibility, which a pre-join dedup cannot express (reference:
    * `@MasterSelection` methods receive the tx record,
    * ShuffledJoinOperatorFragment.scala:22-47).
    *
    * Contract: `txId` uniquely identifies a tx row; `preference` is an
    * ascending lexicographic order over the joined columns (negate numeric
    * columns for descending; include a master-unique tiebreaker or ties
    * resolve arbitrarily — same caveat as the reference's unordered group
    * encounter); `output` columns (over tx ++ master) must be aliased —
    * they become the found port's schema.
    *
    * Scale: join shuffles on `keys` (or zero-shuffle with
    * `broadcastMaster`), selection is one more exchange on `txId` with
    * partial min_by merge — both skew-handled by AQE. The missed port is a
    * left-anti of tx against the candidate tx ids.
    */
  def masterJoinSelectBy(tx: DataFrame, master: DataFrame, keys: Seq[String],
      txId: Seq[String], preference: Seq[Column], output: Seq[Column],
      predicate: Column = lit(true), broadcastMaster: Boolean = false,
      nullSafeKeys: Boolean = false): JoinPorts = {
    val m0 = master
      .withColumns(keys.map(k => s"_graft_mk_$k" -> col(k)).toMap)
      .drop(keys: _*)
    val m = if (broadcastMaster) broadcast(m0) else m0
    val cond = keys.map { k =>
      if (nullSafeKeys) tx(k) <=> m(s"_graft_mk_$k") else tx(k) === m(s"_graft_mk_$k")
    }.reduce(_ && _)
    val candidates = tx.join(m, cond, "inner")
      .drop(keys.map(k => s"_graft_mk_$k"): _*)
      .filter(predicate)
    val found = candidates
      .groupBy(txId.map(col): _*)
      .agg(min_by(struct(output: _*), struct(preference: _*)).as("_graft_sel"))
      .select(col("_graft_sel.*"))
    val missed = tx.join(candidates.select(txId.map(col): _*), txId, "left_anti")
    JoinPorts(found, missed)
  }

  /** General path: MasterJoin with a user master-selection hook. The hook
    * receives the full (order-preserved) master list for the key and the
    * transaction record, returns the chosen master or None → missed
    * (reference: `@MasterSelection`, ShuffledJoinOperatorFragment.scala:22-47
    * invokes the selection per transaction).
    *
    * Masters per key are buffered (they must be — the hook re-traverses
    * them per transaction); transactions stream. The master buffer holds
    * at most `spillThreshold` records on heap and spills the rest to
    * executor-local disk ([[SpillBuffer]]): a hot master key degrades to
    * disk replay per transaction instead of OOMing the task — the
    * reference's HEAP-then-SPILL buffer strategy
    * (CoGroupOperatorFragment.scala:65-116); the tx side stays one-pass
    * VOLATILE.
    */
  def masterJoinSelect[K: Encoder, M, T, O: Encoder](
      master: Dataset[M], tx: Dataset[T], spillThreshold: Int = -1)(
      masterKey: M => K, txKey: T => K)(
      selection: (Iterable[M], T) => Option[M])(
      mapJoined: (M, T) => O)(implicit te: Encoder[T], oe: Encoder[(Option[O], Option[T])])
      : (Dataset[O], Dataset[T]) = {
    val both: Dataset[(Option[O], Option[T])] =
      master.groupByKey(masterKey).cogroup(tx.groupByKey(txKey)) { (_, ms, ts) =>
        val limit = if (spillThreshold > 0) spillThreshold else SpillBuffer.defaultThreshold
        val masters = new SpillBuffer[M](limit)
        ms.foreach(masters.append)
        ts.map { t =>
          selection(masters, t) match {
            case Some(m) => (Some(mapJoined(m, t)), None)
            case None    => (None, Some(t))
          }
        }
      }
    // Persist so found/missed ports share one cogroup pass (released via
    // graft.Caches.clear).
    val shared = both.persist()
    graft.Caches.track(shared.toDF())
    (shared.flatMap(_._1), shared.flatMap(_._2))
  }

  /** Broadcast form of the master-selection path: the master side becomes a
    * driver-built broadcast GroupView and the hook runs as transactions
    * stream through mapPartitions — zero shuffle on either side (reference:
    * BroadcastJoinOperatorFragment.scala:24-83 invokes `@MasterSelection`
    * against a broadcast MapGroupView the same way). The master must be
    * dimension-sized; [[Views.groupView]]'s row bound enforces that with a
    * fail-fast instead of a driver OOM.
    */
  def masterJoinSelectBroadcast[K, M, T, O: Encoder](
      master: Dataset[M], tx: Dataset[T])(masterKey: M => K, txKey: T => K)(
      selection: (Iterable[M], T) => Option[M])(
      mapJoined: (M, T) => O)(implicit te: Encoder[T], oe: Encoder[(Option[O], Option[T])])
      : (Dataset[O], Dataset[T]) = {
    val view = Views.groupView(master)(masterKey)
    val both: Dataset[(Option[O], Option[T])] = tx.mapPartitions { ts =>
      ts.map { t =>
        selection(view.find(txKey(t)), t) match {
          case Some(m) => (Some(mapJoined(m, t)), None: Option[T])
          case None    => (None: Option[O], Some(t))
        }
      }
    }
    // found/missed share one pass, same contract as the shuffled path
    val shared = both.persist()
    graft.Caches.track(shared.toDF())
    (shared.flatMap(_._1), shared.flatMap(_._2))
  }
}
