package graft.operators

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Dataset

/** Broadcast side-input views: any operator can take a whole (small)
  * dataset as a keyed lookup table (reference `View`/`GroupView` operator
  * parameters with `InputUnit.WHOLE`: compiler/.../operator/ViewFields
  * .scala:33-105; runtime/.../fragment/MapGroupView.scala:25-33; built and
  * broadcast by runtime/.../graph/MapBroadcast.scala:27-71).
  *
  * Scale notes: like the reference, the view is materialized on the driver
  * and broadcast — correct only for dimension-sized data (the reference has
  * the same constraint; its planner size-estimates broadcast eligibility).
  * `maxRows` makes that constraint a fail-fast contract instead of a driver
  * OOM: the collect is bounded by `limit(maxRows + 1)`, so a fact table
  * mistakenly passed as a view dies with a pointer at the join family
  * before any unbounded driver allocation. For large lookups use the join
  * family; Catalyst still picks a broadcast join when the side fits
  * `autoBroadcastJoinThreshold`.
  */
final class GroupView[K, V](bc: Broadcast[Map[K, Seq[V]]]) extends Serializable {
  /** All records for the key, in the view's build order (empty if none). */
  def find(k: K): Seq[V] = bc.value.getOrElse(k, Nil)
  def contains(k: K): Boolean = bc.value.contains(k)
  def keys: Iterable[K] = bc.value.keys
}

object Views {

  /** Default driver-side row bound for a view (dimension-table sized). */
  val DefaultMaxRows: Int = 4000000

  /** Build a broadcast GroupView keyed by `key`. Fails fast when the
    * dataset exceeds `maxRows` — the collect itself is limit-bounded, so
    * the failure is an exception, never a driver OOM.
    */
  def groupView[T, K](ds: Dataset[T], maxRows: Int = DefaultMaxRows)(key: T => K): GroupView[K, T] = {
    val rows = ds.limit(maxRows + 1).collect()
    if (rows.length > maxRows) throw new IllegalArgumentException(
      s"groupView input exceeds maxRows=$maxRows: a View/GroupView is a " +
        "driver-materialized broadcast and must be dimension-sized; use the " +
        "join family (graft.operators.Joins) for large lookups, or raise maxRows")
    val grouped: Map[K, Seq[T]] = rows.toSeq.groupBy(key)
    new GroupView(ds.sparkSession.sparkContext.broadcast(grouped))
  }
}
