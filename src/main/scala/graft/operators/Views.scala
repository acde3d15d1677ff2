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
    * dataset exceeds `maxRows`: a parallel count probes the size BEFORE any
    * driver materialization, so the failure is an exception, never a driver
    * OOM. (A `limit(maxRows+1).collect()` probe would bound memory too, but
    * Spark executes large limits as escalating partial jobs funneled
    * through few tasks — measured 8x slower than count+collect on a
    * 600k-row view.) The input is persisted across the two actions so the
    * probe and the collect see one snapshot of one computation.
    */
  def groupView[T, K](ds: Dataset[T], maxRows: Int = DefaultMaxRows)(key: T => K): GroupView[K, T] = {
    // respect a caller-owned cache: persist() on an already-persisted frame
    // throws ("cannot change storage level"), and unpersisting it here would
    // silently drop the caller's cache — only manage a cache this method made
    val callerCached = ds.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val cached = if (callerCached) ds else ds.persist()
    try {
      val n = cached.count()
      if (n > maxRows) throw new IllegalArgumentException(
        s"groupView input has $n rows, exceeding maxRows=$maxRows: a View/GroupView " +
          "is a driver-materialized broadcast and must be dimension-sized; use the " +
          "join family (graft.operators.Joins) for large lookups, or raise maxRows")
      val grouped: Map[K, Seq[T]] = cached.collect().toSeq.groupBy(key)
      new GroupView(ds.sparkSession.sparkContext.broadcast(grouped))
    } finally if (!callerCached) cached.unpersist(false)
  }
}
