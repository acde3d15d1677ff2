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
  * For large lookups use the join family instead; Catalyst will still pick
  * a broadcast join when the side fits `autoBroadcastJoinThreshold`.
  */
final class GroupView[K, V](bc: Broadcast[Map[K, Seq[V]]]) extends Serializable {
  /** All records for the key, in the view's build order (empty if none). */
  def find(k: K): Seq[V] = bc.value.getOrElse(k, Nil)
  def contains(k: K): Boolean = bc.value.contains(k)
  def keys: Iterable[K] = bc.value.keys
}

object Views {

  /** Build a broadcast GroupView keyed by `key`. */
  def groupView[T, K](ds: Dataset[T])(key: T => K): GroupView[K, T] = {
    val grouped: Map[K, Seq[T]] = ds.collect().toSeq.groupBy(key)
    new GroupView(ds.sparkSession.sparkContext.broadcast(grouped))
  }
}
