package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch gap-based sessionization: group an event stream into sessions —
  * a new session starts whenever the gap to the same user's previous
  * event exceeds `gapSeconds`. The batch complement of the streaming
  * session window (graft.streaming.StreamOps.sessionAgg); the reference
  * expresses the same computation as a time-sorted CoGroup over the
  * event log (reference: runtime/src/main/scala/com/asakusafw/spark/runtime/driver/CoGroupDriver.scala:44-78
  * — grouped, secondary-sorted iteration per key).
  *
  * Scale shape: ONE exchange keyed by `user`. Both window passes (the
  * gap `lag` and the running-sum session counter) and the final
  * per-session aggregation share that partitioning, so Catalyst plans a
  * single Exchange + Sort and the groupBy becomes a partial-aggregated
  * no-exchange pass. Per-user event counts bound the sort buffer — a
  * pathological user spills via the sort, never OOMs a hash buffer.
  * Sessionization is inherently per-user-ordered, so the skew remedies
  * that apply to commutative aggregations (salting) do NOT apply here;
  * the 100 TB pattern is date-bucketed inputs with boundary-day overlap,
  * which composes with this operator unchanged.
  *
  * Timestamps are compared in integer microseconds (`unix_micros`) —
  * float seconds would lose sub-second gaps past 2^53 µs.
  */
object Sessionize {

  /** Add `session_seq` (1-based per-user session ordinal) to every event.
    * Ordering within a user is (ts, tieBreak...) — pass a unique tie-break
    * column (e.g. the event id) to make the assignment deterministic when
    * one user has equal timestamps.
    */
  def assign(events: DataFrame, user: String, ts: String, gapSeconds: Long,
      tieBreak: Seq[String] = Nil): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive (got $gapSeconds)")
    val order: Seq[Column] = col(ts) +: tieBreak.map(col)
    val w = Window.partitionBy(col(user)).orderBy(order: _*)
    // type-checked: a raw long ts is rejected, not reinterpreted as seconds
    val tsUs = graft.GraftSession.eventTimeMicros(events, ts)
    val prevUs = lag(tsUs, 1).over(w)
    val isBreak =
      when(prevUs.isNull || tsUs - prevUs > gapSeconds * 1000000L, 1L).otherwise(0L)
    events
      .withColumn("_brk", isBreak)
      .withColumn("session_seq",
        sum(col("_brk")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_brk")
  }

  /** Collapse events to one row per session: (user, session_seq,
    * n_events, n_event_types, start_us, end_us, duration_us). All-integer
    * output — exactly reproducible by any engine.
    */
  def sessions(events: DataFrame, user: String, ts: String, gapSeconds: Long,
      tieBreak: Seq[String] = Nil, eventType: Option[String] = None): DataFrame = {
    val assigned = assign(events, user, ts, gapSeconds, tieBreak)
    val tsUs = graft.GraftSession.eventTimeMicros(events, ts)
    val aggs = Seq(
      count(lit(1)).as("n_events"),
      min(tsUs).as("start_us"),
      max(tsUs).as("end_us"),
      (max(tsUs) - min(tsUs)).as("duration_us")) ++
      eventType.map(t => countDistinct(col(t)).as("n_event_types"))
    assigned.groupBy(col(user), col("session_seq")).agg(aggs.head, aggs.tail: _*)
  }
}
