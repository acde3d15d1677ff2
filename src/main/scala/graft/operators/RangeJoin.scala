package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join: pair each left record with the right records of
  * the same key whose time falls in `[leftTime + lower, leftTime + upper]`
  * — the "events within the preceding hour" shape every event pipeline
  * needs. Spark plans a naive time-range join as a per-key nested loop
  * (O(|L|·|R|) per key); at 100 TB that is a non-starter.
  *
  * Implementation: quantize time into fixed-width buckets, explode each
  * left row to the buckets its window overlaps (a bounded
  * ⌈(upper−lower)/width⌉+1 copies — width defaults to the window span, so
  * ≤ 2), then equi-join on (key, bucket) and re-check the exact range
  * predicate. The join is a plain shuffled/broadcast hash join on
  * (key, bucket): one shuffle, codegen-friendly, AQE-skew-splittable, and
  * the bucket term spreads a hot key's rows over time so a single key's
  * traffic no longer lands in one task.
  */
object RangeJoin {

  /** @param lowerMicros window start offset relative to the left time
    *                    (microseconds, typically negative)
    * @param upperMicros window end offset
    * @param bucketMicros bucket width, rounded up to the next power of
    *                     two; defaults to the window span. Wider buckets
    *                     → fewer probe copies but more false candidates
    *                     re-checked by the residual predicate.
    *
    * Column name collisions between the two inputs are fine for the join
    * condition (resolved per side) but the caller should alias overlapping
    * payload columns before selecting from the result, as with any Spark
    * join. With an outer `joinType`, unmatched left rows surface once per
    * overlapped bucket — aggregate by a left key or dedup downstream.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      lowerMicros: Long, upperMicros: Long,
      bucketMicros: Long = -1L,
      includeLower: Boolean = true, includeUpper: Boolean = true,
      joinType: String = "inner"): DataFrame = {
    require(upperMicros >= lowerMicros, "empty window")
    // bucket width rounds up to a power of two and buckets are computed
    // with an arithmetic right shift: exact integral floor-division at any
    // magnitude. A double-precision `/` would mis-bucket keys above 2^53
    // (snowflake-scale ids) and silently drop matching pairs.
    val rawWidth = if (bucketMicros > 0) bucketMicros
      else math.max(upperMicros - lowerMicros, 1L)
    val shift = 64 - java.lang.Long.numberOfLeadingZeros(math.max(rawWidth - 1, 1L))
    // timestamps compare in epoch micros; integral columns join on their
    // own scale — the same bucketing covers numeric band joins ("ids/
    // positions within ±delta"). Fractional types are rejected rather
    // than silently truncated (a double position 510.9 must not pass a
    // ±10 band around 500); scale them to an integral column first.
    def scalar(df: DataFrame, c: String): Column = {
      import org.apache.spark.sql.types._
      df.schema(c).dataType match {
        case TimestampType => unix_micros(col(c))
        // TIMESTAMP_NTZ compares as its UTC-interpreted instant — the
        // session zone is pinned UTC engine-wide (GraftSession.normalizeTs)
        case TimestampNTZType => unix_micros(col(c).cast(TimestampType))
        case ByteType | ShortType | IntegerType | LongType => col(c).cast("long")
        case t => throw new IllegalArgumentException(
          s"rangeJoin time/band column '$c' has unsupported type $t: " +
            "use timestamp or an integral type (pre-scale fractional values)")
      }
    }
    // plan aliases (not DataFrame-instance refs) keep the key equality
    // unambiguous when both inputs derive from the same scan (self-join)
    val l = left
      .withColumn("_t_micros", scalar(left, leftTime))
      .withColumn("_bucket", explode(sequence(
        shiftright(col("_t_micros") + lowerMicros, shift),
        shiftright(col("_t_micros") + upperMicros, shift))))
      .alias("_rj_l")
    val r = right.withColumn("_rt_micros", scalar(right, rightTime))
      .withColumn("_rbucket", shiftright(col("_rt_micros"), shift))
      .alias("_rj_r")
    val lt = col("_rj_l._t_micros")
    val rt = col("_rj_r._rt_micros")
    val lowerPred = if (includeLower) rt >= lt + lowerMicros else rt > lt + lowerMicros
    val upperPred = if (includeUpper) rt <= lt + upperMicros else rt < lt + upperMicros
    val cond = (keys.map(k => col(s"_rj_l.$k") === col(s"_rj_r.$k")) :+
      (col("_rj_l._bucket") === col("_rj_r._rbucket")) :+
      (lowerPred && upperPred)).reduce(_ && _)
    l.join(r, cond, joinType)
      .drop(col("_rj_l._bucket")).drop(col("_rj_l._t_micros"))
      .drop(col("_rj_r._rbucket")).drop(col("_rj_r._rt_micros"))
  }
}
