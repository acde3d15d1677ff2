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

  /** Timestamps compare in epoch micros; integral columns join on their
    * own scale — the same bucketing covers numeric band joins ("ids/
    * positions within ±delta"). Fractional types are rejected rather
    * than silently truncated (a double position 510.9 must not pass a
    * ±10 band around 500); scale them to an integral column first.
    */
  private def scalar(df: DataFrame, c: String): Column = {
    import org.apache.spark.sql.types._
    df.schema(c).dataType match {
      case TimestampType => unix_micros(col(c))
      // TIMESTAMP_NTZ compares as its UTC-interpreted instant — the
      // session zone is pinned UTC engine-wide (GraftSession.normalizeTs)
      case TimestampNTZType => unix_micros(col(c).cast(TimestampType))
      case ByteType | ShortType | IntegerType | LongType => col(c).cast("long")
      case t => throw new IllegalArgumentException(
        s"range/interval join column '$c' has unsupported type $t: " +
          "use timestamp or an integral type (pre-scale fractional values)")
    }
  }

  /** Bucket width rounds up to a power of two and buckets are computed
    * with an arithmetic right shift: exact integral floor-division at any
    * magnitude. A double-precision `/` would mis-bucket keys above 2^53
    * (snowflake-scale ids) and silently drop matching pairs.
    */
  private def widthShift(width: Long): Int =
    64 - java.lang.Long.numberOfLeadingZeros(math.max(width - 1, 1L))


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
    // the default width is the window SPAN, which itself wraps in Long
    // for windows covering more than half the axis (lower near MinValue,
    // upper positive): a wrapped span reads tiny, the shift comes out
    // near 0, and the bucket sequence() explodes toward 2^64 rows. The
    // exact span lives in BigInt and clamps to Long.MaxValue — shift 63,
    // ≤ 2 bucket copies, and the residual predicate (already exact in
    // decimal) decides membership, so the clamp is lossless.
    val span = (BigInt(upperMicros) - BigInt(lowerMicros))
      .min(BigInt(Long.MaxValue)).toLong
    val shift = widthShift(
      if (bucketMicros > 0) bucketMicros else math.max(span, 1L))
    // saturating add for the bucket bounds: `t + delta` in BIGINT wraps
    // for times/ids within `delta` of the Long range ends, mis-bucketing
    // the probe and silently DROPPING matching pairs. Clamping to the
    // range end only widens the candidate bucket span (no value beyond
    // Long range exists to match), and the exact residual below decides
    // membership — buckets are a superset generator, so saturation is
    // lossless.
    def satAdd(c: Column, delta: Long): Column =
      if (delta >= 0L)
        when(c > Long.MaxValue - delta, Long.MaxValue).otherwise(c + delta)
      else
        when(c < Long.MinValue - delta, Long.MinValue).otherwise(c + delta)
    // plan aliases (not DataFrame-instance refs) keep the key equality
    // unambiguous when both inputs derive from the same scan (self-join)
    val l = left
      .withColumn("_t_micros", scalar(left, leftTime))
      .withColumn("_bucket", explode(sequence(
        shiftright(satAdd(col("_t_micros"), lowerMicros), shift),
        shiftright(satAdd(col("_t_micros"), upperMicros), shift))))
      .alias("_rj_l")
    val r = right.withColumn("_rt_micros", scalar(right, rightTime))
      .withColumn("_rbucket", shiftright(col("_rt_micros"), shift))
      .alias("_rj_r")
    // the residual range test runs in DECIMAL: it only touches candidate
    // pairs the bucket equi-join already pruned, and `lt + offset` in
    // BIGINT would wrap at the same extremes the bucket clamp guards —
    // the exact predicate is what makes the saturated buckets safe
    val lt = col("_rj_l._t_micros").cast("decimal(21,0)")
    val rt = col("_rj_r._rt_micros").cast("decimal(21,0)")
    val lowerPred = if (includeLower) rt >= lt + lowerMicros else rt > lt + lowerMicros
    val upperPred = if (includeUpper) rt <= lt + upperMicros else rt < lt + upperMicros
    val cond = (keys.map(k => col(s"_rj_l.$k") === col(s"_rj_r.$k")) :+
      (col("_rj_l._bucket") === col("_rj_r._rbucket")) :+
      (lowerPred && upperPred)).reduce(_ && _)
    l.join(r, cond, joinType)
      .drop(col("_rj_l._bucket")).drop(col("_rj_l._t_micros"))
      .drop(col("_rj_r._rbucket")).drop(col("_rj_r._rt_micros"))
  }

  /** Interval-OVERLAP join: pair left and right records of the same key
    * whose intervals `[leftStart, leftEnd]` and `[rightStart, rightEnd]`
    * intersect (closed endpoints). The interval-interval generalization
    * of [[rangeJoin]]'s point-in-window shape — "which incident windows
    * touched this session".
    *
    * Same bucket-quantization rewrite, with BOTH sides exploded to the
    * buckets their interval covers; a pair overlapping several buckets
    * would duplicate, so each pair is attributed to exactly ONE bucket —
    * the bucket of `max(leftStart, rightStart)`, the first bucket the
    * two intervals share — making the join duplicate-free with no
    * distinct pass. `bucketMicros` trades explosion (⌈span/width⌉+1
    * copies per row) against candidate precision; it must be ≥ the
    * TYPICAL interval span to keep the copy count small.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftStart: String, leftEnd: String,
      rightStart: String, rightEnd: String,
      bucketMicros: Long, joinType: String = "inner"): DataFrame = {
    require(bucketMicros > 0, "intervalJoin: bucketMicros must be positive")
    require(joinType.toLowerCase.replace("_", "") == "inner",
      "intervalJoin: only inner joins — the one-bucket pair attribution " +
        "makes MATCHES duplicate-free, but an outer join would null-extend " +
        "every non-owner bucket copy of an unmatched row (use rangeJoin's " +
        "documented aggregate-after pattern for outer semantics)")
    val shift = widthShift(bucketMicros)
    // an inverted interval (start > end) would make sequence() DESCEND —
    // a silent near-unbounded explosion — so it fails the job by name
    def buckets(s: Column, e: Column, side: String): Column =
      explode(when(s > e, raise_error(concat(
          lit(s"intervalJoin: inverted $side interval (start="), s,
          lit(" > end="), e, lit(")"))).cast("array<bigint>"))
        .otherwise(sequence(shiftright(s, shift), shiftright(e, shift))))
    val l = left
      .withColumn("_ls", scalar(left, leftStart))
      .withColumn("_le", scalar(left, leftEnd))
      .withColumn("_bucket", buckets(col("_ls"), col("_le"), "left"))
      .alias("_ij_l")
    val r = right
      .withColumn("_rs", scalar(right, rightStart))
      .withColumn("_re", scalar(right, rightEnd))
      .withColumn("_rbucket", buckets(col("_rs"), col("_re"), "right"))
      .alias("_ij_r")
    val (ls, le) = (col("_ij_l._ls"), col("_ij_l._le"))
    val (rs, re) = (col("_ij_r._rs"), col("_ij_r._re"))
    val overlap = ls <= re && rs <= le
    // one-bucket attribution: max(ls, rs) lies in both intervals whenever
    // they overlap, so its bucket is shared — and unique per pair
    val owner = col("_ij_l._bucket") === shiftright(greatest(ls, rs), shift)
    val cond = (keys.map(k => col(s"_ij_l.$k") === col(s"_ij_r.$k")) :+
      (col("_ij_l._bucket") === col("_ij_r._rbucket")) :+
      (overlap && owner)).reduce(_ && _)
    l.join(r, cond, joinType)
      .drop(col("_ij_l._bucket")).drop(col("_ij_l._ls")).drop(col("_ij_l._le"))
      .drop(col("_ij_r._rbucket")).drop(col("_ij_r._rs")).drop(col("_ij_r._re"))
  }
}
