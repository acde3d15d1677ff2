package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Merkle-style replica reconciliation: find the row-level differences
  * between two copies of a table by first comparing per-bucket
  * fingerprints (the anti-entropy pattern of Dynamo/Cassandra repair),
  * then running the exact row diff ONLY over buckets whose fingerprints
  * disagree. The "did this copy/mirror/backfill drift, and where"
  * primitive that a fingerprint mismatch ([[Checks.fingerprint]]) asks
  * for next.
  *
  * Scale shape: pass 1 is one partial-aggregated shuffle of (bucket,
  * sum, count) — longs only, no rows. The dirty-bucket set (tiny by
  * construction: at most one bucket per differing row) broadcasts into
  * row filters, so the row-level compare — per-tuple multiplicities
  * full-outer-joined null-safely — SHUFFLES only dirty-bucket tuples;
  * clean buckets never cross an exchange. Scans stay full-table
  * unless the storage layout is bucket-clustered (compose with
  * [[graft.sinks.Bucketed]] / [[graft.sinks.Upsert]] to prune reads
  * too). A bucket fingerprint is an order-independent DECIMAL(38,0) sum
  * of quadratically-mixed row hashes — the same rearrangement-detecting
  * construction as [[Checks.fingerprint]]; a colliding pair of edits
  * within one bucket (~2⁻³¹) would hide that bucket, the standard
  * Merkle-sync trade.
  */
object Repair {

  /** Row-level diff of two replicas. `keys` locate a row (bucket
    * assignment uses only them, so an updated row's bucket dirties on
    * both sides); `compare` are the value columns included in the diff.
    * Output: one row per DRIFTED TUPLE per side — `side` "L" when the
    * tuple's left multiplicity exceeds its right multiplicity, "R" for
    * the converse — plus the key and compare columns. An update surfaces
    * as an L/R pair sharing keys; a delete/insert as a lone L/R; a
    * duplicate-count drift of an identical tuple as the side holding the
    * extra copies (emitted ONCE — the output is the drifted-tuple SET,
    * equal to the symmetric EXCEPT on duplicate-free inputs). NULLs in
    * any column compare as equal (null-safe), matching SQL EXCEPT.
    */
  def diff(left: DataFrame, right: DataFrame, keys: Seq[String],
      compare: Seq[String], nBuckets: Int = 1 << 12): DataFrame = {
    require(keys.nonEmpty, "repair: no key columns")
    require(nBuckets > 0, "repair: nBuckets must be positive")
    val cols = keys ++ compare
    val p = 2147483647L // 2^31 - 1, matching Checks.fingerprint's ring
    def prepared(df: DataFrame): DataFrame = {
      val h = pmod(xxhash64(cols.map(col): _*), lit(p))
      df.select(cols.map(col): _*)
        .withColumn("_b", pmod(xxhash64(keys.map(col): _*), lit(nBuckets)))
        .withColumn("_h", (h * h + h) % p)
    }
    val l = prepared(left)
    val r = prepared(right)
    def summary(df: DataFrame) = df.groupBy(col("_b"))
      .agg(sum(col("_h").cast("decimal(38,0)")).as("_fp"),
        count(lit(1)).as("_n"))
    // full outer: a bucket present on one side only is dirty by definition
    val dirty = summary(l).withColumnRenamed("_fp", "_lfp").withColumnRenamed("_n", "_ln")
      .join(summary(r).withColumnRenamed("_fp", "_rfp").withColumnRenamed("_n", "_rn"),
        Seq("_b"), "full_outer")
      .filter(col("_lfp").isNull || col("_rfp").isNull ||
        col("_lfp") =!= col("_rfp") || col("_ln") =!= col("_rn"))
      .select(col("_b"))
    // per-tuple multiplicities within the dirty buckets, then one
    // null-safe full-outer join: count drift on either side surfaces —
    // an anti-join would miss equal-tuple-different-count drift and would
    // treat NULL keys as unequal (falsely diffing identical null rows)
    def counted(df: DataFrame) = df.join(broadcast(dirty), "_b")
      .groupBy(cols.map(col): _*).agg(count(lit(1)).as("_cnt"))
    val lc = counted(l).alias("_rp_l")
    val rc = counted(r).alias("_rp_r")
    val joinCond = cols.map(c => col(s"_rp_l.$c") <=> col(s"_rp_r.$c"))
      .reduce(_ && _)
    val ln = coalesce(col("_rp_l._cnt"), lit(0L))
    val rn = coalesce(col("_rp_r._cnt"), lit(0L))
    val joined = lc.join(rc, joinCond, "full_outer")
    def sideRows(tag: String, more: Column) =
      joined.filter(more)
        .select(lit(tag).as("side") +:
          cols.map(c => coalesce(col(s"_rp_l.$c"), col(s"_rp_r.$c")).as(c)): _*)
    sideRows("L", ln > rn).unionAll(sideRows("R", rn > ln))
  }

  /** Reconcile: the repaired RIGHT replica — [[diff]]'s drifted keys take
    * the LEFT (primary) side's rows; everything else passes through
    * untouched. With key-unique inputs the result equals the primary's
    * (keys ++ compare) projection — the closing step of the Merkle loop:
    * fingerprint → dirty buckets → row diff → sync.
    *
    * Scale shape: the diff already restricts work to dirty buckets; its
    * key set is drift-sized and broadcasts into the anti/semi joins
    * (null-safe, so null-keyed drift reconciles too). This produces the
    * repaired TABLE; pair it with the dirty-bucket copy-on-write sink
    * ([[graft.sinks.Upsert]]) to land it without rewriting clean
    * buckets.
    */
  def sync(left: DataFrame, right: DataFrame, keys: Seq[String],
      compare: Seq[String], nBuckets: Int = 1 << 12): DataFrame = {
    val cols = keys ++ compare
    val dirtyKeys = diff(left, right, keys, compare, nBuckets)
      .select(keys.map(col): _*).distinct()
    def keyCond(a: DataFrame, b: DataFrame) =
      keys.map(k => a(k) <=> b(k)).reduce(_ && _)
    val r = right.select(cols.map(col): _*)
    val l = left.select(cols.map(col): _*)
    r.join(broadcast(dirtyKeys), keyCond(r, dirtyKeys), "left_anti")
      .unionByName(
        l.join(broadcast(dirtyKeys), keyCond(l, dirtyKeys), "left_semi"))
  }
}
