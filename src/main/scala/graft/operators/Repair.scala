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
  * row filters, so the row-level anti-joins SHUFFLE only dirty-bucket
  * rows; clean buckets never cross an exchange. Scans stay full-table
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
    * Output: one row per (tuple present on one side only) — `side` "L"
    * for left-only, "R" for right-only — plus the key and compare
    * columns. An update surfaces as an L/R pair sharing keys; a
    * delete/insert as a lone L/R.
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
    val lDirty = l.join(broadcast(dirty), "_b").drop("_h")
    val rDirty = r.join(broadcast(dirty), "_b").drop("_h")
    val onlyL = lDirty.join(rDirty, cols, "left_anti")
      .select(lit("L").as("side") +: cols.map(col): _*)
    val onlyR = rDirty.join(lDirty, cols, "left_anti")
      .select(lit("R").as("side") +: cols.map(col): _*)
    onlyL.unionAll(onlyR)
  }
}
