package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sampling operators for training-data pipelines: deterministic
  * train/validation/test splits, per-group caps, and stratified sampling.
  *
  * Splits and caps use an EXPLICIT multiplicative hash (Knuth's 2654435761
  * over a 2^32 ring) written in plain integer Column arithmetic rather than
  * an engine-native hash function, for two scale-critical reasons:
  * assignment is reproducible across engines and releases (a re-run or a
  * different engine assigns every record to the same split — required for
  * dataset versioning), and it is pure narrow arithmetic — no shuffle, no
  * RNG state, fully inside WholeStageCodegen.
  */
object Sampling {

  /** Uniform pseudo-random bucket in [0, buckets) from an integral id.
    *
    * Computes (lo32(id) * 2654435761) mod 2^32 with the multiply SPLIT
    * into 16-bit halves: a direct 64-bit product overflows Long for ids
    * above ~3.4e9 (snowflake-style ids), which throws under Spark's ANSI
    * mode and errors in DuckDB. The split keeps every intermediate below
    * 2^50 and the masked lo32 makes negative ids well-defined — the same
    * expression evaluates identically in any engine with 64-bit integers.
    */
  def hashBucket(id: Column, buckets: Int): Column = {
    val lo = id.cast("long").bitwiseAND(lit(4294967295L))
    val h = shiftright(lo, 16)
    val l = lo.bitwiseAND(lit(65535L))
    val m = (pmod(h * lit(2654435761L), lit(4294967296L)) * 65536L + l * lit(2654435761L)) % 4294967296L
    pmod(m, lit(buckets.toLong))
  }

  /** Deterministic percentage split: `weights` maps label -> percent
    * (must sum to 100); every record gets a `split` label from its id —
    * stable under re-runs, insertions, and engine changes.
    */
  def deterministicSplit(df: DataFrame, id: Column,
      weights: Seq[(String, Int)], out: String = "split"): DataFrame = {
    require(weights.map(_._2).sum == 100, "weights must sum to 100")
    val b = hashBucket(id, 100)
    val expr = weights.tail.foldLeft((weights.head._2, when(b < weights.head._2, weights.head._1))) {
      case ((cum, acc), (label, pct)) => (cum + pct, acc.when(b < cum + pct, label))
    }._2
    df.withColumn(out, expr)
  }

  /** At most `k` records per group, chosen deterministically by hash order
    * (a uniform sample, not "first k in storage order"). One shuffle on the
    * group keys; Spark's WindowGroupLimit prunes to k per group map-side
    * before the exchange, so the shuffle carries O(k·groups) rows.
    */
  def capPerGroup(df: DataFrame, keys: Seq[String], k: Int, id: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(hashBucket(id, 1 << 30).asc, id.asc)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") <= k).drop("_rn")
  }

  /** Stratified sample: per-stratum fractions via Bernoulli sampling
    * (seeded, so locally reproducible; assignment is NOT stable under
    * engine changes — use [[deterministicSplit]] where that matters).
    */
  def stratifiedSample(df: DataFrame, strata: String,
      fractions: Map[String, Double], seed: Long = 42L): DataFrame =
    df.stat.sampleBy(strata, fractions, seed)
}
