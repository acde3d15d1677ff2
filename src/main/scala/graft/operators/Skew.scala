package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Groups.{SummarizeOp, SummarizeSpec}

/** Explicit skew-handling utilities. AQE's skew-join splitting covers most
  * cases at runtime; these are for the pathological keys AQE can't fix —
  * a single key too hot for one task even after splitting (the reference's
  * analogue is plan-time partition scaling, NumPartitions.scala:31-71;
  * salting is the standard Spark-era replacement).
  */
object Skew {

  /** Salted inner equi-join: the (small-ish) build side is replicated
    * `salt` times, the probe side picks a deterministic salt per row
    * (hash of its key columns + linenumber-free entropy via all columns),
    * so one hot key spreads over `salt` tasks. Cost: build side ×salt —
    * use only when the build side fits that replication.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, keys: Seq[String], salt: Int): DataFrame = {
    val p = probe.withColumn("_salt",
      pmod(hash(probe.columns.map(col): _*), lit(salt)))
    val b = build.withColumn("_salt", explode(sequence(lit(0), lit(salt - 1))))
    p.join(b, keys :+ "_salt").drop("_salt")
  }

  /** Two-level aggregation for skewed grouping keys: partial aggregate on
    * (keys, salt), then final re-aggregate on keys. Works for the
    * decomposable Summarize ops (SUM/COUNT/MIN/MAX; ANY re-picks any).
    * Catalyst's partial aggregation already handles most skew — this is
    * for extreme single-key hotspots where even the partial's final
    * exchange overloads one reducer.
    */
  def saltedSummarize(df: DataFrame, keys: Seq[String], specs: Seq[SummarizeSpec],
      salt: Int): DataFrame = {
    val salted = df.withColumn("_salt", pmod(hash(df.columns.map(col): _*), lit(salt)))
    val partial = Groups.summarize(salted, keys :+ "_salt", specs)
    val finalSpecs = specs.map { s =>
      val reOp = s.op match {
        case SummarizeOp.Sum | SummarizeOp.Count => SummarizeOp.Sum
        case other => other
      }
      SummarizeSpec(reOp, s.out, s.out)
    }
    Groups.summarize(partial, keys, finalSpecs)
  }
}
