package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact heavy hitters at scale via the sketch-candidates + exact-recount
  * pattern: a bounded Misra-Gries summary per partition nominates
  * candidates, then only the candidates are exactly recounted — the full
  * token distribution never shuffles, yet the result is EXACT (the
  * sketch can only over-nominate, and the recount filter removes the
  * false positives).
  *
  * Completeness: a term with global frequency ≥ N/k has, by pigeonhole,
  * local frequency ≥ N_p/k in at least one partition p, and a
  * Misra-Gries summary of capacity c ≥ k keeps every term with local
  * count > N_p/(c+1) — so with c = 2k the union of per-partition summary
  * keys contains every global heavy hitter. Candidate count is bounded
  * by partitions × c regardless of corpus size (the driver collect is
  * size-bounded the same way as the IVF centroid sample,
  * similarity/Ivf.scala), and the exact pass shuffles candidate terms
  * only.
  */
object Frequency {

  /** Terms occurring at least `1/k` of all term occurrences: exact
    * (term, cnt, total) rows. Two passes over the exploded term column:
    * the Misra-Gries nomination pass (also counts N per partition) and
    * the recount pass filtered to candidates map-side.
    */
  def heavyHitters(df: DataFrame, term: Column, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2 (got $k)")
    val sp = df.sparkSession
    import sp.implicits._
    val terms = df.select(term.cast("string").as("_t")).as[String]
    val capacity = 2 * k
    // pass 1: per-partition Misra-Gries summaries + per-partition sizes
    val summaries: Array[(Seq[String], Long)] = terms.rdd.mapPartitions { it =>
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      var n = 0L
      it.foreach { t =>
        n += 1
        counts.get(t) match {
          case Some(c) => counts.update(t, c + 1)
          case None =>
            if (counts.size < capacity) counts.update(t, 1L)
            else {
              // decrement-all step; drop zeros
              val dead = List.newBuilder[String]
              counts.foreach { case (key, c) =>
                if (c == 1L) dead += key else counts.update(key, c - 1)
              }
              dead.result().foreach(counts.remove)
            }
        }
      }
      Iterator.single((counts.keys.toSeq, n))
    }.collect()
    val total = summaries.map(_._2).sum
    val candidates = summaries.flatMap(_._1).distinct.toSeq
    // pass 2: exact recount of candidates only — the candidate set
    // (bounded by partitions × 2k) broadcasts into a semi-join probed
    // map-side, so non-candidate terms never reach the exchange
    val cand = sp.createDataset(candidates).toDF("_t")
    terms.toDF("_t")
      .join(broadcast(cand), Seq("_t"), "left_semi")
      .groupBy(col("_t").as("term"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * k >= total)
      .withColumn("total", lit(total))
  }
}
