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
    * the recount pass filtered to candidates map-side. Partition
    * summaries combine through the MERGEABLE-summary reduction (Agarwal
    * et al., Mergeable Summaries, PODS'12): keywise sum, then subtract
    * the (c+1)-largest count and drop non-positives — so the driver
    * receives ONE summary of ≤ 2k terms no matter how many partitions
    * the corpus has, and the merged error stays ≤ N/(2k+1) < N/k,
    * preserving completeness.
    */
  def heavyHitters(df: DataFrame, term: Column, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2 (got $k)")
    val sp = df.sparkSession
    import sp.implicits._
    // null terms are EXCLUDED from both passes (documented): pass 1's
    // HashMap would nominate null, but the recount's equi-join can never
    // match it — counting nulls in one pass and not the other would
    // silently drop a genuine heavy hitter from an output documented as
    // exact. Count nulls upstream if they matter (they are a data-quality
    // signal, not a term).
    val terms = df.select(term.cast("string").as("_t"))
      .filter(col("_t").isNotNull).as[String]
    val capacity = 2 * k
    def shrink(m: scala.collection.mutable.HashMap[String, Long]): Unit =
      if (m.size > capacity) {
        // subtract the (capacity+1)-largest count; ≥ capacity survivors
        // would each need count > that bound — impossible, so ≤ capacity
        val bound = m.values.toArray.sorted(Ordering[Long].reverse)(capacity)
        val dead = m.collect { case (key, c) if c - bound <= 0L => key }.toList
        m.mapValuesInPlace((_, c) => c - bound)
        dead.foreach(m.remove)
      }
    // pass 1: per-partition Misra-Gries summaries, tree-merged to ONE
    val (summary, total) = terms.rdd.mapPartitions { it =>
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
      Iterator.single((counts, n))
    }.treeAggregate((scala.collection.mutable.HashMap.empty[String, Long], 0L))(
      seqOp = { case ((a, na), (b, nb)) =>
        b.foreach { case (key, c) => a.update(key, a.getOrElse(key, 0L) + c) }
        shrink(a)
        (a, na + nb)
      },
      combOp = { case ((a, na), (b, nb)) =>
        b.foreach { case (key, c) => a.update(key, a.getOrElse(key, 0L) + c) }
        shrink(a)
        (a, na + nb)
      })
    val candidates = summary.keys.toSeq
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

  /** Per-depth salt for the Count-Min hash rows: shifts the key by a
    * large prime before the engine-stable multiplicative hash
    * ([[Sampling.hashBucket]] masks to the low 32 bits, so the shift
    * rotates the ring rather than escaping it). Plain integer arithmetic
    * on purpose — the DuckDB oracle replays the exact formula.
    */
  private def cmSalt(d: Int): Long = d.toLong * 2971215073L

  /** Count-Min sketch (Cormode & Muthukrishnan, "An improved data stream
    * summary: the count-min sketch", J. Algorithms 55, 2005) built as a
    * relational plan: the sketch IS a ≤ depth×width-row (d, bucket, cnt)
    * frame produced by ONE partial-aggregated shuffle — each input row
    * explodes to `depth` 16-byte (d, bucket) pairs that combine map-side,
    * so the exchange carries at most tasks × depth × width rows no matter
    * the corpus size. The frame is mergeable across batches by summing
    * cnt on (d, bucket) — the same property the paper proves for the
    * matrix form.
    */
  def countMinBuild(df: DataFrame, key: Column, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, s"need depth>=1, width>=2 (got $depth, $width)")
    val rows = array((0 until depth).map { d =>
      struct(lit(d).cast("int").as("d"),
        Sampling.hashBucket(key + lit(cmSalt(d)), width).as("bucket"))
    }: _*)
    df.select(explode(rows).as("_db"))
      .groupBy(col("_db.d").as("d"), col("_db.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-frequency estimates from a [[countMinBuild]] sketch: for each
    * row of `keys`, min over the depth rows of that key's bucket counts —
    * the classic one-sided estimate (cm_est ≥ true count always; ≤ true
    * count + εN with probability 1-δ for depth = ln 1/δ, width = e/ε).
    * The sketch is depth×width rows → broadcast; absent buckets read 0.
    * `depth`/`width` must match the build call.
    */
  def countMinQuery(sketch: DataFrame, keys: DataFrame, key: Column,
      depth: Int, width: Int): DataFrame = {
    val rows = array((0 until depth).map { d =>
      struct(lit(d).cast("int").as("d"),
        Sampling.hashBucket(col("_k") + lit(cmSalt(d)), width).as("bucket"))
    }: _*)
    keys.select(key.as("_k"))
      .select(col("_k"), explode(rows).as("_db"))
      .join(broadcast(sketch),
        col("_db.d") === sketch("d") && col("_db.bucket") === sketch("bucket"),
        "left")
      .groupBy(col("_k"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cm_est"))
  }
}
